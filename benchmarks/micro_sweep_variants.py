"""Microbenchmark of Gibbs-sweep inner-step variants on the real chip.

Isolates the two design choices of the hot step:
  draw:    gumbel-argmax (log domain)  vs  cumsum inverse-CDF  vs  MXU cumsum
  updates: dense one-hot multiply-add  vs  row scatter-add
plus the irreducible n_vk row gather/scatter.

Run: python benchmarks/micro_sweep_variants.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

D, U, V, K = 4171, 128, 8969, 512


def timeit(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def make_data(seed=0):
    rng = np.random.default_rng(seed)
    tok_v = jnp.asarray(rng.integers(0, V, (D, U)), jnp.int32)
    tok_f = jnp.asarray((rng.random((D, U)) < 0.35) * rng.integers(1, 4, (D, U)), jnp.float32)
    labs = jnp.asarray((rng.random((D, K)) < 0.02) | (np.arange(K) == 0), jnp.float32)
    z = jnp.asarray(rng.integers(0, K, (D, U)), jnp.int32)
    n_dk = jnp.zeros((D, K), jnp.float32)
    n_vk = jnp.zeros((V, K), jnp.float32) + 1.0
    n_k = jnp.zeros((K,), jnp.float32) + float(V)
    return tok_v, tok_f, labs, z, n_dk, n_vk, n_k


ROWS = jnp.arange(D, dtype=jnp.int32)
TRI = jnp.triu(jnp.ones((K, K), jnp.float32))  # c = w @ TRI gives inclusive cumsum


def sweep(draw, upd):
    def fn(key, tok_v, tok_f, labs, z, n_dk, n_vk, n_k):
        uniforms = jax.random.uniform(key, (U, D))
        keys = jax.random.split(key, U)

        def step(carry, xs):
            n_dk, n_vk, n_k = carry
            v, ff, z_old, u, k = xs
            if upd == "onehot":
                fo = ff[:, None] * jax.nn.one_hot(z_old, K, dtype=jnp.float32)
                n_dk = n_dk - fo
                n_k = n_k - fo.sum(axis=0)
            else:
                n_dk = n_dk.at[ROWS, z_old].add(-ff)
                n_k = n_k.at[z_old].add(-ff)
            n_vk = n_vk.at[v, z_old].add(-ff)
            cv = n_vk[v]
            w = labs * (n_dk + 0.1) * (cv + 0.01) * (1.0 / (n_k + 0.01 * V))
            if draw == "gumbel":
                g = jax.random.gumbel(k, (D, K))
                z_new = jnp.argmax(jnp.where(w > 0, jnp.log(w), -jnp.inf) + g, axis=1).astype(jnp.int32)
            elif draw == "cumsum":
                c = jnp.cumsum(w, axis=1)
                z_new = jnp.sum(c < (u * c[:, -1])[:, None], axis=1).astype(jnp.int32)
            else:  # mxu
                c = jnp.dot(w, TRI, preferred_element_type=jnp.float32)
                z_new = jnp.sum(c < (u * c[:, -1])[:, None], axis=1).astype(jnp.int32)
            z_new = jnp.where(ff > 0, z_new, z_old)
            if upd == "onehot":
                fn_ = ff[:, None] * jax.nn.one_hot(z_new, K, dtype=jnp.float32)
                n_dk = n_dk + fn_
                n_k = n_k + fn_.sum(axis=0)
            else:
                n_dk = n_dk.at[ROWS, z_new].add(ff)
                n_k = n_k.at[z_new].add(ff)
            n_vk = n_vk.at[v, z_new].add(ff)
            return (n_dk, n_vk, n_k), z_new

        (n_dk, n_vk, n_k), z_t = jax.lax.scan(
            step, (n_dk, n_vk, n_k), (tok_v.T, tok_f.T, z.T, uniforms, keys)
        )
        return n_dk, n_vk, n_k, z_t

    return jax.jit(fn)


def main():
    data = make_data()
    key = jax.random.PRNGKey(0)
    tokens = float(np.asarray(data[1]).sum())
    for draw in ("gumbel", "cumsum", "mxu"):
        for upd in ("onehot", "scatter"):
            f = sweep(draw, upd)
            dt = timeit(f, key, *data)
            print(f"{draw:7s} + {upd:8s}: {dt*1e3:7.1f} ms/sweep "
                  f"= {tokens/dt/1e6:6.2f} M tokens/s", flush=True)


if __name__ == "__main__":
    main()
