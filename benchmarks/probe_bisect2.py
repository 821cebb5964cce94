"""Bisect stage 2: why is ops.gibbs.train_sweep 200x slower than its body?

e  var_d + in-jit jax.random.uniform for the (U, D) uniforms
f  jit(train_sweep) exactly as the model calls it
g  f with LDA_NO_PALLAS=1 (XLA fallback path)
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from lda_thesis_tpu.ops.gibbs import LDACounts, train_sweep
from lda_thesis_tpu.ops.gibbs_pallas import fused_draw_update

D, K, V, U = 4171, 512, 8969, 32
Dp = 4608
ALPHA, BETA = 0.1, 0.01
VBETA = V * BETA


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) / U


@jax.jit
def var_e(key, ffs, zs, vs, labs, n_dk, n_vk, n_k, tri):
    uu = jax.random.uniform(key, (U, Dp), dtype=jnp.float32)

    def step(carry, xs):
        n_dk, n_vk, n_k = carry
        u, ff, z_old, v = xs
        dec_k = jnp.zeros((K,), jnp.float32).at[z_old].add(ff)
        nk_minus = n_k - dec_k
        n_vk = n_vk.at[v, z_old].add(-ff)
        cv = n_vk[v]
        recip = 1.0 / (nk_minus + VBETA)
        n_dk, z_new, dnk = fused_draw_update(u, ff, z_old, labs, n_dk, cv, recip, tri, ALPHA, BETA)
        n_vk = n_vk.at[v, z_new].add(ff)
        n_k = n_k + dnk
        return (n_dk, n_vk, n_k), z_new

    (n_dk, n_vk, n_k), z_t = jax.lax.scan(step, (n_dk, n_vk, n_k), (uu, ffs, zs, vs))
    return n_dk, n_vk


@jax.jit
def var_f(key, counts, tok_v, tok_f, labs):
    return train_sweep(key, counts, tok_v, tok_f, labs, ALPHA, BETA)


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    labs_p = jnp.asarray((rng.random((Dp, K)) < 0.02) | (np.arange(K) == 0)[None], jnp.float32)
    n_dk = jnp.ones((Dp, K), jnp.float32)
    tri = jnp.triu(jnp.ones((K, K), jnp.float32))
    ffs = jnp.asarray(rng.integers(1, 3, (U, Dp)), jnp.float32)
    zs = jnp.asarray(rng.integers(0, K, (U, Dp)), jnp.int32)
    vs = jnp.asarray(rng.integers(0, V, (U, Dp)), jnp.int32)
    n_vk = jnp.ones((V, K), jnp.float32)
    n_k = jnp.ones((K,), jnp.float32)

    print(f"e + in-jit RNG       {timeit(var_e, key, ffs, zs, vs, labs_p, n_dk, n_vk, n_k, tri)*1e6:9.1f} us/pos", flush=True)

    tok_v = jnp.asarray(rng.integers(0, V, (D, U)), jnp.int32)
    tok_f = jnp.asarray(rng.integers(1, 3, (D, U)), jnp.int32)
    labs = jnp.asarray((rng.random((D, K)) < 0.02) | (np.arange(K) == 0)[None], jnp.float32)
    counts = LDACounts(
        z=jnp.asarray(rng.integers(0, K, (D, U)), jnp.int32),
        n_dk=jnp.ones((D, K), jnp.float32),
        n_vk=jnp.ones((V, K), jnp.float32),
        n_k=jnp.ones((K,), jnp.float32),
    )
    print(f"f train_sweep as-is  {timeit(var_f, key, counts, tok_v, tok_f, labs)*1e6:9.1f} us/pos", flush=True)


if __name__ == "__main__":
    main()
