"""Break down per-position cost of the train sweep on the real chip.

Times the full sweep and ablated variants (no n_vk scatter/gather, no dec_k
scatter, XLA vs Pallas draw) at the headline bench shape to find the
bottleneck.  Run: python benchmarks/probe_sweep_breakdown.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

D, U, V, K = 4171, 32, 8969, 512
BLOCK = 512
Dp = ((D + BLOCK - 1) // BLOCK) * BLOCK


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def make_data(seed=0):
    rng = np.random.default_rng(seed)
    tok_v = jnp.asarray(rng.integers(0, V, (Dp, U)), jnp.int32)
    ff = jnp.asarray((rng.random((Dp, U)) < 0.35) * rng.integers(1, 4, (Dp, U)), jnp.float32)
    labs = jnp.asarray((rng.random((Dp, K)) < 0.02) | (np.arange(K) == 0)[None, :], jnp.float32)
    z = jnp.asarray(rng.integers(0, K, (Dp, U)), jnp.int32)
    n_dk = jnp.zeros((Dp, K), jnp.float32) + 1.0
    n_vk = jnp.zeros((V, K), jnp.float32) + 1.0
    n_k = jnp.zeros((K,), jnp.float32) + float(V)
    return tok_v, ff, labs, z, n_dk, n_vk, n_k


TRI = jnp.triu(jnp.ones((K, K), jnp.float32))
ALPHA, BETA = 0.1, 0.01
VBETA = V * BETA


def sweep_variant(variant):
    from lda_thesis_tpu.ops.gibbs_pallas import fused_draw_update

    def fn(key, tok_v, ff, labs, z0, n_dk0, n_vk0, n_k0):
        uniforms = jax.random.uniform(key, (U, Dp), dtype=jnp.float32)

        def step(carry, xs):
            n_dk, n_vk, n_k = carry
            v, f, z_old, u = xs
            if variant == "no_histo":
                nk_minus = n_k
            else:
                if variant == "matmul_histo":
                    oh = (jax.lax.broadcasted_iota(jnp.int32, (Dp, K), 1)
                          == z_old[:, None]).astype(jnp.float32)
                    dec_k = jnp.einsum("dk,d->k", oh, f)
                else:
                    dec_k = jnp.zeros((K,), jnp.float32).at[z_old].add(f)
                nk_minus = n_k - dec_k
            if variant != "no_vk":
                n_vk = n_vk.at[v, z_old].add(-f)
                cv = n_vk[v]
            else:
                cv = jnp.ones((Dp, K), jnp.float32)
            recip = 1.0 / (nk_minus + VBETA)
            n_dk, z_new, dnk = fused_draw_update(
                u, f, z_old, labs, n_dk, cv, recip, TRI, ALPHA, BETA
            )
            if variant != "no_vk":
                n_vk = n_vk.at[v, z_new].add(f)
            n_k = n_k + dnk
            return (n_dk, n_vk, n_k), z_new

        (n_dk, n_vk, n_k), z_t = jax.lax.scan(
            step, (n_dk0, n_vk0, n_k0), (tok_v.T, ff.T, z0.T, uniforms)
        )
        return n_dk, n_vk, n_k

    return jax.jit(fn)


def sweep_pallas_only():
    from lda_thesis_tpu.ops.gibbs_pallas import fused_draw_update

    def fn(key, tok_v, ff, labs, z0, n_dk0, cv, recip):
        uniforms = jax.random.uniform(key, (U, Dp), dtype=jnp.float32)

        def step(n_dk, xs):
            f, z_old, u = xs
            n_dk, z_new, dnk = fused_draw_update(
                u, f, z_old, labs, n_dk, cv, recip, TRI, ALPHA, BETA
            )
            return n_dk, z_new

        n_dk, z_t = jax.lax.scan(step, n_dk0, (ff.T, z0.T, uniforms))
        return n_dk

    return jax.jit(fn)


def main():
    key = jax.random.PRNGKey(0)
    data = make_data()
    tok_v, ff, labs, z, n_dk, n_vk, n_k = data
    tokens = float(np.asarray(ff).sum())

    for variant in ("full", "matmul_histo", "no_histo", "no_vk"):
        fn = sweep_variant(variant)
        dt = timeit(fn, key, *data)
        print(f"{variant:14s} {dt*1e3:8.1f} ms/sweep  {tokens/dt/1e6:6.2f} M tok/s")

    fn = sweep_pallas_only()
    cv = jnp.ones((Dp, K), jnp.float32)
    recip = jnp.full((K,), 1.0 / VBETA, jnp.float32)
    dt = timeit(fn, key, tok_v, ff, labs, z, n_dk, cv, recip)
    print(f"{'pallas_only':14s} {dt*1e3:8.1f} ms/sweep  {tokens/dt/1e6:6.2f} M tok/s")


if __name__ == "__main__":
    main()
