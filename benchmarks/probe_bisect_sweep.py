"""Bisect the real sweep's 860us/position: add parts back one at a time.

Variants (all scan over U=32 positions, D=4608, K=512, V=8969):
  a  pallas kernel, xs=None, constant cv/recip        (fast in probe)
  b  a + xs slices (v, ff, z column, uniform)
  c  b + z_t stacked output
  d  c + n_vk scatter/gather (full real sweep body)
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from lda_thesis_tpu.ops.gibbs_pallas import fused_draw_update

D, K, V, U = 4608, 512, 8969, 32
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
def var_a(u, ff, z, labs, n_dk, cv, recip, tri):
    def step(carry, _):
        n_dk, z = carry
        n_dk, z_new, dnk = fused_draw_update(u, ff, z, labs, n_dk, cv, recip, tri, ALPHA, BETA)
        return (n_dk, z_new), None
    (n_dk, z), _ = jax.lax.scan(step, (n_dk, z), None, length=U)
    return n_dk, z


@jax.jit
def var_b(uu, ffs, zs, labs, n_dk, cv, recip, tri):
    def step(n_dk, xs):
        u, ff, z = xs
        n_dk, z_new, dnk = fused_draw_update(u, ff, z, labs, n_dk, cv, recip, tri, ALPHA, BETA)
        return n_dk, None
    n_dk, _ = jax.lax.scan(step, n_dk, (uu, ffs, zs))
    return n_dk


@jax.jit
def var_c(uu, ffs, zs, labs, n_dk, cv, recip, tri):
    def step(n_dk, xs):
        u, ff, z = xs
        n_dk, z_new, dnk = fused_draw_update(u, ff, z, labs, n_dk, cv, recip, tri, ALPHA, BETA)
        return n_dk, z_new
    n_dk, z_t = jax.lax.scan(step, n_dk, (uu, ffs, zs))
    return n_dk, z_t


@jax.jit
def var_d(uu, ffs, zs, vs, labs, n_dk, n_vk, n_k, tri):
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


def main():
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random(D), jnp.float32)
    ff = jnp.asarray(rng.integers(1, 3, D), jnp.float32)
    z = jnp.asarray(rng.integers(0, K, D), jnp.int32)
    labs = jnp.asarray((rng.random((D, K)) < 0.02) | (np.arange(K) == 0)[None], jnp.float32)
    n_dk = jnp.ones((D, K), jnp.float32)
    cv = jnp.ones((D, K), jnp.float32)
    recip = jnp.full((K,), 1e-4, jnp.float32)
    tri = jnp.triu(jnp.ones((K, K), jnp.float32))
    uu = jnp.asarray(rng.random((U, D)), jnp.float32)
    ffs = jnp.asarray(rng.integers(1, 3, (U, D)), jnp.float32)
    zs = jnp.asarray(rng.integers(0, K, (U, D)), jnp.int32)
    vs = jnp.asarray(rng.integers(0, V, (U, D)), jnp.int32)
    n_vk = jnp.ones((V, K), jnp.float32)
    n_k = jnp.ones((K,), jnp.float32)

    print(f"a xs=None            {timeit(var_a, u, ff, z, labs, n_dk, cv, recip, tri)*1e6:9.1f} us/pos")
    print(f"b + xs slices        {timeit(var_b, uu, ffs, zs, labs, n_dk, cv, recip, tri)*1e6:9.1f} us/pos")
    print(f"c + z_t output       {timeit(var_c, uu, ffs, zs, labs, n_dk, cv, recip, tri)*1e6:9.1f} us/pos")
    print(f"d + n_vk scatter     {timeit(var_d, uu, ffs, zs, vs, labs, n_dk, n_vk, n_k, tri)*1e6:9.1f} us/pos")


if __name__ == "__main__":
    main()
