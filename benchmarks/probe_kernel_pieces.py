"""Time the individual per-position ops with real dependencies.

Finds which op eats the ~860us/position in the Gibbs sweep: the Pallas
fused kernel (f32 MXU matmul in Mosaic?), the n_vk scatters, the row
gather, or the element gathers of the compact path.
"""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

D, K, V, A = 4608, 512, 8969, 32
N = 32  # repetitions inside jit to amortise dispatch


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) / N


@jax.jit
def pallas_fused(u, ff, z, labs, n_dk, cv, recip, tri):
    from lda_thesis_tpu.ops.gibbs_pallas import fused_draw_update

    def step(carry, _):
        n_dk, z = carry
        n_dk, z_new, dnk = fused_draw_update(
            u, ff, z, labs, n_dk, cv, recip, tri, 0.1, 0.01)
        return (n_dk, z_new), None

    (n_dk, z), _ = jax.lax.scan(step, (n_dk, z), None, length=N)
    return n_dk, z


@jax.jit
def vk_scatter(n_vk, v, z, ff):
    def step(carry, _):
        n_vk, z = carry
        n_vk = n_vk.at[v, z].add(-ff)
        n_vk = n_vk.at[v, z].add(ff)
        z = z + (n_vk[0, 0] > -1).astype(jnp.int32)  # dependency
        return (n_vk, z), None

    (n_vk, z), _ = jax.lax.scan(step, (n_vk, z), None, length=N)
    return n_vk


@jax.jit
def vk_row_gather(n_vk, v):
    def step(carry, _):
        acc, v = carry
        cv = n_vk[v]  # (D, K) row gather
        acc = acc + cv.sum()
        v = (v + 1) % V
        return (acc, v), None

    (acc, v), _ = jax.lax.scan(step, (jnp.float32(0), v), None, length=N)
    return acc


@jax.jit
def elem_gather(n_vk_flat, flat_idx):
    def step(carry, _):
        acc, fi = carry
        cv = n_vk_flat[fi]  # (D, A) element gather
        acc = acc + cv.sum()
        fi = (fi + 1) % (V * K)
        return (acc, fi), None

    (acc, fi), _ = jax.lax.scan(step, (jnp.float32(0), flat_idx), None, length=N)
    return acc


@jax.jit
def k_scatter(n_k, z, ff):
    def step(carry, _):
        n_k, z = carry
        n_k = n_k.at[z].add(ff)
        z = (z + 1) % K
        return (n_k, z), None

    (n_k, z), _ = jax.lax.scan(step, (n_k, z), None, length=N)
    return n_k


@jax.jit
def xla_draw(u, labs, n_dk, cv, recip, tri):
    def step(carry, _):
        n_dk, u = carry
        w = labs * (n_dk + 0.1) * (cv + 0.01) * recip
        c = jnp.dot(w, tri, preferred_element_type=jnp.float32)
        r = u * c[:, -1]
        z = jnp.sum(c < r[:, None], axis=1).astype(jnp.int32)
        n_dk = n_dk + jax.nn.one_hot(z, K, dtype=jnp.float32) - \
            jax.nn.one_hot((z + 1) % K, K, dtype=jnp.float32)
        u = u * 0.999 + 1e-4
        return (n_dk, u), None

    (n_dk, u), _ = jax.lax.scan(step, (n_dk, u), None, length=N)
    return n_dk


def main():
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random(D), jnp.float32)
    ff = jnp.asarray(rng.integers(1, 3, D), jnp.float32)
    z = jnp.asarray(rng.integers(0, K, D), jnp.int32)
    v = jnp.asarray(rng.integers(0, V, D), jnp.int32)
    labs = jnp.asarray((rng.random((D, K)) < 0.02) | (np.arange(K) == 0)[None], jnp.float32)
    n_dk = jnp.ones((D, K), jnp.float32)
    n_vk = jnp.ones((V, K), jnp.float32)
    cv = jnp.ones((D, K), jnp.float32)
    recip = jnp.full((K,), 1e-4, jnp.float32)
    tri = jnp.triu(jnp.ones((K, K), jnp.float32))
    n_k = jnp.ones((K,), jnp.float32)
    flat_idx = jnp.asarray(rng.integers(0, V * K, (D, A)), jnp.int32)

    print(f"{'pallas fused kernel':28s} {timeit(pallas_fused, u, ff, z, labs, n_dk, cv, recip, tri)*1e6:9.1f} us/pos")
    print(f"{'xla draw (bf16 default mm)':28s} {timeit(xla_draw, u, labs, n_dk, cv, recip, tri)*1e6:9.1f} us/pos")
    print(f"{'n_vk 2x scatter (D rows)':28s} {timeit(vk_scatter, n_vk, v, z, ff)*1e6:9.1f} us/pos")
    print(f"{'n_vk row gather (D,K)':28s} {timeit(vk_row_gather, n_vk, v)*1e6:9.1f} us/pos")
    print(f"{'flat elem gather (D,A)':28s} {timeit(elem_gather, n_vk.reshape(-1), flat_idx)*1e6:9.1f} us/pos")
    print(f"{'n_k scatter (D into K)':28s} {timeit(k_scatter, n_k, z, ff)*1e6:9.1f} us/pos")


if __name__ == "__main__":
    main()
