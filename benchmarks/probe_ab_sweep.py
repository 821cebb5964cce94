"""Interleaved A/B benchmark: dense vs compact sweep at real-corpus shape.

The tunnelled chip's throughput drifts run-to-run, so both variants are
timed in alternating windows within one process and reported per window.
Synthetic data at the headline shape (D=4171, U=128, V=8969, K=512, A=24).
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from lda_thesis_tpu.ops.gibbs import (
    LDACounts, CompactLDACounts, train_sweep, train_sweep_compact,
)

D, U, V, K, A = 4171, 128, 8969, 512, 24


def main():
    rng = np.random.default_rng(0)
    tok_v = jnp.asarray(rng.integers(0, V, (D, U)), jnp.int32)
    tok_f = jnp.asarray((rng.random((D, U)) < 0.35) * rng.integers(1, 4, (D, U)), jnp.int32)
    tokens = float(np.asarray(tok_f).sum())

    # ~5 admissible labels + root per doc
    lab_ids_np = np.zeros((D, A), np.int32)
    lab_valid_np = np.zeros((D, A), np.float32)
    mask_np = np.zeros((D, K), np.float32)
    for d in range(D):
        ids = np.unique(np.concatenate([[0], rng.integers(1, 392, 5)]))
        lab_ids_np[d, :len(ids)] = ids
        lab_valid_np[d, :len(ids)] = 1
        mask_np[d, ids] = 1
    labs = jnp.asarray(mask_np)
    li, lv = jnp.asarray(lab_ids_np), jnp.asarray(lab_valid_np)

    z0 = jnp.asarray(rng.integers(0, K, (D, U)), jnp.int32)
    dense = LDACounts(z=z0, n_dk=jnp.ones((D, K), jnp.float32),
                      n_vk=jnp.ones((V, K), jnp.float32),
                      n_k=jnp.full((K,), float(V), jnp.float32))
    zc0 = jnp.asarray(rng.integers(0, 6, (D, U)), jnp.int32)
    comp = CompactLDACounts(z=zc0, n_dk=jnp.ones((D, A), jnp.float32),
                            n_vk=jnp.ones((V, K), jnp.float32),
                            n_k=jnp.full((K,), float(V), jnp.float32))

    S = 5  # sweeps per window

    @jax.jit
    def dense_w(key, c):
        def body(c, k):
            return train_sweep(k, c, tok_v, tok_f, labs, 0.1, 0.01), None
        c, _ = jax.lax.scan(body, c, jax.random.split(key, S))
        return c

    @jax.jit
    def comp_w(key, c):
        def body(c, k):
            return train_sweep_compact(k, c, tok_v, tok_f, li, lv, 0.1, 0.01), None
        c, _ = jax.lax.scan(body, c, jax.random.split(key, S))
        return c

    key = jax.random.PRNGKey(0)
    dense_c, comp_c = dense, comp
    # warm both
    t0 = time.perf_counter(); dense_c = dense_w(key, dense_c); jax.block_until_ready(dense_c)
    print(f"dense compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter(); comp_c = comp_w(key, comp_c); jax.block_until_ready(comp_c)
    print(f"compact compile+run {time.perf_counter()-t0:.1f}s", flush=True)

    for w in range(4):
        key, k1, k2 = jax.random.split(key, 3)
        t0 = time.perf_counter(); dense_c = dense_w(k1, dense_c); jax.block_until_ready(dense_c)
        td = time.perf_counter() - t0
        t0 = time.perf_counter(); comp_c = comp_w(k2, comp_c); jax.block_until_ready(comp_c)
        tc = time.perf_counter() - t0
        print(f"w{w}: dense {tokens*S/td/1e6:7.2f} M tok/s   compact {tokens*S/tc/1e6:7.2f} M tok/s", flush=True)


if __name__ == "__main__":
    main()


def variant_pre_transposed():
    """Same dense sweep but with xs transposes materialised via
    optimization_barrier before the scan (suspected 3x loss: XLA fusing the
    transpose into each scan step's slice -> strided reads)."""
    rng = np.random.default_rng(0)
    tok_v = jnp.asarray(rng.integers(0, V, (D, U)), jnp.int32)
    tok_f = jnp.asarray((rng.random((D, U)) < 0.35) * rng.integers(1, 4, (D, U)), jnp.int32)
    tokens = float(np.asarray(tok_f).sum())
    mask_np = np.zeros((D, K), np.float32)
    for d in range(D):
        ids = np.unique(np.concatenate([[0], rng.integers(1, 392, 5)]))
        mask_np[d, ids] = 1
    labs = jnp.asarray(mask_np)
    z0 = jnp.asarray(rng.integers(0, K, (D, U)), jnp.int32)
    dense = LDACounts(z=z0, n_dk=jnp.ones((D, K), jnp.float32),
                      n_vk=jnp.ones((V, K), jnp.float32),
                      n_k=jnp.full((K,), float(V), jnp.float32))

    from lda_thesis_tpu.ops.gibbs_pallas import BLOCK, fused_draw_update
    Dp = ((D + BLOCK - 1) // BLOCK) * BLOCK
    pad = Dp - D
    VBETA = V * 0.01
    tri = jnp.triu(jnp.ones((K, K), jnp.float32))

    @jax.jit
    def sweep5(key, c):
        def pad_rows(x, value=0):
            return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1), constant_values=value) if pad else x
        tv = jax.lax.optimization_barrier(pad_rows(tok_v).T)
        ff = jax.lax.optimization_barrier(pad_rows(tok_f.astype(jnp.float32)).T)
        labs_p = pad_rows(labs)

        def one(c, k):
            z0 = jax.lax.optimization_barrier(pad_rows(c.z).T)
            uu = jax.random.uniform(k, (U, Dp), dtype=jnp.float32)
            n_dk0 = pad_rows(c.n_dk)

            def step(carry, xs):
                n_dk, n_vk, n_k = carry
                v, f, z_old, u = xs
                dec_k = jnp.zeros((K,), jnp.float32).at[z_old].add(f)
                nk_minus = n_k - dec_k
                n_vk = n_vk.at[v, z_old].add(-f)
                cv = n_vk[v]
                recip = 1.0 / (nk_minus + VBETA)
                n_dk, z_new, dnk = fused_draw_update(u, f, z_old, labs_p, n_dk, cv, recip, tri, 0.1, 0.01)
                n_vk = n_vk.at[v, z_new].add(f)
                n_k = n_k + dnk
                return (n_dk, n_vk, n_k), z_new
            (n_dk, n_vk, n_k), z_t = jax.lax.scan(step, (n_dk0, c.n_vk, c.n_k), (tv, ff, z0, uu))
            return LDACounts(z=z_t.T[:D].astype(jnp.int32), n_dk=n_dk[:D], n_vk=n_vk, n_k=n_k), None

        c, _ = jax.lax.scan(one, c, jax.random.split(key, 5))
        return c

    key = jax.random.PRNGKey(0)
    import time as _t
    t0 = _t.perf_counter(); dense2 = sweep5(key, dense); jax.block_until_ready(dense2)
    print(f"pre-T compile+run {_t.perf_counter()-t0:.1f}s", flush=True)
    for w in range(3):
        key, k = jax.random.split(key)
        t0 = _t.perf_counter(); dense2 = sweep5(k, dense2); jax.block_until_ready(dense2)
        dt = _t.perf_counter() - t0
        print(f"pre-transposed dense: {tokens*5/dt/1e6:7.2f} M tok/s", flush=True)


if __name__ == "__main__" and "--pret" in sys.argv:
    variant_pre_transposed()
