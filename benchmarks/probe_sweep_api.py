"""A/B: train_sweep (per-sweep internal pad/transpose) vs train_sweep_fast
(hoisted layout) vs the model's _train_loop — same data, same process."""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from lda_thesis_tpu.ops.gibbs import (
    LDACounts, to_fast_layout, train_sweep, train_sweep_fast,
)

D, U, V, K = 4171, 128, 8969, 512
S = 5


def main():
    rng = np.random.default_rng(0)
    tok_v = jnp.asarray(rng.integers(0, V, (D, U)), jnp.int32)
    tok_f = jnp.asarray((rng.random((D, U)) < 0.35) * rng.integers(1, 4, (D, U)), jnp.int32)
    tokens = float(np.asarray(tok_f).sum())
    mask_np = np.zeros((D, K), np.float32)
    for d in range(D):
        ids = np.unique(np.concatenate([[0], rng.integers(1, 392, 5)]))
        mask_np[d, ids] = 1
    labs = jnp.asarray(mask_np)
    c0 = LDACounts(
        z=jnp.asarray(rng.integers(0, K, (D, U)), jnp.int32),
        n_dk=jnp.ones((D, K), jnp.float32),
        n_vk=jnp.ones((V, K), jnp.float32),
        n_k=jnp.full((K,), float(V), jnp.float32),
    )

    @jax.jit
    def w_old(key, c):
        def body(c, k):
            return train_sweep(k, c, tok_v, tok_f, labs, 0.1, 0.01), None
        c, _ = jax.lax.scan(body, c, jax.random.split(key, S))
        return c

    @jax.jit
    def w_fast(key, c):
        z_t, ndk, tvs, tfs, ffs, labp = to_fast_layout(
            c.z, c.n_dk, tok_v, tok_f, labs)

        def body(carry, k):
            z_t, ndk, n_vk, n_k = carry
            z_t, ndk, n_vk, n_k = train_sweep_fast(
                k, z_t, ndk, n_vk, n_k, tvs, tfs, ffs, labp, 0.1, 0.01)
            return (z_t, ndk, n_vk, n_k), None

        (z_t, ndk, n_vk, n_k), _ = jax.lax.scan(
            body, (z_t, ndk, c.n_vk, c.n_k), jax.random.split(key, S))
        return LDACounts(z=z_t.T[:D].astype(jnp.int32), n_dk=ndk[:D],
                         n_vk=n_vk, n_k=n_k)

    key = jax.random.PRNGKey(0)
    for name, fn in (("old train_sweep", w_old), ("fast layout", w_fast)):
        c = fn(key, c0)
        jax.block_until_ready(c)
        ts = []
        for _ in range(3):
            key, k = jax.random.split(key)
            t0 = time.perf_counter(); c = fn(k, c); jax.block_until_ready(c)
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"{name:18s} {tokens*S/dt/1e6:7.2f} M tok/s", flush=True)


if __name__ == "__main__":
    main()
