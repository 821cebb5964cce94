"""Scaling probe: per-position sweep cost vs V (n_vk size) and vs presence
of the n_vk scatter/gather — isolates whether the TPU scatter serialises
or the table is being copied per position."""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from lda_thesis_tpu.ops.gibbs import LDACounts, train_sweep

D, U, K = 4171, 128, 512


def bench_V(V, sweeps=5):
    rng = np.random.default_rng(0)
    tok_v = jnp.asarray(rng.integers(0, V, (D, U)), jnp.int32)
    tok_f = jnp.asarray((rng.random((D, U)) < 0.35) * rng.integers(1, 4, (D, U)), jnp.int32)
    tokens = float(np.asarray(tok_f).sum())
    mask_np = np.zeros((D, K), np.float32)
    for d in range(D):
        ids = np.unique(np.concatenate([[0], rng.integers(1, 392, 5)]))
        mask_np[d, ids] = 1
    labs = jnp.asarray(mask_np)
    c = LDACounts(
        z=jnp.asarray(rng.integers(0, K, (D, U)), jnp.int32),
        n_dk=jnp.ones((D, K), jnp.float32),
        n_vk=jnp.ones((V, K), jnp.float32),
        n_k=jnp.full((K,), float(V), jnp.float32),
    )

    @jax.jit
    def w(key, c):
        def body(c, k):
            return train_sweep(k, c, tok_v, tok_f, labs, 0.1, 0.01), None
        c, _ = jax.lax.scan(body, c, jax.random.split(key, sweeps))
        return c

    key = jax.random.PRNGKey(0)
    c = w(key, c); jax.block_until_ready(c)
    ts = []
    for _ in range(3):
        key, k = jax.random.split(key)
        t0 = time.perf_counter(); c = w(k, c); jax.block_until_ready(c)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    us_pos = dt / sweeps / U * 1e6
    print(f"V={V:6d}: {tokens*sweeps/dt/1e6:7.2f} M tok/s   {us_pos:7.1f} us/pos", flush=True)


if __name__ == "__main__":
    for V in (1024, 4096, 8969, 16384):
        bench_V(V)
