"""Does the REAL token-id distribution explain the model-vs-probe gap?

Variants over the same sweep: uniform-random ids, Zipfian ids sorted within
docs (gensim doc2bow order — what the model sees), Zipfian ids randomly
permuted within each doc.  If sorted-Zipf is slow and shuffled-Zipf fast,
per-position duplicate-row scatters on n_vk are the cost and a per-doc
permutation at encode time recovers the throughput (exact sampler — just a
different within-document visiting order).
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from lda_thesis_tpu.ops.gibbs import LDACounts, train_sweep

D, U, V, K = 4171, 128, 8969, 512
S = 5


def make(kind, rng):
    tok_f = (rng.random((D, U)) < 0.35) * rng.integers(1, 4, (D, U))
    if kind == "uniform":
        tok_v = rng.integers(0, V, (D, U))
    else:
        # Zipf-ish ids; unique within each doc (type layout)
        tok_v = np.zeros((D, U), np.int64)
        for d in range(D):
            ids = np.unique((rng.zipf(1.3, U * 3) - 1) % V)[:U]
            rng.shuffle(ids)
            ids = ids[:U]
            if len(ids) < U:
                ids = np.pad(ids, (0, U - len(ids)))
            if kind == "zipf_sorted":
                ids = np.sort(ids)
            tok_v[d] = ids
    return (jnp.asarray(tok_v, jnp.int32), jnp.asarray(tok_f, jnp.int32))


def main():
    rng = np.random.default_rng(0)
    mask_np = np.zeros((D, K), np.float32)
    for d in range(D):
        ids = np.unique(np.concatenate([[0], rng.integers(1, 392, 5)]))
        mask_np[d, ids] = 1
    labs = jnp.asarray(mask_np)

    for kind in ("uniform", "zipf_sorted", "zipf_shuffled"):
        tok_v, tok_f = make(kind, np.random.default_rng(1))
        tokens = float(np.asarray(tok_f).sum())
        c = LDACounts(
            z=jnp.asarray(np.random.default_rng(2).integers(0, K, (D, U)), jnp.int32),
            n_dk=jnp.ones((D, K), jnp.float32),
            n_vk=jnp.ones((V, K), jnp.float32),
            n_k=jnp.full((K,), float(V), jnp.float32),
        )

        @jax.jit
        def w(key, c, tok_v=tok_v, tok_f=tok_f):
            def body(c, k):
                return train_sweep(k, c, tok_v, tok_f, labs, 0.1, 0.01), None
            c, _ = jax.lax.scan(body, c, jax.random.split(key, S))
            return c

        key = jax.random.PRNGKey(0)
        c = w(key, c); jax.block_until_ready(c)
        ts = []
        for _ in range(3):
            key, k = jax.random.split(key)
            t0 = time.perf_counter(); c = w(k, c); jax.block_until_ready(c)
            ts.append(time.perf_counter() - t0)
        print(f"{kind:14s} {tokens*S/min(ts)/1e6:7.2f} M tok/s "
              f"({min(ts)/S*1e3:6.1f} ms/sweep)", flush=True)


if __name__ == "__main__":
    main()
