"""Large-V demonstration of vocab-axis table sharding (SURVEY.md §5).

Builds a synthetic corpus whose topic-word table (V=196,608 x K=512 =
100M f32 entries = 384 MiB) is ~22x the abstracts table, trains it
through the whole-run vocab-sharded loop on an 8-device mesh, and
records that per-device PERSISTENT state (table + thinned phi-hat mean,
the arrays that scale with V*K and live across the whole run) is S-fold
smaller than the replicated-table mode would hold, at matched counts
(sum of table == corpus tokens after every merge block).

Run on the fake CPU mesh:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/vocab_shard_memory.py
Prints one JSON line (recorded as VOCABSHARD_r04.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# the axon plugin re-appends its platform at import time, overriding the
# env var — pin the fake CPU mesh back (same workaround as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from lda_thesis_tpu.parallel import make_mesh
from lda_thesis_tpu.parallel.vocab_sharded import (
    init_vocab_sharded_train,
    make_vocab_sharded_train_loop,
    shard_vocab_corpus,
)


def main() -> None:
    S = 8
    V, K, D, U, A = 196_608, 512, 4096, 64, 8
    mesh = make_mesh(n_chains=1, n_data=S)
    rng = np.random.default_rng(0)
    tok_v = rng.integers(0, V, size=(D, U)).astype(np.int32)
    tok_f = rng.integers(1, 4, size=(D, U)).astype(np.int32)
    lab_ids = np.sort(
        rng.integers(0, K, size=(D, A)), axis=1).astype(np.int32)
    lab_valid = np.ones((D, A), np.float32)
    total = float(tok_f.sum())

    corpus = shard_vocab_corpus(
        mesh, tok_v.T, tok_f.T.astype(np.float32), lab_ids, lab_valid.T)
    state = init_vocab_sharded_train(
        jax.random.PRNGKey(0), mesh, tok_v, tok_f, lab_ids, lab_valid, V, K)

    def per_device_bytes(arr):
        return max(s.data.nbytes for s in arr.addressable_shards)

    # persistent V*K state: the table and its thinned running mean
    sharded_per_dev = per_device_bytes(state.n_vk) + per_device_bytes(
        state.ph_hat)
    replicated_per_dev = state.n_vk.nbytes + state.ph_hat.nbytes

    loop = make_vocab_sharded_train_loop(
        mesh, alpha=0.1, beta=0.01, V=V, K=K, topic_mask=None, corpus=corpus)
    t0 = time.perf_counter()
    state = loop(jax.random.PRNGKey(1), state, jnp.int32(0), iters=4,
                 thinning=2, M=2)
    jax.block_until_ready(state.n_vk)
    wall = time.perf_counter() - t0

    table_sum = float(np.asarray(state.n_vk).sum())
    print(json.dumps({
        "mode": "vocab_sharded",
        "mesh": {"chains": 1, "data": S},
        "V": V, "K": K, "D": D,
        "table_MiB": round(state.n_vk.nbytes / 2**20, 1),
        "persistent_VK_bytes_per_device_sharded": sharded_per_dev,
        "persistent_VK_bytes_per_device_replicated": replicated_per_dev,
        "reduction_factor": round(replicated_per_dev / sharded_per_dev, 2),
        "counts_match_tokens": table_sum == total,
        "train_iters": 4,
        "wall_s": round(wall, 2),
    }))
    assert table_sum == total, (table_sum, total)
    assert replicated_per_dev / sharded_per_dev >= S * 0.99

    # ---- chains × vocab composition (round-5 VERDICT item 4): 4 chains
    # over a (2, 4) mesh, each chain's table vocab-sharded over the data
    # axis — per-device persistent V·K state is C_local·Vp/S·K instead of
    # the replicated-chains trainer's C_local·V·K.
    from lda_thesis_tpu.parallel.fused_sharded import shard_fused_corpus
    from lda_thesis_tpu.parallel.vocab_sharded import (
        init_vocab_chains,
        make_vocab_chains_train_loop,
    )

    C, Sc = 4, 4
    cmesh = make_mesh(n_chains=2, n_data=Sc)
    Vc = 98_304
    ctok_v = rng.integers(0, Vc, size=(D, U)).astype(np.int32)
    ccorpus = shard_fused_corpus(cmesh, ctok_v, tok_f, lab_ids, lab_valid)
    cstate = init_vocab_chains(jax.random.PRNGKey(2), cmesh, ccorpus,
                               Vc, K, n_chains=C)
    c_sharded = per_device_bytes(cstate.n_vk) + per_device_bytes(cstate.ph_hat)
    # replicated-chains trainer holds C_local full tables + ph_hat per device
    c_repl = (C // 2) * Vc * K * 4 * 2
    cloop = make_vocab_chains_train_loop(
        cmesh, C, alpha=0.1, beta=0.01, V=Vc, K=K, topic_mask=None,
        corpus=ccorpus)
    t0 = time.perf_counter()
    cstate = cloop(jax.random.PRNGKey(3), cstate, jnp.int32(0), iters=4,
                   thinning=2, M=2)
    jax.block_until_ready(cstate.n_vk)
    cwall = time.perf_counter() - t0
    csum = float(np.asarray(cstate.n_vk)[0].sum())
    print(json.dumps({
        "mode": "chains_x_vocab",
        "mesh": {"chains": 2, "data": Sc}, "n_chains": C,
        "V": Vc, "K": K, "D": D,
        "per_chain_table_MiB": round(Vc * K * 4 / 2**20, 1),
        "persistent_VK_bytes_per_device_sharded": c_sharded,
        "persistent_VK_bytes_per_device_replicated": c_repl,
        "reduction_factor": round(c_repl / c_sharded, 2),
        "counts_match_tokens": csum == total,
        "train_iters": 4,
        "wall_s": round(cwall, 2),
    }))
    assert csum == total, (csum, total)
    assert c_repl / c_sharded >= Sc * 0.99


if __name__ == "__main__":
    main()
