"""Chain-parallel scaling harness (north-star BASELINE.json scaling axis).

Measures the STEADY-STATE throughput of the distributed fused training
loop (parallel/fused_sharded.py — the same whole-run-jitted structure
``DistributedLabeledLDA.run_training`` dispatches) as the chain count
grows, on the real abstracts corpus at the bench.py config (depth 3,
unpruned dictionary: D=4171, V=8969, Kp=512).

Protocol (round-4 rewrite; the round-3 artifact measured dispatch/compile
overhead, not the sampler — VERDICT.md Weak #1):

* one warm-up call per chain count with the IDENTICAL static config
  (iters/thinning/M are static argnums — the timed calls hit the jit
  cache exactly);
* timed windows of ``--sweeps`` >= 100 sweeps each, ONE dispatch per
  window; 3 windows, report each (max is the steady-state figure, the
  spread is the noise floor).

Interpretation on this 1-chip environment: the chains mesh axis is SPMD
replication, so C chains on ONE chip SHARE the chip — the honest ideal is
work conservation (aggregate tokens/s flat vs 1 chain, per-chain rate
~1/C), not linear speedup.  ``work_conservation_vs_1`` reports
aggregate(C)/aggregate(1): ~1.0 means chain batching is free and
multi-chip scaling multiplies this curve by the device count (each chip
then carries C/n_dev chains; the dryrun validates that path compiles and
runs).  >1.0 means batching improves chip utilisation; <1.0 is batching
overhead.

Usage: python benchmarks/chain_scaling.py [--chains 1,2,4,8,16]
       [--sweeps 100] [--merge 5] [--windows 3]
Prints one JSON line per chain count.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from lda_thesis_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
import jax
import jax.numpy as jnp
import numpy as np

DATA = "/root/reference/abstracts_data.csv"


def load_real_corpus():
    from lda_thesis_tpu.data.corpus import load_corpus, split_data
    from lda_thesis_tpu.data.encode import (
        binarize_labels,
        build_labelmap,
        encode_bow_types,
    )
    from lda_thesis_tpu.data.vocab import prune_dict

    corpus = load_corpus(DATA, d=3, mode="truncate")
    train, _ = split_data(corpus, seed=42)
    dicti = prune_dict(train.docs, lower=0, upper=1)
    bows = [dicti.doc2bow(doc) for doc in train.docs]
    tok_v, tok_f = encode_bow_types(bows)
    labs = binarize_labels(train.labs, build_labelmap(train.labelset))
    return tok_v, tok_f, labs, len(dicti)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", default="1,2,4,8,16")
    ap.add_argument("--sweeps", type=int, default=100,
                    help="sweeps per timed window (>=100 for steady state)")
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--merge", type=int, default=5,
                    help="sweeps per merge block (the trainer default)")
    ap.add_argument("--backend", default="auto", choices=("auto", "cpu"))
    ap.add_argument("--buckets", type=int, default=1,
                    help=">1: per-bucket sharded layout "
                         "(parallel/fused_sharded_buckets.py) — cuts the "
                         "padded (U, D) area like the single-chip default")
    args = ap.parse_args()

    from lda_thesis_tpu.data.encode import compact_labels
    from lda_thesis_tpu.parallel import make_mesh
    from lda_thesis_tpu.parallel.fused_sharded import (
        init_fused_sharded,
        make_fused_train_loop,
        shard_fused_corpus,
    )
    from lda_thesis_tpu.parallel.fused_sharded_buckets import (
        init_bucketed_sharded,
        make_bucketed_train_loop,
        shard_bucketed_corpus,
    )

    devices = jax.devices() if args.backend == "auto" else jax.devices("cpu")
    n_dev = len(devices)
    mesh_chains = n_dev if n_dev > 1 else 1
    mesh = make_mesh(n_data=1, n_chains=mesh_chains, devices=devices)

    tok_v, tok_f, labs, V = load_real_corpus()
    tokens_per_sweep = float(tok_f.sum())
    Kp = 128 * ((labs.shape[1] + 127) // 128)
    labs_p = np.pad(labs, ((0, 0), (0, Kp - labs.shape[1])))
    lab_ids, lab_valid = compact_labels(labs_p)
    if args.buckets > 1:
        from lda_thesis_tpu.data.buckets import bucket_encode

        # rebuild bows for bucketing (lengths = distinct types per doc)
        bows = [[(int(v), int(f)) for v, f in zip(vv, ff) if f > 0]
                for vv, ff in zip(tok_v, tok_f)]
        buckets = bucket_encode(bows, n_buckets=args.buckets)
        corpus = shard_bucketed_corpus(mesh, buckets, lab_ids, lab_valid)
    else:
        corpus = shard_fused_corpus(mesh, tok_v, tok_f, lab_ids, lab_valid)

    n_sweeps = args.sweeps
    if n_sweeps % args.merge:
        raise SystemExit(f"--sweeps {n_sweeps} must be a multiple of "
                         f"--merge {args.merge} (the loop executes whole "
                         f"merge blocks; a remainder would under-run the "
                         f"window and inflate tokens/s)")
    base_aggregate = None
    for n_chains in (int(x) for x in args.chains.split(",")):
        if n_chains % mesh_chains:
            continue
        key = jax.random.PRNGKey(0)
        if args.buckets > 1:
            state = init_bucketed_sharded(key, mesh, corpus, V, Kp,
                                          n_chains=n_chains)
            loop = make_bucketed_train_loop(
                mesh, n_chains, alpha=0.1, beta=0.01,
                topic_mask=None, corpus=corpus)
        else:
            state = init_fused_sharded(key, mesh, *corpus, V, Kp,
                                       n_chains=n_chains)
            loop = make_fused_train_loop(
                mesh, n_chains, alpha=0.1, beta=0.01, merge_every=args.merge,
                topic_mask=None, corpus=corpus)

        def window(k, st):
            return loop(k, st, jnp.int32(0), iters=n_sweeps,
                        thinning=n_sweeps, M=args.merge)

        # warm-up: identical static config → compiles once, then pure cache.
        # TWO warm calls: the first compiles against the host-initialised
        # state, the second against the loop's own (device-resident) output
        # layouts — both variants must be cached before timing starts.
        state = window(key, state)
        jax.block_until_ready(state.n_vk)
        state = window(jax.random.fold_in(key, 999), state)
        jax.block_until_ready(state.n_vk)

        walls = []
        for i in range(args.windows):
            k = jax.random.fold_in(key, i + 1)
            t0 = time.perf_counter()
            state = window(k, state)
            jax.block_until_ready(state.n_vk)
            walls.append(time.perf_counter() - t0)

        best = min(walls)
        chain_sweeps_per_s = n_chains * n_sweeps / best
        aggregate = chain_sweeps_per_s * tokens_per_sweep
        if base_aggregate is None:
            base_aggregate = aggregate
        print(json.dumps({
            "n_chains": n_chains,
            "sweep": "fused",
            "n_buckets": args.buckets,
            "mesh": {"chains": mesh_chains, "data": 1},
            "backend": jax.default_backend(),
            "sweeps_per_window": n_sweeps,
            "window_walls_s": [round(w, 3) for w in walls],
            "chain_sweeps_per_s": round(chain_sweeps_per_s, 3),
            "per_chain_sweeps_per_s": round(chain_sweeps_per_s / n_chains, 3),
            "aggregate_tokens_resampled_per_s": round(aggregate, 1),
            "work_conservation_vs_1": round(aggregate / base_aggregate, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
