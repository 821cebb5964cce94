"""Chain-parallel weak-scaling harness (north-star BASELINE.json scaling).

Measures chain-sweeps/s (and tokens-resampled/s) of the sharded SPMD
training step (parallel/sharded.py) as the chain count grows.  Two modes:

* real accelerator (default): all chains batch onto the one visible chip —
  records how close per-chip chain batching is to free (the chains mesh
  axis is pure SPMD replication, so multi-chip scaling multiplies whatever
  this curve shows by the device count; ICI adds only the AD-LDA ``psum``
  on the data axis, which this step already executes).
* fake CPU mesh (``JAX_PLATFORMS=cpu XLA_FLAGS=
  --xla_force_host_platform_device_count=8``): chains spread over 8 mesh
  devices — validates the sharded path end-to-end at the 64-chain
  north-star config (8 chains/shard x 8 devices).  Wall-clock there is
  bounded by physical cores, so only the recorded real-chip curve is a
  performance statement.

Usage: python benchmarks/chain_scaling.py [--chains 1,2,4,8] [--sweeps 10]
Prints one JSON line per chain count.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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
    ap.add_argument("--chains", default="1,2,4,8")
    ap.add_argument("--sweeps", type=int, default=10)
    ap.add_argument("--backend", default="auto", choices=("auto", "cpu"),
                    help="cpu = use the fake --xla_force_host_platform mesh "
                         "even when an accelerator plugin is present")
    ap.add_argument("--sweep", default="fused", choices=("fused", "dense"),
                    help="fused = merge-block whole-sweep kernel "
                         "(parallel/fused_sharded.py, the trainer default); "
                         "dense = exact per-position AD-LDA step")
    ap.add_argument("--merge", type=int, default=5,
                    help="sweeps per merge block on the fused path")
    args = ap.parse_args()

    from lda_thesis_tpu.parallel import (
        make_mesh,
        make_sharded_train_step,
        shard_corpus,
    )
    from lda_thesis_tpu.parallel.sharded import init_sharded_state

    devices = jax.devices() if args.backend == "auto" else jax.devices("cpu")
    n_dev = len(devices)
    # chains axis as wide as the mesh allows; extra chains batch per shard
    mesh_chains = n_dev if n_dev > 1 else 1
    mesh = make_mesh(n_data=1, n_chains=mesh_chains, devices=devices)

    tok_v, tok_f, labs, V = load_real_corpus()
    tokens_per_sweep = float(tok_f.sum())
    if args.sweep == "fused":
        import numpy as _np

        from lda_thesis_tpu.data.encode import compact_labels
        from lda_thesis_tpu.parallel.fused_sharded import (
            init_fused_sharded,
            shard_fused_corpus,
        )

        Kp = 128 * ((labs.shape[1] + 127) // 128)
        labs_p = _np.pad(labs, ((0, 0), (0, Kp - labs.shape[1])))
        lab_ids, lab_valid = compact_labels(labs_p)
        corpus = shard_fused_corpus(mesh, tok_v, tok_f, lab_ids, lab_valid)
    else:
        tv, tf, lb = shard_corpus(mesh, tok_v, tok_f, labs)

    base_rate = None
    for n_chains in (int(x) for x in args.chains.split(",")):
        if n_chains % mesh_chains:
            continue
        key = jax.random.PRNGKey(0)
        save = jnp.bool_(False)
        if args.sweep == "fused":
            from lda_thesis_tpu.parallel.fused_sharded import (
                make_fused_train_loop,
            )

            state = init_fused_sharded(key, mesh, *corpus, V, Kp,
                                       n_chains=n_chains)
            loop = make_fused_train_loop(
                mesh, n_chains, alpha=0.1, beta=0.01,
                merge_every=args.merge, topic_mask=None, corpus=corpus)
            # one dispatch = args.merge * merge sweeps... use loop with
            # iters = merge * sweeps-per-step; keep per-step granularity
            import jax.numpy as _jnp

            # ONE dispatch for the whole timed run: per-call dispatch on the
            # tunnelled backend costs ~0.4 s regardless of content, so the
            # honest measurement is the same single-jit structure real
            # training uses (DistributedLabeledLDA.run_training)
            total_sweeps = args.sweeps * args.merge
            step = lambda k, st: loop(  # noqa: E731
                k, st, _jnp.int32(0), iters=total_sweeps,
                thinning=total_sweeps, M=args.merge)
            sweeps_per_step = total_sweeps
        else:
            state = init_sharded_state(key, mesh, tv, tf, lb, V,
                                       n_chains=n_chains)
            dstep = make_sharded_train_step(mesh, n_chains, alpha=0.1,
                                            beta=0.01)
            step = lambda k, st: dstep(k, st, tv, tf, lb, save)  # noqa: E731
            sweeps_per_step = 1

        # warmup (compile)
        state = step(key, state)
        jax.block_until_ready(state.n_vk)

        n_calls = 1 if sweeps_per_step > 1 else args.sweeps
        t0 = time.perf_counter()
        for i in range(n_calls):
            key, k = jax.random.split(key)
            state = step(k, state)
        jax.block_until_ready(state.n_vk)
        dt = time.perf_counter() - t0

        chain_sweeps_per_s = n_chains * n_calls * sweeps_per_step / dt
        if base_rate is None:
            base_rate = chain_sweeps_per_s
        print(json.dumps({
            "n_chains": n_chains,
            "sweep": args.sweep,
            "mesh": {"chains": mesh_chains, "data": 1},
            "backend": jax.default_backend(),
            "chain_sweeps_per_s": round(chain_sweeps_per_s, 3),
            "tokens_resampled_per_s": round(chain_sweeps_per_s * tokens_per_sweep, 1),
            "scaling_efficiency_vs_1": round(chain_sweeps_per_s / base_rate, 3),
            "wall_s": round(dt, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
