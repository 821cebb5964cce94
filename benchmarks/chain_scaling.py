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
    tv, tf, lb = shard_corpus(mesh, tok_v, tok_f, labs)

    base_rate = None
    for n_chains in (int(x) for x in args.chains.split(",")):
        if n_chains % mesh_chains:
            continue
        key = jax.random.PRNGKey(0)
        state = init_sharded_state(key, mesh, tv, tf, lb, V, n_chains=n_chains)
        step = make_sharded_train_step(mesh, n_chains, alpha=0.1, beta=0.01)
        save = jnp.bool_(False)

        # warmup (compile)
        state = step(key, state, tv, tf, lb, save)
        jax.block_until_ready(state.n_vk)

        t0 = time.perf_counter()
        for i in range(args.sweeps):
            key, k = jax.random.split(key)
            state = step(k, state, tv, tf, lb, save)
        jax.block_until_ready(state.n_vk)
        dt = time.perf_counter() - t0

        chain_sweeps_per_s = n_chains * args.sweeps / dt
        if base_rate is None:
            base_rate = chain_sweeps_per_s
        print(json.dumps({
            "n_chains": n_chains,
            "mesh": {"chains": mesh_chains, "data": 1},
            "backend": jax.default_backend(),
            "chain_sweeps_per_s": round(chain_sweeps_per_s, 3),
            "tokens_resampled_per_s": round(chain_sweeps_per_s * tokens_per_sweep, 1),
            "scaling_efficiency_vs_1": round(chain_sweeps_per_s / base_rate, 3),
            "wall_s": round(dt, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
