"""Headline benchmark: collapsed-Gibbs tokens-resampled/s/chip.

Runs the flagship Labeled-LDA training sweep (ops/gibbs.py) on the real
abstracts corpus at the reference's own configuration (depth-3 labels,
unpruned dictionary: D=4171, V=8969, K=392) through the product path
(``LabeledLDA.run_training``) and reports throughput against the measured
reference CPU sampler.

Baseline denominator: the unmodified reference ``training_iteration``
(LabeledLDA.py:101-125) measured by benchmarks/measure_reference_cpu.py on
this machine's CPU (2026-08, single thread, numpy 2.x): 46_179
tokens-resampled/s (249_972 tokens/sweep, 2 sweeps, 10.83 s).  Re-measure:

    python benchmarks/measure_reference_cpu.py --iters 2

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "path",
"baseline_tokens_per_s", "windows"} — "path" names which kernel ran
(pallas = fused TPU kernel, xla = lax.scan fallback); "windows" holds every
timed window so run-to-run variance is visible in the artifact.
"""

from __future__ import annotations

import json
import sys
import time

REF_CPU_TOKENS_PER_S = 46_179.3  # measured; see module docstring

DATA = "/root/reference/abstracts_data.csv"


def main() -> None:
    sys.path.insert(0, "/root/repo")
    # persistent compile cache: the tunnelled chip's compile latency is
    # highly variable (12s-8min observed for the same program); cached
    # executables make the benchmark measure the sampler, not the compiler
    # (two-tier: reads the repo-shipped cache, writes user-side)
    from lda_thesis_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    from lda_thesis_tpu.data.corpus import load_corpus, split_data
    from lda_thesis_tpu.data.vocab import prune_dict
    from lda_thesis_tpu.models.labeled_lda import LabeledLDA
    from lda_thesis_tpu.ops.gibbs_fused import fused_pallas_supported

    corpus = load_corpus(DATA, d=3, mode="truncate")
    train, _ = split_data(corpus, seed=42)
    dicti = prune_dict(train.docs, lower=0, upper=1)
    model = LabeledLDA(train.docs, train.labs, list(train.labelset), dicti,
                       alpha=0.1, beta=0.01, seed=0)

    tokens_per_sweep = model.n_tokens
    if model.sweep == "fused":
        # whole-sweep fused kernel (ops/gibbs_fused.py) — Pallas on TPU,
        # bitwise-equal XLA twin elsewhere
        path = "pallas" if fused_pallas_supported() else "xla"
    else:
        path = "xla"

    # warmup with the SAME static config so the timed runs hit the jit
    # cache.  Windows measure SUSTAINED training at the thesis evaluation
    # configuration — thinning 25 within a 2000-sweep budget, i.e. the
    # exact (merge block M=25, thinned-save cadence) the depth-3 (2000;25)
    # parity record trains with (PARITY.md round-4 merge rows) — so the
    # headline number is the throughput of a quality-validated product
    # run, not a benchmark-only configuration.  400-sweep windows: each
    # run_training dispatch carries ~100 ms of fixed tunnel/argument
    # overhead regardless of content, and a real 2000-sweep run dispatches
    # at most a handful of times, so big windows measure the sampler
    # rather than the dispatch (and still understate a one-dispatch run).
    n_sweeps, thinning, total = 400, 25, 2000
    model.run_training(n_sweeps, thinning, perplexity=False,
                       total_iters=total)

    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        model.run_training(n_sweeps, thinning, perplexity=False,
                           total_iters=total)
        jax.block_until_ready(model.counts)
        dt = time.perf_counter() - t0
        rates.append(tokens_per_sweep * n_sweeps / dt)

    value = max(rates)
    print(json.dumps({
        "metric": "gibbs_tokens_resampled_per_s_per_chip",
        "value": round(value, 1),
        "unit": "tokens/s/chip",
        "vs_baseline": round(value / REF_CPU_TOKENS_PER_S, 2),
        "path": path,
        "baseline_tokens_per_s": REF_CPU_TOKENS_PER_S,
        "windows": [round(r, 1) for r in rates],
    }))


if __name__ == "__main__":
    main()
