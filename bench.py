"""Headline benchmark: collapsed-Gibbs tokens-resampled/s/chip.

Runs the flagship Labeled-LDA training sweep (ops/gibbs.py) on the real
abstracts corpus at the reference's own configuration (depth-3 labels,
unpruned dictionary: D=4171, V=8969, K=392) and reports throughput against
the measured reference CPU sampler.

Baseline denominator: the unmodified reference ``training_iteration``
(LabeledLDA.py:101-125) measured by benchmarks/measure_reference_cpu.py on
this machine's CPU: 46_179 tokens-resampled/s (249_972 tokens/sweep, 2
sweeps, 10.83 s).  Re-measure with:

    python benchmarks/measure_reference_cpu.py --iters 2

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

REF_CPU_TOKENS_PER_S = 46_179.3  # measured; see module docstring

DATA = "/root/reference/abstracts_data.csv"


def main() -> None:
    sys.path.insert(0, "/root/repo")
    import jax

    from lda_thesis_tpu.data.corpus import load_corpus, split_data
    from lda_thesis_tpu.data.vocab import prune_dict
    from lda_thesis_tpu.models.labeled_lda import LabeledLDA

    corpus = load_corpus(DATA, d=3, mode="truncate")
    train, _ = split_data(corpus, seed=42)
    dicti = prune_dict(train.docs, lower=0, upper=1)
    model = LabeledLDA(train.docs, train.labs, list(train.labelset), dicti,
                       alpha=0.1, beta=0.01, seed=0)

    tokens_per_sweep = model.n_tokens

    # warmup with the SAME static config so the timed run hits the jit cache
    n_sweeps = 20
    model.run_training(n_sweeps, n_sweeps, perplexity=False)

    t0 = time.perf_counter()
    model.run_training(n_sweeps, n_sweeps, perplexity=False)
    jax.block_until_ready(model.counts)
    dt = time.perf_counter() - t0

    value = tokens_per_sweep * n_sweeps / dt
    print(json.dumps({
        "metric": "gibbs_tokens_resampled_per_s_per_chip",
        "value": round(value, 1),
        "unit": "tokens/s/chip",
        "vs_baseline": round(value / REF_CPU_TOKENS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
