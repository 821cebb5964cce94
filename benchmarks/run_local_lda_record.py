"""LocalLDA real-corpus record: repo (TPU) vs unmodified reference (CPU).

North-star config #3 (BASELINE.json): the sentence-level LocalLDA sampler
on the abstracts corpus.  The reference (LocalLDA.py:11-130) publishes no
numbers for it, so the record is comparative: both implementations train on
the same corpus at the same (K, iters, thinning) and report training
perplexity exp(−Σ f·log⟨θ_d, φ_v⟩ / N) over their own final estimates,
plus wall-clock and a top-words sample.

    python benchmarks/run_local_lda_record.py --it 100 --s 10 --k 20
    python benchmarks/run_local_lda_record.py --reference --it 100 --s 10

Records one JSON line each into PARITY.jsonl (model = "local-lda" /
"local-lda-ref").
"""

from __future__ import annotations

import argparse
import csv
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

DATA = "/root/reference/abstracts_data.csv"


def read_texts():
    csv.field_size_limit(min(sys.maxsize, 2**31 - 1))
    with open(DATA, "r", newline="") as f:
        return [row[1] for row in csv.reader(f)]


def record(row):
    from run_parity import record as rec

    rec(row)


def run_repo(k: int, it: int, s: int, seed: int) -> None:
    from lda_thesis_tpu.models.local_lda import LocalLDA

    t0 = time.time()
    docs = read_texts()
    model = LocalLDA(docs, alpha=0.1, beta=0.01, K=k, local_lda=True,
                     seed=seed)
    t_prep = time.time() - t0
    model.run_training(it, s)
    perp = model.perplexity()
    t_all = time.time() - t0
    top = model.print_topwords(8)
    record({
        "model": "local-lda", "K": k, "it": it, "thinning": s, "seed": seed,
        "D_sentences": int(model.D), "V": int(model.V),
        "perplexity": round(float(perp), 2),
        "prep_s": round(t_prep, 1), "wall_s": round(t_all, 1),
        "topwords_t0": top[0][:9] if top else [],
    })


def run_reference(k: int, it: int, s: int, seed: int) -> None:
    from measure_reference_cpu import install_gensim_shim

    install_gensim_shim()
    sys.path.insert(0, "/root/reference")
    np.random.seed(seed)

    t0 = time.time()
    import re

    import LocalLDA as ref

    # Reference bug (LocalLDA.py:154-156): the split pattern '!|\.|\?|,|-|'
    # ends in an empty alternative; on Python >= 3.7 re.split matches it at
    # EVERY position, shredding documents into single characters and leaving
    # an empty corpus.  Patch to the historical (pre-3.7) semantics the
    # thesis ran with, where empty matches were skipped.
    ref.splitdocs = lambda doc: re.split(r"!|\.|\?|,|-", doc)

    docs = read_texts()
    # lemma=True is the reference default; it needs nltk's wordnet corpus
    # which may be absent — fall back to stem=True like the thesis runs
    try:
        model = ref.LocalLDA(docs, alpha=0.1, beta=0.01, K=k,
                             localLDA=True, lemma=True, stem=False)
        # touch one lemmatize call to trigger a missing-corpus error early
        model_mode = "lemma"
    except LookupError:
        model = ref.LocalLDA(docs, alpha=0.1, beta=0.01, K=k,
                             localLDA=True, lemma=False, stem=True)
        model_mode = "stem"
    t_prep = time.time() - t0
    model.run_training(it, s)
    ph = model.get_phi()  # (K, V)
    th = model.get_theta()  # (D, K)
    # same perplexity formula as the repo model, over the reference's docs
    ll, n = 0.0, 0
    for d, doctup in enumerate(model.doc_tups):
        for v, f in doctup:
            inner = float(th[d] @ ph[:, v])
            ll += f * np.log(max(inner, 1e-38))
            n += f
    perp = float(np.exp(-ll / max(n, 1)))
    t_all = time.time() - t0
    record({
        "model": "local-lda-ref", "K": k, "it": it, "thinning": s,
        "seed": seed, "mode": model_mode,
        "D_sentences": int(len(model.docs)), "V": int(len(model.w_to_v)),
        "perplexity": round(perp, 2),
        "prep_s": round(t_prep, 1), "wall_s": round(t_all, 1),
    })


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", action="store_true")
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--it", type=int, default=100)
    ap.add_argument("--s", type=int, default=10)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    if args.reference:
        run_reference(args.k, args.it, args.s, args.seed)
    else:
        run_repo(args.k, args.it, args.s, args.seed)


if __name__ == "__main__":
    main()
