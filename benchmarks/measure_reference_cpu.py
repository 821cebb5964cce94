"""Measure the reference CPU sampler's throughput (the bench denominator).

Runs the *actual* reference implementation (/root/reference/LabeledLDA.py,
unmodified) on the abstracts corpus and times its ``training_iteration``
per-token Python loop.  The reference imports gensim, which is not installed;
we inject a minimal shim backed by this framework's gensim-compatible
Dictionary (lda_thesis_tpu/data/vocab.py) — the reference only needs
``token2id/id2token/values/doc2bow`` from it, and the preprocessing entry
point is never called because we feed pre-tokenised documents.

Usage:  python benchmarks/measure_reference_cpu.py [--iters 2] [--depth 3]

Prints one JSON line: {"ref_tokens_per_s": ..., "tokens_per_sweep": ..., ...}
The measured value is recorded as REF_CPU_TOKENS_PER_S in bench.py.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import types

REPO = "/root/repo"
REFERENCE = "/root/reference"
DATA = "/root/reference/abstracts_data.csv"


def install_gensim_shim() -> None:
    """Satisfy the reference's module-level gensim imports (LabeledLDA.py:1-2)."""
    from lda_thesis_tpu.data.textproc import preprocess_documents
    from lda_thesis_tpu.data.vocab import Dictionary

    gensim = types.ModuleType("gensim")
    parsing = types.ModuleType("gensim.parsing")
    preprocessing = types.ModuleType("gensim.parsing.preprocessing")
    preprocessing.preprocess_documents = preprocess_documents
    from lda_thesis_tpu.data.stopwords import STOPWORDS as _SW
    preprocessing.STOPWORDS = frozenset(_SW)
    from lda_thesis_tpu.data.porter import PorterStemmer as _PS
    parsing_attr = _PS
    corpora = types.ModuleType("gensim.corpora")
    dictionary = types.ModuleType("gensim.corpora.dictionary")
    dictionary.Dictionary = Dictionary
    gensim.parsing = parsing
    gensim.corpora = corpora
    parsing.preprocessing = preprocessing
    parsing.PorterStemmer = parsing_attr
    corpora.dictionary = dictionary
    for name, mod in [
        ("gensim", gensim),
        ("gensim.parsing", parsing),
        ("gensim.parsing.preprocessing", preprocessing),
        ("gensim.corpora", corpora),
        ("gensim.corpora.dictionary", dictionary),
    ]:
        sys.modules.setdefault(name, mod)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--file", default=DATA)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    install_gensim_shim()
    sys.path.insert(0, REFERENCE)
    import LabeledLDA as ref  # noqa: E402  (the reference module)

    from lda_thesis_tpu.data.corpus import load_corpus, split_data
    from lda_thesis_tpu.data.vocab import prune_dict

    corpus = load_corpus(args.file, d=args.depth, mode="truncate")
    train, _ = split_data(corpus, seed=42)
    dicti = prune_dict(train.docs, lower=0, upper=1)

    model = ref.LabeledLDA(train.docs, train.labs, list(train.labelset), dicti,
                           alpha=0.1, beta=0.01)
    tokens_per_sweep = int(model.n_zk.sum())

    t0 = time.perf_counter()
    for _ in range(args.iters):
        model.training_iteration()
    dt = time.perf_counter() - t0

    print(json.dumps({
        "ref_tokens_per_s": tokens_per_sweep * args.iters / dt,
        "tokens_per_sweep": tokens_per_sweep,
        "sweeps": args.iters,
        "wall_s": dt,
        "D": model.D, "V": model.V, "K": model.K,
    }))


if __name__ == "__main__":
    main()
