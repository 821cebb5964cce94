"""LocalLDA training driver.

The reference ships LocalLDA library-only (no CLI, SURVEY.md §1); this
driver provides the same train/inspect loop the reference performs by hand:
sentence segmentation, K-topic Gibbs training, top-words + perplexity.

    python -m lda_thesis_tpu.cli.evaluate_local_lda \
        -f abstracts_data.csv -k 20 -i 50 -s 5 -a 0.1 -b 0.01
"""

from __future__ import annotations

import argparse
import csv
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-f", dest="file", required=True, help="dataset location")
    p.add_argument("-k", dest="K", type=int, default=20, help="# topics")
    p.add_argument("-i", dest="it", type=int, required=True, help="# of iterations")
    p.add_argument("-s", dest="thinning", type=int, default=0, help="save frequency")
    p.add_argument("-a", dest="alpha", type=float, default=0.1, help="alpha prior")
    p.add_argument("-b", dest="beta", type=float, default=0.01, help="beta prior")
    p.add_argument("--no-sentences", action="store_true",
                   help="treat whole documents as documents (localLDA=False)")
    p.add_argument("--stem", action="store_true", help="Porter-stem tokens")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--topwords", type=int, default=10)
    p.add_argument("--sweep", choices=["auto", "fused", "dense"],
                   default="auto",
                   help="training kernel: fused merge-block Pallas kernel "
                        "(default) or the exact dense XLA sweep")
    p.add_argument("--merge-every", type=int, default=1,
                   help="fused path: sweeps per topic-word table commit "
                        "(M=1 matches the exact sampler's quality; larger "
                        "M trades perplexity for wall)")
    return p


def _read_texts(filename: str):
    csv.field_size_limit(min(sys.maxsize, 2**31 - 1))
    with open(filename, "r", newline="") as f:
        return [row[1] for row in csv.reader(f)]


def main(argv=None) -> None:
    from ..utils.cache import enable_persistent_cache

    enable_persistent_cache()
    opt = build_parser().parse_args(argv)
    if opt.thinning == 0:
        opt.thinning = opt.it

    from ..models.local_lda import LocalLDA

    t0 = time.time()
    docs = _read_texts(opt.file)
    model = LocalLDA(
        docs, alpha=opt.alpha, beta=opt.beta, K=opt.K,
        local_lda=not opt.no_sentences, stem=opt.stem, seed=opt.seed,
        sweep=opt.sweep, merge_every=opt.merge_every,
    )
    print(f"LocalLDA: D={model.D} sentence-docs, V={model.V}, K={model.K}")
    model.run_training(opt.it, opt.thinning)
    model.print_topwords(opt.topwords)
    print("perplexity:", round(model.perplexity(), 2))
    print(f"total wall time: {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
