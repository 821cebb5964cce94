"""Labeled-LDA train/eval CLI (reference evaluate_LabeledLDA.py:110-183).

Flag-compatible with the reference driver:

    python -m lda_thesis_tpu.cli.evaluate_labeled_lda \
        -f abstracts_data.csv -d 3 -i 4 -s 4 -l 0 -u 1 -a 0.1 -b 0.01

plus framework extras (``--seed``, ``--no-perplexity``).
"""

from __future__ import annotations

import argparse
import pickle
import time

import numpy as np

from ..eval.metrics import binary_yreal, evaluate_ranking
from ..pipeline import split_corpus, test_labeled_lda, train_labeled_lda


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-f", dest="file", required=True, help="dataset location")
    p.add_argument("-d", dest="lvl", type=int, default=3, help="depth of label level")
    p.add_argument("-i", dest="it", type=int, required=True, help="# of iterations")
    p.add_argument("-s", dest="thinning", type=int, default=0, help="save frequency")
    p.add_argument("-l", dest="lower", type=float, default=0,
                   help="lower df threshold for dictionary pruning")
    p.add_argument("-u", dest="upper", type=float, default=1,
                   help="upper df threshold for dictionary pruning")
    p.add_argument("-a", dest="alpha", type=float, default=0.1, help="alpha prior")
    p.add_argument("-b", dest="beta", type=float, default=0.01, help="beta prior")
    p.add_argument("-p", dest="pickle", action="store_true",
                   help="save the model as pickle")
    p.add_argument("--seed", type=int, default=None, help="RNG seed")
    p.add_argument("--no-perplexity", action="store_true",
                   help="skip perplexity tracking during training")
    p.add_argument("--engine", choices=("gibbs", "vi"), default="gibbs",
                   help="inference engine: collapsed Gibbs or CAVI")
    return p


def main(argv=None) -> None:
    opt = build_parser().parse_args(argv)
    if opt.thinning == 0:
        opt.thinning = opt.it  # reference rule (evaluate_LabeledLDA.py:130-131)

    t0 = time.time()
    train, test = split_corpus(opt.file, d=opt.lvl, seed=opt.seed)

    print("Starting training...")
    if opt.engine == "vi":
        from ..data.vocab import prune_dict
        from ..models.labeled_lda_vi import LabeledLDAVI

        dicti = prune_dict(train.docs, lower=opt.lower, upper=opt.upper)
        model = LabeledLDAVI(
            train.docs, train.labs, list(train.labelset), dicti,
            alpha=opt.alpha, beta=opt.beta,
            seed=opt.seed if opt.seed is not None else 0,
        )
        model.fit(iters=opt.it)
        print("Testing test data...")
        th = model.infer(test.docs, iters=opt.it)
    else:
        model = train_labeled_lda(
            train, it=opt.it, s=opt.thinning, al=opt.alpha, be=opt.beta,
            l=opt.lower, u=opt.upper, seed=opt.seed if opt.seed is not None else 0,
            perplexity=not opt.no_perplexity,
        )
        print("Testing test data...")
        th, preds = test_labeled_lda(model, test, it=opt.it, thinning=opt.thinning)
    th = np.array(th)

    if opt.pickle:
        pickle.dump(model, open("LabeledLDA_model.pkl", "wb"))
        pickle.dump(test, open("LabeledLDA_testset.pkl", "wb"))
        pickle.dump(th, open("LabeledLDA_theta.pkl", "wb"))

    print("Model:               Labeled LDA (TPU)")
    print("Corpus:             ", opt.file)
    print("Label depth         ", opt.lvl)
    print("# of Gibbs samples: ", int(opt.it))
    print("-----------------------------------")

    y_bin = binary_yreal(test.labs, model.labelmap)

    # reference filtering (evaluate_LabeledLDA.py:159-167): drop the root
    # column, then docs with all-zero prediction rows
    y_bin = y_bin[:, 1:]
    th = th[:, 1:]
    nonzero = np.where(th.sum(axis=1) != 0)[0]
    y_bin, th = y_bin[nonzero], th[nonzero]

    m = evaluate_ranking(th, y_bin)
    print("AUC ROC:                 ", m["auc_roc"])
    print("one error:               ", m["one_hit"])
    print("two error:               ", m["two_hit"])
    print("F1 score (macro average) ", m["f1_macro"])
    print(f"total wall time: {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
