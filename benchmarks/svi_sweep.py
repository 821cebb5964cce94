"""SVI schedule/local-iteration sweep (round-4 VERDICT item 5).

Loads the abstracts corpus once per depth and evaluates fit_svi under a
grid of (tau, kappa, batch_size, local_iters, epochs), printing one JSON
line per config with the test AUC. CAVI references (run_parity llda-vi):
d1 0.9020 / d2 0.9039 / d3 0.8979.

Usage: python benchmarks/svi_sweep.py --depth 3 [--configs default]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from lda_thesis_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np

DATA = "/root/reference/abstracts_data.csv"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--grid", default="default")
    args = ap.parse_args()

    from lda_thesis_tpu.data.corpus import load_corpus, split_data
    from lda_thesis_tpu.data.vocab import prune_dict
    from lda_thesis_tpu.eval.metrics import binary_yreal, evaluate_ranking
    from lda_thesis_tpu.models.labeled_lda_vi import LabeledLDAVI

    corpus = load_corpus(DATA, d=args.depth, mode="truncate")
    train, test = split_data(corpus, seed=args.seed)
    dicti = prune_dict(train.docs, lower=0, upper=1)

    grids = {
        "default": [
            # (epochs, batch, tau, kappa, local_iters)
            (60, 512, 1.0, 0.7, 1),     # round-3 behaviour (per-batch t now)
            (60, 512, 1.0, 0.7, 8),
            (60, 512, 64.0, 0.7, 8),
            (60, 512, 1.0, 0.5, 8),
            (60, 512, 256.0, 0.9, 8),
            (120, 512, 64.0, 0.7, 8),
        ],
        "winner": [
            (60, 2048, 1.0, 0.8, 1),
        ],
        "refine2": [
            (60, 2048, 1.0, 0.7, 1),
            (60, 2048, 1.0, 0.8, 1),
            (60, 1024, 1.0, 0.8, 1),
            (120, 1024, 1.0, 0.7, 1),
            (120, 2048, 1.0, 0.7, 1),
            (60, 2048, 1.0, 0.7, 2),
        ],
        "refine": [
            (60, 512, 1.0, 0.6, 1),
            (60, 512, 1.0, 0.8, 1),
            (60, 256, 1.0, 0.7, 1),
            (60, 1024, 1.0, 0.7, 1),
            (120, 512, 1.0, 0.7, 1),
            (60, 512, 1.0, 0.7, 2),
            (120, 256, 1.0, 0.7, 1),
        ],
    }

    for epochs, batch, tau, kappa, li in grids[args.grid]:
        model = LabeledLDAVI(train.docs, train.labs, list(train.labelset),
                             dicti, alpha=0.1, beta=0.01, seed=args.seed)
        t0 = time.time()
        model.fit_svi(epochs=epochs, batch_size=batch, tau=tau, kappa=kappa,
                      local_iters=li)
        th = model.infer(test.docs, iters=100)
        y_bin = binary_yreal(test.labs, model.labelmap)[:, 1:]
        th = np.asarray(th)[:, 1:]
        nz = np.where(th.sum(axis=1) != 0)[0]
        m = evaluate_ranking(th[nz], y_bin[nz])
        print(json.dumps({
            "depth": args.depth, "epochs": epochs, "batch": batch,
            "tau": tau, "kappa": kappa, "local_iters": li,
            "auc": round(m["auc_roc"], 4),
            "elbo": round(model.elbo_history[-1], 1),
            "wall_s": round(time.time() - t0, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
