"""Run the unmodified reference CascadeLDA end-to-end (parity ground truth).

Same shim approach as measure_reference_cpu.py: the reference imports gensim
(absent); we back it with this framework's gensim-compatible Dictionary and
preprocessing, then drive reference evaluate_CascadeLDA semantics: train via
go_down_tree, test via test_down_tree, metrics via the reference's own
evaluate functions.

Usage: python benchmarks/run_reference_cascade.py [--it 4] [--s 2] [--seed 42]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from measure_reference_cpu import install_gensim_shim  # noqa: E402

DATA = "/root/reference/abstracts_data.csv"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--it", type=int, default=4)
    ap.add_argument("--s", type=int, default=2)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--limit-test", type=int, default=0,
                    help="only test the first N docs (0 = all)")
    args = ap.parse_args()

    install_gensim_shim()
    sys.path.insert(0, "/root/reference")
    np.random.seed(args.seed)

    import CascadeLDA as ref
    import evaluate_CascadeLDA as refeval

    t0 = time.time()
    train, test = ref.split_data(f=DATA, d=3)
    model = ref.train_it(train, it=args.it, s=args.s, l=0, u=1, al=0.1, be=0.01)
    print(f"train done at {time.time()-t0:.0f}s", flush=True)

    test_docs = test[0][: args.limit_test] if args.limit_test else test[0]
    test_labs = test[1][: len(test_docs)]
    l1, l2, l3 = zip(*[
        model.test_down_tree(x, it=args.it, thinning=args.s, threshold=0.95)
        for x in test_docs
    ])
    print(f"test done at {time.time()-t0:.0f}s", flush=True)

    th_all = refeval.setup_theta(l1, l2, l3, model)
    y_all = refeval.binary_yreal(test_labs, model.labelmap)
    row = {"model": "cascade-ref", "it": args.it, "thinning": args.s,
           "seed": args.seed}
    for depth in (1, 2, 3):
        lab_level = [len(x) == depth for x in model.labelmap.keys()]
        inds = np.where(lab_level)[0]
        y_bin, th = y_all[:, inds], th_all[:, inds]
        valid = np.intersect1d(
            np.where(th.sum(axis=1) != 0)[0], np.where(y_bin.sum(axis=1) != 0)[0]
        )
        y_bin, th = y_bin[valid], th[valid]
        tps, tns, fps, fns, fprs, tprs = refeval.rates(th, y_bin)
        row[f"auc_d{depth}"] = round(float(refeval.macro_auc_roc(fprs, tprs)), 4)
        row[f"one_hit_d{depth}"] = round(float(refeval.n_error(th, y_bin, 1)), 4)
        row[f"two_hit_d{depth}"] = round(float(refeval.n_error(th, y_bin, 2)), 4)
        row[f"f1_d{depth}"] = round(float(refeval.get_f1(tps, fps, tns, fns)), 4)
        print(f"depth {depth}: AUC {row[f'auc_d{depth}']:.4f} "
              f"1hit {row[f'one_hit_d{depth}']:.4f} "
              f"2hit {row[f'two_hit_d{depth}']:.4f} "
              f"F1 {row[f'f1_d{depth}']:.4f} "
              f"(n={len(valid)})", flush=True)
    row["wall_s"] = round(time.time() - t0, 1)
    # raw JSONL record alongside the repo rows (round-5 VERDICT item 1)
    from run_parity import record

    record(row)
    print(f"total wall time: {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
