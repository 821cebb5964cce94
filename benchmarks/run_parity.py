"""Thesis-scale quality parity runs (BASELINE.md rows) — repo side.

Runs the repo's L-LDA / CascadeLDA at the reference's own configurations on
abstracts_data.csv and appends one JSON line per run to PARITY.jsonl:

    python benchmarks/run_parity.py --model llda    --depth 1 --it 2000 --s 10
    python benchmarks/run_parity.py --model llda    --depth 3 --it 2000 --s 25
    python benchmarks/run_parity.py --model cascade --it 4 --s 2   # evals d=1..3

Reference targets (thesis evaluation table, BASELINE.md:15-20):
    L-LDA   d3 (2000;25) AUC 0.862 | d2 (2000;25) 0.885 | d1 (2000;10) 0.898
    Cascade d3 (4;2)     AUC 0.901 | d2 0.934 | d1 0.941  (published)
    Cascade measured on this machine (benchmarks/run_reference_cascade.py,
    seed 42): d1 0.86 / d2 0.84 / d3 0.81
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

DATA = "/root/reference/abstracts_data.csv"

from lda_thesis_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
OUT = "/root/repo/PARITY.jsonl"


def record(row: dict) -> None:
    row["ts"] = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def run_llda(depth: int, it: int, s: int, seed: int,
             merge: int = 5) -> None:
    from lda_thesis_tpu.data.corpus import load_corpus, split_data
    from lda_thesis_tpu.data.vocab import prune_dict
    from lda_thesis_tpu.eval.metrics import binary_yreal, evaluate_ranking
    from lda_thesis_tpu.models.labeled_lda import LabeledLDA

    t0 = time.time()
    corpus = load_corpus(DATA, d=depth, mode="truncate")
    train, test = split_data(corpus, seed=seed)
    dicti = prune_dict(train.docs, lower=0, upper=1)
    model = LabeledLDA(train.docs, train.labs, list(train.labelset), dicti,
                       alpha=0.1, beta=0.01, seed=seed, merge_every=merge)
    model.run_training(it, s, perplexity=False)
    t_train = time.time() - t0
    th = model.run_test(test.docs, it, s)
    t_all = time.time() - t0

    y_bin = binary_yreal(test.labs, model.labelmap)[:, 1:]
    th = np.asarray(th)[:, 1:]
    nonzero = np.where(th.sum(axis=1) != 0)[0]
    m = evaluate_ranking(th[nonzero], y_bin[nonzero])
    record({
        "model": "llda", "depth": depth, "it": it, "thinning": s,
        "seed": seed, "sweep": model.sweep, "merge": merge,
        "auc": round(m["auc_roc"], 4),
        "one_hit": round(m["one_hit"], 4), "two_hit": round(m["two_hit"], 4),
        "f1": round(m["f1_macro"], 4),
        "train_s": round(t_train, 1), "wall_s": round(t_all, 1),
    })


def run_llda_vi(depth: int, it: int, seed: int, test_iters: int = 100,
                svi: bool = False) -> None:
    """CAVI/SVI engine at thesis scale (round-3 VERDICT item 2)."""
    from lda_thesis_tpu.data.corpus import load_corpus, split_data
    from lda_thesis_tpu.data.vocab import prune_dict
    from lda_thesis_tpu.eval.metrics import binary_yreal, evaluate_ranking
    from lda_thesis_tpu.models.labeled_lda_vi import LabeledLDAVI

    t0 = time.time()
    corpus = load_corpus(DATA, d=depth, mode="truncate")
    train, test = split_data(corpus, seed=seed)
    dicti = prune_dict(train.docs, lower=0, upper=1)
    model = LabeledLDAVI(train.docs, train.labs, list(train.labelset), dicti,
                         alpha=0.1, beta=0.01, seed=seed)
    if svi:
        model.fit_svi(epochs=it)  # tuned defaults (benchmarks/svi_sweep.py)
    else:
        model.fit(iters=it)
    t_train = time.time() - t0
    th = model.infer(test.docs, iters=test_iters)
    t_all = time.time() - t0

    y_bin = binary_yreal(test.labs, model.labelmap)[:, 1:]
    th = np.asarray(th)[:, 1:]
    nonzero = np.where(th.sum(axis=1) != 0)[0]
    m = evaluate_ranking(th[nonzero], y_bin[nonzero])
    record({
        "model": "llda-svi" if svi else "llda-vi",
        "depth": depth, "it": it, "seed": seed,
        "test_it": test_iters,
        "auc": round(m["auc_roc"], 4),
        "one_hit": round(m["one_hit"], 4), "two_hit": round(m["two_hit"], 4),
        "f1": round(m["f1_macro"], 4),
        "train_s": round(t_train, 1), "wall_s": round(t_all, 1),
    })


def run_llda_chains(depth: int, it: int, s: int, seed: int,
                    n_chains: int = 8) -> None:
    """Multi-chain real-corpus record (round-4 VERDICT item 1b): train
    ``n_chains`` independent chains through the distributed fused trainer
    on one chip, fold the test set in against the POOLED φ̂ and against
    each chain's own φ̂.  The north-star clause "≥8x samples/s at matched
    AUC" has its 1-chip proxy when pooled AUC ≥ the single-chain level."""
    from lda_thesis_tpu.data.corpus import load_corpus, split_data
    from lda_thesis_tpu.data.vocab import prune_dict
    from lda_thesis_tpu.eval.metrics import binary_yreal, evaluate_ranking
    from lda_thesis_tpu.parallel import make_mesh
    from lda_thesis_tpu.parallel.trainer import DistributedLabeledLDA

    t0 = time.time()
    corpus = load_corpus(DATA, d=depth, mode="truncate")
    train, test = split_data(corpus, seed=seed)
    dicti = prune_dict(train.docs, lower=0, upper=1)
    mesh = make_mesh(n_data=1, n_chains=1)
    model = DistributedLabeledLDA(
        train.docs, train.labs, list(train.labelset), dicti,
        alpha=0.1, beta=0.01, mesh=mesh, n_chains=n_chains, seed=seed)
    # the trainer dispatches bounded chunks internally (bit-identical to
    # one dispatch; the tunnelled compiler crashes on monolithic scans)
    model.run_training(it, s)
    import jax as _jax

    _jax.block_until_ready(model.state.ph_hat)
    t_train = time.time() - t0

    y_bin = binary_yreal(test.labs, model.labelmap)[:, 1:]

    def auc_for(chain):
        th = np.asarray(model.run_test(test.docs, it, s, chain=chain))[:, 1:]
        nonzero = np.where(th.sum(axis=1) != 0)[0]
        return evaluate_ranking(th[nonzero], y_bin[nonzero])

    m = auc_for(None)
    t_all = time.time() - t0
    per_chain = [round(auc_for(c)["auc_roc"], 4) for c in range(n_chains)]
    record({
        "model": "llda-chains", "depth": depth, "it": it, "thinning": s,
        "seed": seed, "n_chains": n_chains, "sweep": model.sweep,
        "auc_pooled": round(m["auc_roc"], 4),
        "auc_per_chain": per_chain,
        "auc_chain_mean": round(float(np.mean(per_chain)), 4),
        "one_hit": round(m["one_hit"], 4), "two_hit": round(m["two_hit"], 4),
        "f1": round(m["f1_macro"], 4),
        "mc_error_phi": round(model.mc_error(), 6),
        "train_s": round(t_train, 1), "wall_s": round(t_all, 1),
    })


def run_cascade(it: int, s: int, seed: int, sweep: str = "dense",
                threshold: float = 0.95, root_it=None, root_s=None,
                test_it=None, test_s=None) -> None:
    from lda_thesis_tpu.data.corpus import load_corpus, split_data
    from lda_thesis_tpu.data.vocab import prune_dict
    from lda_thesis_tpu.eval.cascade import setup_theta
    from lda_thesis_tpu.eval.metrics import binary_yreal, evaluate_ranking
    from lda_thesis_tpu.models.cascade_lda import CascadeLDA

    t0 = time.time()
    corpus = load_corpus(DATA, d=3, mode="prefix")
    train, test = split_data(corpus, seed=seed)
    dicti = prune_dict(train.docs, lower=0, upper=1)
    model = CascadeLDA(train.docs, train.labs, list(train.labelset), dicti,
                       alpha=0.1, beta=0.01, seed=seed, sweep=sweep)
    model.go_down_tree(it=it, s=s, root_it=root_it, root_s=root_s)
    t_train = time.time() - t0
    l1, l2, l3 = model.test_down_tree_batch(
        test.docs, it=it if test_it is None else test_it,
        thinning=s if test_s is None else test_s, threshold=threshold)
    t_all = time.time() - t0

    th_all = setup_theta(l1, l2, l3, model.labelmap)
    y_all = binary_yreal(test.labs, model.labelmap)
    out = {"model": "cascade", "it": it, "thinning": s, "seed": seed,
           "sweep": sweep, "train_s": round(t_train, 1),
           "wall_s": round(t_all, 1)}
    if root_it is not None or root_s is not None:
        out["root_it"], out["root_s"] = root_it, root_s
    if test_it is not None or test_s is not None:
        out["test_it"], out["test_s"] = test_it, test_s
    for depth in (1, 2, 3):
        inds = np.array([len(x) == depth for x in model.labelmap.keys()])
        y_bin, th = y_all[:, inds], th_all[:, inds]
        valid = (th.sum(axis=1) != 0) & (y_bin.sum(axis=1) != 0)
        m = evaluate_ranking(th[valid], y_bin[valid])
        out[f"auc_d{depth}"] = round(m["auc_roc"], 4)
        out[f"one_hit_d{depth}"] = round(m["one_hit"], 4)
        out[f"two_hit_d{depth}"] = round(m["two_hit"], 4)
        out[f"f1_d{depth}"] = round(m["f1_macro"], 4)
    record(out)


def run_hslda(it: int, s: int, seed: int, opt: int, n_chains: int = 1,
              test_it: int = 250, test_s: int = 25) -> None:
    """HSLDA quality row (round-5 VERDICT item 6): the CLI pipeline —
    depth-3 prefix labels, UNSHUFFLED 90/10 split (reference
    HSLDA.py:397-403), blocked-Gibbs training at the requested z-coupling
    ``opt``, batch fold-in test, root column dropped and all-zero label
    rows filtered exactly as cli/evaluate_hslda.py does.  ``n_chains > 1``
    routes through DistributedHSLDA (chain-averaged Φ(η_c·z̄_c−ξ))."""
    from lda_thesis_tpu.data.corpus import load_corpus, split_data
    from lda_thesis_tpu.eval.metrics import binary_yreal, evaluate_ranking

    t0 = time.time()
    corpus = load_corpus(DATA, d=3, mode="prefix")
    train, test = split_data(corpus, shuffle=False)
    if n_chains > 1:
        from lda_thesis_tpu.parallel import DistributedHSLDA

        model = DistributedHSLDA(train.docs, train.labs,
                                 list(train.labelset), n_chains=n_chains,
                                 seed=seed)
    else:
        from lda_thesis_tpu.models.hslda import HSLDA

        model = HSLDA(train.docs, train.labs, list(train.labelset),
                      seed=seed)
    t_built = time.time()
    model.run_training(it=it, thinning=s, opt=opt)
    t_trained = time.time()
    scores = model.run_tests(test.docs, it=test_it, s=test_s)

    y_bin = binary_yreal(test.labs, model.labelmap)
    y_bin, sc = y_bin[:, 1:], np.asarray(scores)[:, 1:]
    valid = y_bin.sum(axis=1) != 0
    m = evaluate_ranking(sc[valid], y_bin[valid])
    record({
        "model": "hslda" if n_chains == 1 else "hslda-chains",
        "it": it, "thinning": s, "seed": seed, "opt": opt,
        "n_chains": n_chains, "K": model.K, "L": model.L, "V": model.V,
        "test_it": test_it, "test_s": test_s,
        "auc_roc": round(m["auc_roc"], 4), "one_hit": round(m["one_hit"], 4),
        "two_hit": round(m["two_hit"], 4), "f1": round(m["f1_macro"], 4),
        "train_s": round(t_trained - t_built, 1),
        "wall_s": round(time.time() - t0, 1),
    })


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model",
                    choices=("llda", "llda-vi", "llda-svi", "llda-chains",
                             "cascade", "hslda", "hslda-chains"),
                    required=True)
    ap.add_argument("--n-chains", type=int, default=8)
    ap.add_argument("--merge", type=int, default=5,
                    help="fused merge-block cap (llda only)")
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--it", type=int, required=True)
    ap.add_argument("--s", type=int, required=True)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--opt", type=int, default=1, choices=(1, 2, 3),
                    help="HSLDA z-coupling variant (hslda models only)")
    ap.add_argument("--sweep", default="auto")
    ap.add_argument("--root-it", type=int, default=None)
    ap.add_argument("--root-s", type=int, default=None)
    ap.add_argument("--test-it", type=int, default=None)
    ap.add_argument("--test-s", type=int, default=None)
    args = ap.parse_args()
    if args.model == "llda":
        run_llda(args.depth, args.it, args.s, args.seed, merge=args.merge)
    elif args.model == "llda-chains":
        run_llda_chains(args.depth, args.it, args.s, args.seed,
                        n_chains=args.n_chains)
    elif args.model in ("llda-vi", "llda-svi"):
        run_llda_vi(args.depth, args.it, args.seed,
                    test_iters=args.test_it or 100,
                    svi=args.model == "llda-svi")
    elif args.model in ("hslda", "hslda-chains"):
        run_hslda(args.it, args.s, args.seed, opt=args.opt,
                  n_chains=args.n_chains if args.model == "hslda-chains" else 1,
                  test_it=args.test_it or 250, test_s=args.test_s or 25)
    else:
        run_cascade(args.it, args.s, args.seed, sweep=args.sweep,
                    root_it=args.root_it, root_s=args.root_s,
                    test_it=args.test_it, test_s=args.test_s)


if __name__ == "__main__":
    main()
