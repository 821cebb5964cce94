"""HSLDA train/eval driver.

The reference ships HSLDA library-only (no CLI — SURVEY.md §1); this driver
mirrors its module-level pipeline (HSLDA.py:397-417: non-shuffled 90/10
split, prefix-expanded labels, train, batch test) and adds the same ranking
metrics the other drivers report.

    python -m lda_thesis_tpu.cli.evaluate_hslda \
        -f abstracts_data.csv -d 3 -k 15 -i 25 -s 5 --test-it 250 --test-s 25
"""

from __future__ import annotations

import argparse
import pickle
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-f", dest="file", required=True, help="dataset location")
    p.add_argument("-d", dest="lvl", type=int, default=3, help="depth of label level")
    p.add_argument("-k", dest="K", type=int, default=15, help="# latent topics")
    p.add_argument("-i", dest="it", type=int, required=True, help="training iterations")
    p.add_argument("-s", dest="thinning", type=int, default=0, help="save frequency")
    p.add_argument("--test-it", type=int, default=250, help="test iterations")
    p.add_argument("--test-s", type=int, default=25, help="test thinning")
    p.add_argument("--opt", type=int, default=1, choices=(1, 2, 3),
                   help="z-coupling variant (HSLDA.py sample_z opt)")
    p.add_argument("--alpha-prime", type=float, default=1.0)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--gamma", type=float, default=1.0)
    p.add_argument("--mu", type=float, default=0.0)
    p.add_argument("--sigma", type=float, default=1.0)
    p.add_argument("--xi", type=float, default=0.0)
    p.add_argument("-p", dest="pickle", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--checkpoint", default=None, metavar="PATH",
                   help="checkpoint path prefix (writes PATH.npz + PATH.json)")
    p.add_argument("--save-every", type=int, default=0, metavar="N",
                   help="checkpoint every N training cycles "
                        "(must be a multiple of -s; default: only at the end)")
    p.add_argument("--resume", action="store_true",
                   help="resume training from --checkpoint if it exists")
    p.add_argument("--max-restarts", type=int, default=0, metavar="R",
                   help="with --checkpoint: absorb up to R in-process "
                        "training faults by restarting from the last "
                        "durable checkpoint (utils/elastic.elastic_train)")
    p.add_argument("--n-chains", type=int, default=1,
                   help="parallel Gibbs chains (>1: sharded DistributedHSLDA, "
                        "chain-averaged predictions)")
    p.add_argument("--n-data", type=int, default=1,
                   help="document shards per chain row (AD-LDA psum merges)")
    return p


def main(argv=None) -> None:
    from ..utils.cache import enable_persistent_cache

    enable_persistent_cache()
    opt = build_parser().parse_args(argv)
    if opt.thinning == 0:
        opt.thinning = opt.it

    from ..data.corpus import load_corpus, split_data
    from ..eval.metrics import binary_yreal, evaluate_ranking
    from ..models.hslda import HSLDA

    t0 = time.time()
    corpus = load_corpus(opt.file, d=opt.lvl, mode="prefix")
    # HSLDA's split is NOT shuffled (reference HSLDA.py:397-403)
    train, test = split_data(corpus, shuffle=False)

    print("Starting training...")
    hyper = dict(k=opt.K, alpha_prime=opt.alpha_prime, alpha=opt.alpha,
                 gamma=opt.gamma, mu=opt.mu, sigma=opt.sigma, xi=opt.xi,
                 seed=opt.seed)
    if opt.n_chains > 1 or opt.n_data > 1:
        import jax

        from ..parallel import DistributedHSLDA, make_mesh

        n_dev = len(jax.devices())
        if n_dev % opt.n_data:
            raise SystemExit(f"--n-data {opt.n_data} does not divide "
                             f"{n_dev} devices")
        mesh_chains = n_dev // opt.n_data
        while opt.n_chains % mesh_chains:
            mesh_chains -= 1
        mesh = make_mesh(n_data=opt.n_data, n_chains=mesh_chains,
                         devices=jax.devices()[: mesh_chains * opt.n_data])

        def make_model():
            return DistributedHSLDA(train.docs, train.labs,
                                    list(train.labelset), mesh=mesh,
                                    n_chains=opt.n_chains, **hyper)
    else:
        def make_model():
            return HSLDA(train.docs, train.labs, list(train.labelset), **hyper)

    # ONE chunked-training loop for the whole framework (round-5 VERDICT
    # item 7): utils/elastic handles chunking, atomic checkpoints, resume,
    # and (--max-restarts) in-process fault recovery
    from ..utils.elastic import ElasticGibbs, elastic_train

    save_every = opt.save_every or opt.it
    if opt.checkpoint and opt.save_every and save_every % opt.thinning:
        # alignment only matters when checkpoint chunking is requested;
        # otherwise trailing cycles simply run unsaved (reference rule)
        raise SystemExit("--save-every must be a multiple of -s (thinning)")
    if opt.max_restarts > 0:
        if not opt.checkpoint:
            raise SystemExit("--max-restarts requires --checkpoint")
        model = elastic_train(
            make_model, opt.it, opt.thinning, opt.checkpoint, save_every,
            max_restarts=opt.max_restarts, verbose=True, opt=opt.opt,
            resume_first=opt.resume,
        )
    else:
        eg = ElasticGibbs(make_model(), opt.checkpoint, resume=opt.resume,
                          verbose=True)
        eg.run(opt.it, opt.thinning, save_every, opt=opt.opt)
        model = eg.model

    print("Testing test data...")
    scores = model.run_tests(test.docs, it=opt.test_it, s=opt.test_s)

    if opt.pickle:
        # scores first: they are the cheap artifact and must survive even if
        # model pickling hits an unpicklable field
        pickle.dump(scores, open("HSLDA_scores.pkl", "wb"))
        pickle.dump(model, open("HSLDA_model.pkl", "wb"))

    print("Model:               HSLDA (TPU)")
    print("Corpus:             ", opt.file)
    print("Label depth         ", opt.lvl)
    print("# of Gibbs samples: ", int(opt.it))
    print("-----------------------------------")

    y_bin = binary_yreal(test.labs, model.labelmap)
    y_bin, sc = y_bin[:, 1:], scores[:, 1:]  # drop the root column
    valid = (y_bin.sum(axis=1) != 0)
    m = evaluate_ranking(sc[valid], y_bin[valid])
    print("AUC ROC:                 ", m["auc_roc"])
    print("one error:               ", m["one_hit"])
    print("two error:               ", m["two_hit"])
    print("F1 score (macro average) ", m["f1_macro"])
    print(f"total wall time: {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
