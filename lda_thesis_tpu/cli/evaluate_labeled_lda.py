"""Labeled-LDA train/eval CLI (reference evaluate_LabeledLDA.py:110-183).

Flag-compatible with the reference driver:

    python -m lda_thesis_tpu.cli.evaluate_labeled_lda \
        -f abstracts_data.csv -d 3 -i 4 -s 4 -l 0 -u 1 -a 0.1 -b 0.01

plus framework extras: ``--seed``, ``--no-perplexity``, ``--engine vi``,
checkpoint/resume (``--checkpoint PATH --save-every N --resume``), and
multi-chip training (``--n-chains C --n-data S`` over a ``(chains, data)``
mesh; combine with parallel/bootstrap.py for multi-host runs).
"""

from __future__ import annotations

import argparse
import pickle
import time

import numpy as np

from ..eval.metrics import binary_yreal, evaluate_ranking
from ..pipeline import split_corpus
from ..utils.config import GibbsConfig, RunConfig


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
    p.add_argument("--sweep", choices=("auto", "fused", "dense", "compact"),
                   default="auto",
                   help="Gibbs sweep kernel (auto=fused); needed e.g. to "
                        "--resume a checkpoint written with another kernel")
    p.add_argument("--n-buckets", type=int, default=None,
                   help="document length buckets (default: the model's 4; "
                        "the bucket layout is part of the draw stream, so "
                        "pass the recorded value — e.g. 1 for pre-round-5 "
                        "checkpoints — when using --resume)")
    p.add_argument("--checkpoint", default=None, metavar="PATH",
                   help="checkpoint path prefix (writes PATH.npz + PATH.json)")
    p.add_argument("--save-every", type=int, default=0, metavar="N",
                   help="checkpoint every N training iterations "
                        "(must be a multiple of -s; default: only at the end)")
    p.add_argument("--resume", action="store_true",
                   help="resume training from --checkpoint if it exists")
    p.add_argument("--max-restarts", type=int, default=0, metavar="R",
                   help="with --checkpoint: absorb up to R in-process "
                        "training faults by restarting from the last "
                        "durable checkpoint (utils/elastic.elastic_train)")
    p.add_argument("--progress", action="store_true",
                   help="report tokens/s + ETA at dispatch-chunk boundaries "
                        "(utils/tracing.Progress; no per-iteration syncs)")
    p.add_argument("--trace", default=None, metavar="DIR",
                   help="capture a TensorBoard-loadable device profile of "
                        "the training phase into DIR (utils/tracing.trace)")
    p.add_argument("--n-chains", type=int, default=1,
                   help="independent Gibbs chains (distributed trainer)")
    p.add_argument("--n-data", type=int, default=1,
                   help="document shards over the data mesh axis")
    p.add_argument("--table-shard", choices=("replicated", "vocab"),
                   default="replicated",
                   help="vocab: shard the topic-word table's V axis over "
                        "the data mesh (per-device state ~V*K/S; large "
                        "vocabularies). Requires --n-data > 1, single chain")
    return p


def make_config(opt) -> RunConfig:
    return RunConfig(
        file=opt.file,
        depth=opt.lvl,
        label_mode="truncate",
        lower=opt.lower,
        upper=opt.upper,
        gibbs=GibbsConfig(
            iters=opt.it, thinning=opt.thinning, alpha=opt.alpha,
            beta=opt.beta, seed=opt.seed if opt.seed is not None else 0,
        ),
        pickle=opt.pickle,
        n_chains=opt.n_chains,
        n_data_shards=opt.n_data,
    )


def _train_gibbs(cfg: RunConfig, opt, train):
    """Construct + train the (possibly distributed) model through the ONE
    chunked-training loop in the framework, utils/elastic.ElasticGibbs
    (kill the process mid-run, rerun with --resume, and the final counts
    are bit-identical to the uninterrupted run; --max-restarts additionally
    absorbs in-process faults via elastic_train)."""
    from ..data.vocab import prune_dict
    from ..utils.elastic import ElasticGibbs, elastic_train

    g = cfg.gibbs
    dicti = prune_dict(train.docs, lower=cfg.lower, upper=cfg.upper)

    table_shard = getattr(opt, "table_shard", "replicated")
    if table_shard == "vocab" and cfg.n_data_shards < 2:
        raise SystemExit("--table-shard vocab requires --n-data > 1")
    if cfg.n_chains > 1 or cfg.n_data_shards > 1:
        import jax

        from ..parallel import DistributedLabeledLDA, make_mesh

        # mesh chains axis: as many device rows as divide both the device
        # count (after data sharding) and the requested chain count; the
        # rest of the chains run vmapped within each shard
        n_dev = len(jax.devices())
        if n_dev % cfg.n_data_shards:
            raise SystemExit(f"--n-data {cfg.n_data_shards} does not divide "
                             f"{n_dev} devices")
        mesh_chains = n_dev // cfg.n_data_shards
        while cfg.n_chains % mesh_chains:
            mesh_chains -= 1
        mesh = make_mesh(n_data=cfg.n_data_shards, n_chains=mesh_chains,
                         devices=jax.devices()[: mesh_chains * cfg.n_data_shards])
        if opt.sweep == "compact":
            raise SystemExit("--sweep compact is single-chip only")

        def make_model():
            return DistributedLabeledLDA(
                train.docs, train.labs, list(train.labelset), dicti,
                alpha=g.alpha, beta=g.beta, mesh=mesh, n_chains=cfg.n_chains,
                seed=g.seed, sweep=opt.sweep, table_shard=table_shard,
            )

        train_kw = {}
    else:
        from ..models.labeled_lda import LabeledLDA

        bucket_kw = {}
        if getattr(opt, "n_buckets", None):
            bucket_kw["n_buckets"] = int(opt.n_buckets)

        def make_model():
            return LabeledLDA(
                train.docs, train.labs, list(train.labelset), dicti,
                alpha=g.alpha, beta=g.beta, seed=g.seed, sweep=opt.sweep,
                **bucket_kw,
            )

        train_kw = {"perplexity": not opt.no_perplexity}

    save_every = opt.save_every or g.iters
    if opt.checkpoint and opt.save_every and save_every % g.thinning:
        raise SystemExit("--save-every must be a multiple of -s (thinning)")
    max_restarts = getattr(opt, "max_restarts", 0)
    if max_restarts > 0:
        if not opt.checkpoint:
            raise SystemExit("--max-restarts requires --checkpoint")
        return elastic_train(
            make_model, g.iters, g.thinning, opt.checkpoint, save_every,
            max_restarts=max_restarts, verbose=True,
            resume_first=opt.resume,
            progress=True if getattr(opt, "progress", False) else None,
            **train_kw,
        )
    eg = ElasticGibbs(make_model(), opt.checkpoint, resume=opt.resume,
                      verbose=True)
    eg.run(g.iters, g.thinning, save_every,
           progress=True if getattr(opt, "progress", False) else None,
           **train_kw)
    return eg.model


def main(argv=None) -> None:
    from ..utils.cache import enable_persistent_cache

    enable_persistent_cache()
    opt = build_parser().parse_args(argv)
    cfg = make_config(opt)  # applies the thinning == 0 -> iters rule
    g = cfg.gibbs

    t0 = time.time()
    train, test = split_corpus(cfg.file, d=cfg.depth, seed=opt.seed)

    import contextlib

    from ..utils.tracing import annotate, trace

    tracer = trace(opt.trace) if opt.trace else contextlib.nullcontext()
    print("Starting training...")
    with tracer:
        if opt.engine == "vi":
            from ..data.vocab import prune_dict
            from ..models.labeled_lda_vi import LabeledLDAVI

            dicti = prune_dict(train.docs, lower=cfg.lower, upper=cfg.upper)
            model = LabeledLDAVI(
                train.docs, train.labs, list(train.labelset), dicti,
                alpha=g.alpha, beta=g.beta, seed=g.seed,
            )
            with annotate("train"):
                model.fit(iters=g.iters)
            print("Testing test data...")
            with annotate("test"):
                th = model.infer(test.docs, iters=g.iters)
        else:
            with annotate("train"):
                model = _train_gibbs(cfg, opt, train)
            print("Testing test data...")
            with annotate("test"):
                th = model.run_test(test.docs, cfg.test_iters,
                                    cfg.test_thinning)
    if opt.trace:
        print(f"device profile written to {opt.trace} "
              f"(view: tensorboard --logdir {opt.trace})")
    th = np.array(th)

    if cfg.pickle:
        pickle.dump(model, open("LabeledLDA_model.pkl", "wb"))
        pickle.dump(test, open("LabeledLDA_testset.pkl", "wb"))
        pickle.dump(th, open("LabeledLDA_theta.pkl", "wb"))

    print("Model:               Labeled LDA (TPU)")
    print("Corpus:             ", cfg.file)
    print("Label depth         ", cfg.depth)
    print("# of Gibbs samples: ", int(g.iters))
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
