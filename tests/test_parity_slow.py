"""Statistical parity on the real corpus (SURVEY.md §4) — slow-marked.

Run explicitly:  python -m pytest tests/test_parity_slow.py -m slow -q

Asserts the repo's L-LDA reaches the thesis table's AUC (BASELINE.md:15-17)
within Monte-Carlo error on abstracts_data.csv.  Uses a reduced iteration
budget (300 sweeps) whose AUC sits within ~1 point of the 2000-sweep
plateau (recorded 2000-sweep runs live in PARITY.jsonl / PARITY.md).
"""

import os

import numpy as np
import pytest

DATA = "/root/reference/abstracts_data.csv"

pytestmark = pytest.mark.slow

# (depth, iters, thinning, thesis AUC, tolerance, needs_accelerator)
# depth-1 runs in ~4 min even on the fake-CPU test platform; depth-3's
# (D=4171, K=512) sweeps need the TPU (run with LDA_TESTS_KEEP_PLATFORM=1)
CASES = [
    (1, 300, 10, 0.898, 0.035, False),
    (3, 300, 25, 0.862, 0.035, True),
]


@pytest.mark.skipif(not os.path.exists(DATA), reason="reference corpus absent")
def test_llda_vi_auc_parity():
    """CAVI engine reaches the thesis Gibbs plateau on the real corpus
    (recorded full runs: PARITY.md VI table — 0.902/0.904/0.898 by depth).
    Reduced budget keeps this CPU-runnable under -m slow."""
    from lda_thesis_tpu.data.corpus import load_corpus, split_data
    from lda_thesis_tpu.data.vocab import prune_dict
    from lda_thesis_tpu.eval.metrics import binary_yreal, evaluate_ranking
    from lda_thesis_tpu.models.labeled_lda_vi import LabeledLDAVI

    corpus = load_corpus(DATA, d=1, mode="truncate")
    train, test = split_data(corpus, seed=42)
    dicti = prune_dict(train.docs, lower=0, upper=1)
    model = LabeledLDAVI(train.docs, train.labs, list(train.labelset), dicti,
                         alpha=0.1, beta=0.01, seed=42)
    model.fit(iters=30)
    th = np.asarray(model.infer(test.docs, iters=30))

    y_bin = binary_yreal(test.labs, model.labelmap)[:, 1:]
    th = th[:, 1:]
    nonzero = np.where(th.sum(axis=1) != 0)[0]
    m = evaluate_ranking(th[nonzero], y_bin[nonzero])
    assert m["auc_roc"] >= 0.87, m["auc_roc"]


@pytest.mark.skipif(not os.path.exists(DATA), reason="reference corpus absent")
@pytest.mark.parametrize("depth,it,s,target,tol,needs_acc", CASES)
def test_llda_auc_parity(depth, it, s, target, tol, needs_acc):
    import jax

    if needs_acc and jax.default_backend() == "cpu":
        pytest.skip("depth-3 parity needs the TPU "
                    "(LDA_TESTS_KEEP_PLATFORM=1 pytest -m slow)")
    from lda_thesis_tpu.data.corpus import load_corpus, split_data
    from lda_thesis_tpu.data.vocab import prune_dict
    from lda_thesis_tpu.eval.metrics import binary_yreal, evaluate_ranking
    from lda_thesis_tpu.models.labeled_lda import LabeledLDA

    corpus = load_corpus(DATA, d=depth, mode="truncate")
    train, test = split_data(corpus, seed=42)
    dicti = prune_dict(train.docs, lower=0, upper=1)
    model = LabeledLDA(train.docs, train.labs, list(train.labelset), dicti,
                       alpha=0.1, beta=0.01, seed=42)
    model.run_training(it, s, perplexity=False)
    th = np.asarray(model.run_test(test.docs, it, s))

    y_bin = binary_yreal(test.labs, model.labelmap)[:, 1:]
    th = th[:, 1:]
    nonzero = np.where(th.sum(axis=1) != 0)[0]
    m = evaluate_ranking(th[nonzero], y_bin[nonzero])
    assert m["auc_roc"] >= target - tol, (
        f"depth-{depth} AUC {m['auc_roc']:.4f} below thesis {target} - {tol}"
    )
