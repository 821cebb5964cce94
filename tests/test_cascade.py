"""CascadeLDA tests: joint-level training equivalence, cascaded inference,
tree-probability reassembly (reference CascadeLDA.py, evaluate_CascadeLDA.py)."""

import numpy as np
import pytest

from lda_thesis_tpu.data.vocab import Dictionary
from lda_thesis_tpu.eval.cascade import setup_theta
from lda_thesis_tpu.models.cascade_lda import CascadeLDA


def _toy_corpus():
    """Two disjoint branches: A (animals) and B (finance), depth 3."""
    a_docs = [
        "cat dog cat pet animal fur".split(),
        "dog bark pet animal tail fur".split(),
        "cat purr pet whisker animal".split(),
        "dog cat pet animal play".split(),
    ]
    b_docs = [
        "stock bond market price trade".split(),
        "bond yield market finance price".split(),
        "stock equity trade finance market".split(),
        "price market finance stock bond".split(),
    ]
    a_labs = [["A", "A1", "A11"], ["A", "A1", "A12"],
              ["A", "A2", "A21"], ["A", "A1", "A11"]]
    b_labs = [["B", "B1", "B11"], ["B", "B1", "B12"],
              ["B", "B2", "B21"], ["B", "B1", "B11"]]
    docs = a_docs + b_docs
    labs = a_labs + b_labs
    labelset = sorted({x for lab in labs for x in lab})
    dicti = Dictionary(docs)
    return docs, labs, labelset, dicti


@pytest.fixture(scope="module")
def trained():
    docs, labs, labelset, dicti = _toy_corpus()
    m = CascadeLDA(docs, labs, labelset, dicti, alpha=0.1, beta=0.01, seed=0)
    m.go_down_tree(it=20, s=5)
    return m, docs, labs, dicti


def test_tree_structure(trained):
    m, *_ = trained
    assert m.lablist[0] == "root"
    assert set(m.lablist_l1) == {"A", "B"}
    assert set(m.lablist_l2) == {"A1", "A2", "B1", "B2"}
    assert m._children("A") == ["A1", "A2"]
    assert m._children("B1") == ["B11", "B12"]


def test_ph_rows_normalised_and_disjoint(trained):
    """Joint level training must factorise: node-A children only put mass on
    words of A-branch documents (proves the masked topics stay disjoint)."""
    m, docs, labs, dicti = trained
    # every trained label row is a (sub-)distribution: saves where a topic
    # had zero counts contribute 0 rows to the thinned mean (the reference
    # would contribute NaN there — documented deviation), so sums lie in
    # (0, 1]; the big branch labels must be fully populated distributions
    for lab in ["root", "A", "B", "A1", "B2", "A11", "B12"]:
        row = m.ph[m.labelmap[lab]]
        assert row.min() >= 0
        assert 0.0 < row.sum() <= 1.0 + 1e-4
    for lab in ["A", "B"]:
        np.testing.assert_allclose(m.ph[m.labelmap[lab]].sum(), 1.0, rtol=1e-4)

    a_vocab = {dicti.token2id[w] for d, l in zip(docs, labs) if "A" in l for w in d}
    b_vocab = {dicti.token2id[w] for d, l in zip(docs, labs) if "B" in l for w in d}
    only_b = np.array(sorted(b_vocab - a_vocab))
    only_a = np.array(sorted(a_vocab - b_vocab))
    for lab in ["A1", "A2", "A11", "A12", "A21"]:
        assert m.ph[m.labelmap[lab]][only_b].sum() == 0.0
    for lab in ["B1", "B2", "B11", "B12", "B21"]:
        assert m.ph[m.labelmap[lab]][only_a].sum() == 0.0


def test_cascaded_prediction_recovers_branch(trained):
    m, *_ = trained
    doc = "cat dog pet animal fur purr".split()
    l1, l2, l3 = m.test_down_tree(doc, it=20, thinning=5, threshold=0.95)
    labs1 = [lab for lab, _ in l1]
    assert "A" in labs1
    # probabilities are sorted descending and within [0, 1]
    probs = [p for _, p in l1]
    assert probs == sorted(probs, reverse=True)
    assert all(0 <= p <= 1 for p in probs)
    # expansion happened below the matched branch
    expanded = {lab for tups in l2 for lab, _ in tups}
    assert any(lab.startswith("A") for lab in expanded)


def test_batch_matches_single(trained):
    m, *_ = trained
    docs = ["cat dog pet".split(), "stock bond market".split()]
    l1, l2, l3 = m.test_down_tree_batch(docs, it=10, thinning=5)
    assert len(l1) == len(l2) == len(l3) == 2
    assert all(isinstance(t, list) for t in l1)


def test_flat_run_test(trained):
    m, *_ = trained
    docs = ["cat dog pet animal".split(), "stock market price".split()]
    th = m.run_test(docs, it=10, thinning=5, depth=1)
    # depth-1 slice = [root, A, B]
    assert th.shape == (2, 3)
    np.testing.assert_allclose(th.sum(axis=1), 1.0, rtol=1e-4)
    labels = [x for x in m.lablist if len(x) in (1, 4)]
    a_col = labels.index("A")
    b_col = labels.index("B")
    assert th[0, a_col] > th[0, b_col]
    assert th[1, b_col] > th[1, a_col]


def test_setup_theta_multiplies_down_tree():
    labelmap = {"root": 0, "A": 1, "B": 2, "A1": 3, "A11": 4}
    l1p = [[("A", 0.8), ("root", 0.15)]]
    l2p = [[[("A1", 0.6), ("A", 0.3)]]]
    l3p = [[[("A11", 0.5), ("A1", 0.4)]]]
    th = setup_theta(l1p, l2p, l3p, labelmap)
    assert th.shape == (1, 5)
    np.testing.assert_allclose(th[0, labelmap["A"]], 0.8)
    # A1 (local 0.6) is multiplied by parent A (0.8)
    np.testing.assert_allclose(th[0, labelmap["A1"]], 0.6 * 0.8)
    # A11 (local 0.5) multiplied by the *already multiplied* A1
    np.testing.assert_allclose(th[0, labelmap["A11"]], 0.5 * 0.6 * 0.8)
    np.testing.assert_allclose(th[0, labelmap["root"]], 0.15)


def test_setup_theta_empty_levels():
    labelmap = {"root": 0, "A": 1}
    th = setup_theta([[("A", 0.9)]], [[]], [[]], labelmap)
    np.testing.assert_allclose(th[0, 1], 0.9)


def test_root_level_schedule():
    """go_down_tree(root_it=, root_s=): the root model gets its own
    iteration schedule (framework extension; deep levels keep (it, s))."""
    docs, labs, labelset, dicti = _toy_corpus()
    m = CascadeLDA(docs, labs, labelset, dicti, alpha=0.1, beta=0.01, seed=0)
    m.go_down_tree(it=4, s=2, root_it=12, root_s=3)
    # root + letter rows trained (root-level output), children rows trained
    for lab in ("root", "A", "B", "A1", "A11"):
        row = m.ph[m.labelmap[lab]]
        assert np.isfinite(row).all()
        assert row.sum() > 0
    th = m.run_test(docs[:2], it=4, thinning=2, depth=1)
    assert th.shape[0] == 2
    assert np.isfinite(th).all()


def test_fused_sweep_trains_and_predicts():
    """Opt-in fused sweep (whole-sweep merge-block kernel per level): trains
    the full tree, keeps branch topics disjoint, and predicts the right
    branch — exercises models/cascade_lda._level_train_loop_fused through
    the XLA twin on CPU."""
    docs, labs, labelset, dicti = _toy_corpus()
    m = CascadeLDA(docs, labs, labelset, dicti, alpha=0.1, beta=0.01,
                   seed=0, sweep="fused")
    m.go_down_tree(it=20, s=5)
    # masked factorisation holds on the fused path too
    a_words = {w for d in docs[:4] for w in d}
    b_cols = [dicti.token2id[w] for w in {w for d in docs[4:] for w in d}
              if w not in a_words]
    for lab in ("A1", "A11", "A2"):
        assert m.ph[m.labelmap[lab], b_cols].sum() == 0
    l1, _, _ = m.test_down_tree("cat dog pet animal".split(), it=30,
                                thinning=5)
    top = max(l1, key=lambda t: t[1])[0]
    assert top == "A"
