"""Variational-inference path tests (ops/vi.py, models/labeled_lda_vi.py)."""

import numpy as np
import pytest

from lda_thesis_tpu.data.vocab import Dictionary
from lda_thesis_tpu.models.labeled_lda_vi import LabeledLDAVI

DOCS = [
    "cat dog pet animal fur".split(),
    "dog bark pet tail animal".split(),
    "stock bond market price trade".split(),
    "bond yield market finance price".split(),
    "cat purr whisker pet fur".split(),
    "equity trade finance market price".split(),
] * 4
LABS = [["A"], ["A"], ["B"], ["B"], ["A"], ["B"]] * 4


@pytest.fixture(scope="module")
def model():
    dicti = Dictionary(DOCS)
    m = LabeledLDAVI(DOCS, LABS, ["A", "B"], dicti, alpha=0.5, beta=0.1, seed=0)
    m.fit(iters=30)
    return m


def test_elbo_monotone(model):
    """CAVI guarantees a non-decreasing ELBO — the core correctness check."""
    e = np.asarray(model.elbo_history)
    assert len(e) >= 3
    assert np.all(np.diff(e) >= -1e-3 * np.abs(e[:-1]))  # tiny f32 slack


def test_estimators_normalised_and_masked(model):
    ph = model.get_phi()
    th = model.get_theta()
    assert ph.shape == (3, model.V)  # root + A + B
    np.testing.assert_allclose(ph.sum(axis=1), 1.0, rtol=1e-4)
    np.testing.assert_allclose(th.sum(axis=1), 1.0, rtol=1e-4)
    # label constraint: docs labelled A put zero mass on topic B
    a_col = model.labelmap["A"]
    b_col = model.labelmap["B"]
    assert np.all(th[0::6, b_col] == 0)  # A-labelled docs
    assert np.all(th[2::6, a_col] == 0)  # B-labelled docs


def test_topics_separate_branches(model):
    """Topic A should put most non-root mass on animal words, B on finance."""
    ph = model.get_phi()
    w2v = model.dicti.token2id
    a_row = ph[model.labelmap["A"]]
    b_row = ph[model.labelmap["B"]]
    assert a_row[w2v["cat"]] > a_row[w2v["market"]]
    assert b_row[w2v["market"]] > b_row[w2v["cat"]]


def test_infer_heldout(model):
    th = model.infer(["cat dog pet".split(), "stock market price".split()], iters=20)
    assert th.shape == (2, 3)
    np.testing.assert_allclose(th.sum(axis=1), 1.0, rtol=1e-4)
    assert th[0, model.labelmap["A"]] > th[0, model.labelmap["B"]]
    assert th[1, model.labelmap["B"]] > th[1, model.labelmap["A"]]


def test_svi_reaches_similar_solution():
    dicti = Dictionary(DOCS)
    m = LabeledLDAVI(DOCS, LABS, ["A", "B"], dicti, alpha=0.5, beta=0.1, seed=1)
    m.fit_svi(epochs=30, batch_size=8)
    ph = m.get_phi()
    w2v = dicti.token2id
    assert ph[m.labelmap["A"], w2v["cat"]] > ph[m.labelmap["A"], w2v["market"]]
    assert m.perplexity() < model_perplexity_upper_bound(m)


def model_perplexity_upper_bound(m):
    return float(m.V)  # must beat the uniform-word model by a wide margin
