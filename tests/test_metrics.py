"""Metrics tests vs a literal NumPy transcription of the reference code."""

import numpy as np
import pytest
from sklearn.metrics import auc as sk_auc

from lda_thesis_tpu.eval.metrics import (
    binary_yreal,
    evaluate_ranking,
    get_f1,
    macro_auc_roc,
    n_error,
    one_roc,
    rates,
)


# --- literal oracle (reference evaluate_LabeledLDA.py:8-107 semantics) -------

def _ref_one_roc(prob, real_binary):
    resorted = np.argsort(prob)[::-1]
    reals = real_binary[resorted]
    probs = prob[resorted]
    thresholds = np.sort(list(set(probs)))[::-1]
    tp, tn, fp, fn = [], [], [], []
    for c in thresholds:
        preds = [1 if x >= c else 0 for x in probs]
        z = list(zip(preds, reals))
        tp.append(sum(x == y for (x, y) in z if x == 1))
        tn.append(sum(x == y for (x, y) in z if x == 0))
        fp.append(sum(x != y for (x, y) in z if x == 1))
        fn.append(sum(x != y for (x, y) in z if x == 0))
    return np.array(tp), np.array(tn), np.array(fp), np.array(fn)


@pytest.fixture
def scored():
    rng = np.random.default_rng(0)
    D, K = 25, 12
    th = rng.random((D, K))
    th[rng.random((D, K)) < 0.3] = 0.0  # ties at zero like real θ̂
    y = (rng.random((D, K)) < 0.25).astype(int)
    y[y.sum(axis=1) == 0, 0] = 1  # ensure every doc has a true label
    return th, y


def test_one_roc_matches_reference(scored):
    th, y = scored
    for d in range(th.shape[0]):
        tp, tn, fp, fn = one_roc(th[d], y[d])
        rtp, rtn, rfp, rfn = _ref_one_roc(th[d], y[d])
        np.testing.assert_array_equal(tp, rtp)
        np.testing.assert_array_equal(tn, rtn)
        np.testing.assert_array_equal(fp, rfp)
        np.testing.assert_array_equal(fn, rfn)


def test_macro_auc_matches_sklearn(scored):
    th, y = scored
    _, _, _, _, fprs, tprs = rates(th, y)
    ours = macro_auc_roc(fprs, tprs)
    ref = np.mean([sk_auc(f, t) for f, t in zip(fprs, tprs)])
    assert np.isclose(ours, ref, rtol=1e-12)


def test_n_error_reference_semantics(scored):
    th, y = scored

    def ref_n_error(th_hat, y_real, n):
        counter = 0
        for i in range(th_hat.shape[0]):
            top = np.argsort(th_hat[i, :])[::-1][:n]
            if y_real[i, top].sum() > 0:
                counter += 1
        return counter / th_hat.shape[0]

    for n in (1, 2, 3):
        assert n_error(th, y, n) == ref_n_error(th, y, n)


def test_get_f1_matches_reference(scored):
    th, y = scored
    tps, tns, fps, fns, _, _ = rates(th, y)

    ref_f1 = []
    for tp, fp, tn, fn in zip(tps, fps, tns, fns):
        prec = [x / (x + y2) for (x, y2) in zip(tp, fp)]
        rec = [x / (x + y2) for (x, y2) in zip(tp, fn)]
        with np.errstate(invalid="ignore"):
            raw = [(2 * p * r) / (p + r) for p, r in zip(prec, rec)]
        ref_f1.append(np.nanmax(raw))
    assert np.isclose(get_f1(tps, fps, tns, fns), np.mean(ref_f1), rtol=1e-12)


def test_binary_yreal_ignores_unknown():
    y = binary_yreal([["A", "ZZZ"], ["B"]], {"A": 0, "B": 1})
    assert y.tolist() == [[1, 0], [0, 1]]


def test_perfect_ranking_auc_is_one():
    th = np.array([[0.9, 0.5, 0.1, 0.05]])
    y = np.array([[1, 1, 0, 0]])
    m = evaluate_ranking(th, y)
    assert m["auc_roc"] == 1.0 and m["one_hit"] == 1.0 and m["f1_macro"] == 1.0
