"""HSLDA tests (reference HSLDA.py:82-394)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lda_thesis_tpu.models.hslda import HSLDA
from lda_thesis_tpu.ops.hslda_gibbs import hslda_init_counts, hslda_z_sweep
from lda_thesis_tpu.ops.sampling import stirling_table


def _toy():
    docs = [
        "cat dog pet animal fur cat".split(),
        "dog bark pet tail animal".split(),
        "stock bond market price trade".split(),
        "bond yield market finance price stock".split(),
        "cat purr whisker pet".split(),
        "equity trade finance market price".split(),
    ] * 3
    labs = [
        ["A", "A1"], ["A", "A1"], ["B", "B1"], ["B", "B1"], ["A", "A2"], ["B", "B2"],
    ] * 3
    labelset = ["A", "A1", "A2", "B", "B1", "B2"]
    return docs, labs, labelset


def test_init_state_shapes_and_invariants():
    docs, labs, labelset = _toy()
    m = HSLDA(docs, labs, labelset, k=5, seed=0)
    assert m.L == 7  # root '' + 6 labels
    assert m.labelmap[""] == 0
    total = int(np.asarray(m.mask).sum())
    assert int(np.asarray(m.counts.n_dk).sum()) == total
    assert int(np.asarray(m.counts.n_vk).sum()) == total
    np.testing.assert_array_equal(
        np.asarray(m.counts.n_vk).sum(axis=0), np.asarray(m.counts.n_k)
    )
    # a respects label signs: positive labels -> a > 0, negative -> a < 0
    a = np.asarray(m.a)
    l = np.asarray(m.labs)
    assert (a[l > 0] > 0).all()
    assert (a[l == 0] < 0).all()


@pytest.mark.parametrize("opt", [1, 2, 3])
def test_z_sweep_preserves_counts(opt):
    docs, labs, labelset = _toy()
    m = HSLDA(docs, labs, labelset, k=5, seed=1)
    total = int(np.asarray(m.mask).sum())
    counts, M = hslda_z_sweep(
        jax.random.PRNGKey(0), m.counts, m.tok_v, m.mask, m.labs,
        m.eta, m.a, alpha_beta=m.alpha * m.beta, gamma=m.gamma, xi=m.xi, opt=opt,
    )
    assert int(np.asarray(counts.n_dk).sum()) == total
    assert int(np.asarray(counts.n_vk).sum()) == total
    assert (np.asarray(counts.n_dk) >= 0).all()
    np.testing.assert_array_equal(
        np.asarray(counts.n_vk).sum(axis=0), np.asarray(counts.n_k)
    )
    # incremental M must equal the exact recomputation z̄ @ ηᵀ
    n_d = np.maximum(np.asarray(m.mask).sum(axis=1), 1)
    zbar = np.asarray(counts.n_dk) / n_d[:, None]
    np.testing.assert_allclose(
        np.asarray(M), zbar @ np.asarray(m.eta).T, atol=1e-3
    )


def test_opt2_sparse_coupling_matches_blockwise():
    """The compact positive-label Φ coupling (lab_pos_ids path) computes the
    same logp2 sum as the label-blockwise evaluation — draws from the same
    key agree except on float-order ties (none expected at toy scale)."""
    docs, labs, labelset = _toy()
    m = HSLDA(docs, labs, labelset, k=5, seed=1)
    kwargs = dict(alpha_beta=m.alpha * m.beta, gamma=m.gamma, xi=m.xi, opt=2)
    c_block, M_block = hslda_z_sweep(
        jax.random.PRNGKey(0), m.counts, m.tok_v, m.mask, m.labs,
        m.eta, m.a, **kwargs,
    )
    c_sparse, M_sparse = hslda_z_sweep(
        jax.random.PRNGKey(0), m.counts, m.tok_v, m.mask, m.labs,
        m.eta, m.a, lab_pos_ids=m._lab_pos_ids,
        lab_pos_valid=m._lab_pos_valid, **kwargs,
    )
    agree = np.mean(np.asarray(c_block.z) == np.asarray(c_sparse.z))
    assert agree > 0.98, agree
    total = int(np.asarray(m.mask).sum())
    assert int(np.asarray(c_sparse.n_vk).sum()) == total
    np.testing.assert_allclose(np.asarray(M_sparse), np.asarray(M_block),
                               atol=1e-3)


def test_opt1_log_decomposition_identity():
    """The kernel's matmul form of log p2 must equal the reference's direct
    product form (HSLDA.py:254-257) up to a k-independent constant."""
    rng = np.random.default_rng(0)
    L, K, n_d = 6, 4, 17.0
    eta = rng.normal(size=(L, K))
    M = rng.normal(size=L)  # means without the current token
    a = rng.normal(size=L)
    labs = (rng.random(L) < 0.5).astype(float)
    labs[0] = 1.0

    # reference form: prod over positive labels of exp(-(m_k - a)^2 / 2)
    ref = np.empty(K)
    for k in range(K):
        mk = M + eta[:, k] / n_d
        ref[k] = np.sum(labs * (-0.5 * (mk - a) ** 2))

    # kernel form: -(C @ eta / n_d + labs @ eta^2 / (2 n_d^2))
    C = (M - a) * labs
    mine = -(C @ eta / n_d + labs @ (eta**2) / (2 * n_d**2))

    diff = ref - mine
    np.testing.assert_allclose(diff, diff[0] * np.ones(K), atol=1e-10)


def test_training_cycle_and_thinning():
    docs, labs, labelset = _toy()
    m = HSLDA(docs, labs, labelset, k=5, seed=0)
    m.run_training(it=4, thinning=2, opt=1)
    assert m.ph is not None and m.th is not None
    assert m.ph.shape == (5, m.V)
    assert m.th.shape == (m.D, 5)
    assert not np.isnan(m.ph).any() and not np.isnan(m.th).any()
    np.testing.assert_allclose(np.asarray(m.beta).sum(), 1.0, rtol=1e-5)
    # eta/a updated and finite
    assert np.isfinite(np.asarray(m.eta)).all()
    a = np.asarray(m.a)
    l = np.asarray(m.labs)
    assert (a[l > 0] > 0).all() and (a[l == 0] < 0).all()


def test_run_tests_scores():
    docs, labs, labelset = _toy()
    m = HSLDA(docs, labs, labelset, k=5, seed=0)
    m.run_training(it=6, thinning=3, opt=1)
    scores = m.run_tests(
        ["cat dog pet animal".split(), "stock market finance price".split()],
        it=10, s=5,
    )
    assert scores.shape == (2, m.L)
    assert (scores >= 0).all() and (scores <= 1).all()
    preds = m.label_predictions(scores[0])
    assert len(preds) == m.L


def test_display_topics():
    docs, labs, labelset = _toy()
    m = HSLDA(docs, labs, labelset, k=3, seed=0)
    m.run_training(it=2, thinning=2)
    tops = m.display_topics(n=4)
    assert len(tops) == 3 and all(len(t) == 4 for t in tops)


def test_stirling_antoniak_support():
    """Antoniak draws must satisfy 1 <= m <= n for n >= 1 (and m=0 for n=0)."""
    table = stirling_table(20)
    logs = np.log(np.where(table > 0, table, 0))
    n = jnp.asarray([[0, 1, 5, 12]], jnp.int32)
    log_ab = np.log(0.7)
    S = 20
    logits = jnp.asarray(logs)[n] + jnp.arange(S) * log_ab
    from lda_thesis_tpu.ops.sampling import gumbel_argmax
    for seed in range(10):
        m = np.asarray(gumbel_argmax(jax.random.PRNGKey(seed), logits, axis=2))[0]
        assert m[0] == 0
        assert 1 <= m[1] <= 1
        assert 1 <= m[2] <= 5
        assert 1 <= m[3] <= 12
