"""DistributedHSLDA: multi-chain sharded training + chain-averaged testing."""

import jax
import numpy as np
import pytest

from lda_thesis_tpu.parallel import DistributedHSLDA, make_mesh

DOCS = [
    ["market", "price", "trade", "price"],
    ["labor", "wage", "firm"],
    ["growth", "policy", "market", "tax", "trade"],
    ["wage", "firm", "labor", "labor"],
    ["tax", "policy", "growth"],
    ["price", "market", "demand", "supply"],
    ["credit", "risk", "banking"],
    ["banking", "credit", "tax"],
] * 2
LABS = [["A1"], ["B1"], ["A1", "C1"], ["B1"], ["C1"], ["A1"], ["D1"], ["D1", "C1"]] * 2
LABELSET = ["A", "A1", "B", "B1", "C", "C1", "D", "D1"]


@pytest.fixture(scope="module")
def model():
    assert jax.device_count() >= 8
    mesh = make_mesh(n_chains=2, n_data=4, devices=jax.devices()[:8])
    m = DistributedHSLDA(DOCS, LABS, LABELSET, mesh=mesh, n_chains=4,
                         k=4, seed=0)
    m.run_training(it=4, thinning=2, opt=1)
    return m


def test_training_count_invariants(model):
    n_vk = np.asarray(model.state.n_vk)  # (C, V, K)
    assert n_vk.shape[0] == 4
    total = int(np.asarray(model.mask).sum())
    per_chain = n_vk.sum(axis=(1, 2))
    assert (per_chain == total).all(), (per_chain, total)
    assert (n_vk >= 0).all()
    # n_k consistent with the merged table
    np.testing.assert_array_equal(
        np.asarray(model.state.n_k), n_vk.sum(axis=1)
    )


def test_thinned_ph_hat(model):
    assert model._ph_hat is not None and model._ph_hat.shape == (4, 4, model.V)
    np.testing.assert_allclose(model._ph_hat.sum(axis=2), 1.0, rtol=1e-5)


def test_chain_averaged_prediction(model):
    scores = model.run_tests([["market", "price"], ["labor", "wage", "wage"]],
                             it=8, s=4)
    assert scores.shape == (2, model.L)
    assert (scores >= 0).all() and (scores <= 1).all()
    # positive labels should outrank an unrelated label for doc 0
    # ("market price" is A1-labelled; D1 never co-occurs with its words)
    i_a1 = model.labelmap["A1"]
    i_d1 = model.labelmap["D1"]
    assert scores[0, i_a1] > scores[0, i_d1], (scores[0, i_a1], scores[0, i_d1])
    assert np.isfinite(scores).all()


def test_diagnostics_read_trained_state(model):
    """get_ph/get_zbar/display_topics reflect the sharded training, not the
    untrained single-chain state initialised by HSLDA.__init__."""
    ph = model.get_ph()
    assert ph.shape == (model.K, model.V)
    np.testing.assert_allclose(ph, model._chain_ph()[0])
    zbar = model.get_zbar()
    assert zbar.shape == (model.D, model.K)
    # row sums of chain-0 z̄ are 1 for non-empty docs
    np.testing.assert_allclose(zbar.sum(axis=1), 1.0, rtol=1e-5)
    topics = model.display_topics(n=3)
    assert len(topics) == model.K and all(len(t) == 3 for t in topics)


def test_pickle_roundtrip(model):
    """A trained DistributedHSLDA pickles (mesh/device buffers stripped) and
    the restored model still predicts."""
    import pickle

    blob = pickle.dumps(model)
    m2 = pickle.loads(blob)
    assert isinstance(np.asarray(m2.state.n_vk), np.ndarray)
    np.testing.assert_array_equal(
        np.asarray(m2.state.n_vk), np.asarray(model.state.n_vk)
    )
    np.testing.assert_allclose(m2.get_ph(), model.get_ph())
    s = m2.run_tests([["market", "price"]], it=4, s=2)
    assert s.shape == (1, m2.L) and np.isfinite(s).all()


def test_thinned_average_resets_per_call(model):
    """A second run_training call restarts the thinned φ̂ mean (base-class
    semantics) instead of continuing the previous call's average."""
    before = model._n_saves
    assert before >= 1
    model.run_training(it=2, thinning=2, opt=1)
    assert model._n_saves == 1


def test_api_matches_single_chain():
    """Same constructor surface as HSLDA; single mesh row, one chain."""
    mesh = make_mesh(n_chains=1, n_data=1, devices=jax.devices()[:1])
    m = DistributedHSLDA(DOCS, LABS, LABELSET, mesh=mesh, n_chains=1,
                         k=3, seed=1)
    m.run_training(it=2, thinning=2, opt=2)
    s = m.run_tests([["market", "tax"]], it=4, s=2)
    assert s.shape == (1, m.L) and np.isfinite(s).all()


def test_internal_chunking_equals_single_dispatch():
    """run_training auto-chunks dispatches (round 4: the tunnelled compiler
    crashes on monolithic multi-cycle scans).  The chunked result must be
    bit-identical to driving the whole-run loop in ONE dispatch with the
    same master key and counters."""
    import jax.numpy as jnp

    from lda_thesis_tpu.parallel.hslda_sharded import make_hslda_train_loop

    mesh = make_mesh(n_chains=2, n_data=4, devices=jax.devices()[:8])
    it, thinning = 25, 5  # chunks internally as 10 + 10 + 5

    m = DistributedHSLDA(DOCS, LABS, LABELSET, mesh=mesh, n_chains=4,
                         k=4, seed=3)
    m.run_training(it=it, thinning=thinning, opt=1)

    ref = DistributedHSLDA(DOCS, LABS, LABELSET, mesh=mesh, n_chains=4,
                           k=3 + 1, seed=3)
    # initialise the same way, then run the loop once, undispatched
    ref.run_training(it=0, thinning=thinning, opt=1)  # builds state + loop
    loop = make_hslda_train_loop(
        mesh, 4, ref._stirling_logs, D_total=ref.D, alpha=ref.alpha,
        aprime=ref.aprime, gamma=ref.gamma, mu=ref.mu, sigma=ref.sigma,
        xi=ref.xi, opt=1)
    C, K, V = 4, ref.K, ref.V
    state, ph_hat, n_saves = loop(
        ref._master_key, ref.state, ref._sh_tok_v, ref._sh_mask,
        ref._sh_labs, jnp.zeros((C, K, V), jnp.float32), jnp.int32(0),
        jnp.int32(0), iters=it, thinning=thinning)

    for f in m.state._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(m.state, f)), np.asarray(getattr(state, f)),
            err_msg=f)
    np.testing.assert_allclose(m._ph_hat, np.asarray(ph_hat), rtol=1e-6)
    assert m._n_saves == int(n_saves) == it // thinning
