"""DistributedLabeledLDA end-to-end on the fake 8-device mesh."""

import jax
import numpy as np
import pytest

from lda_thesis_tpu.data.vocab import Dictionary
from lda_thesis_tpu.parallel import make_mesh
from lda_thesis_tpu.parallel.trainer import DistributedLabeledLDA

DOCS = [
    "cat dog pet animal fur".split(),
    "dog bark pet tail animal".split(),
    "stock bond market price trade".split(),
    "bond yield market finance price".split(),
    "cat purr whisker pet fur".split(),
    "equity trade finance market price".split(),
] * 6
LABS = [["A"], ["A"], ["B"], ["B"], ["A"], ["B"]] * 6


@pytest.fixture(scope="module")
def model():
    assert jax.device_count() >= 8
    mesh = make_mesh(n_data=4, n_chains=2)
    dicti = Dictionary(DOCS)
    m = DistributedLabeledLDA(
        DOCS, LABS, ["A", "B"], dicti, alpha=0.5, beta=0.1,
        mesh=mesh, n_chains=4, seed=0,
    )
    m.run_training(20, 5)
    return m


def test_pooled_phi_learns_branches(model):
    ph = model.pooled_phi()
    assert ph.shape == (3, model.V)
    np.testing.assert_allclose(ph.sum(axis=1), 1.0, rtol=1e-4)
    w2v = model.dicti.token2id
    a = model.labelmap["A"]
    b = model.labelmap["B"]
    assert ph[a, w2v["cat"]] > ph[a, w2v["market"]]
    assert ph[b, w2v["market"]] > ph[b, w2v["cat"]]


def test_chain_diagnostics(model):
    phis = model.chain_phis()
    assert phis.shape == (4, 3, model.V)
    # chains are decorrelated but agree on the structure
    assert model.mc_error() > 0
    w2v = model.dicti.token2id
    for c in range(4):
        assert phis[c, model.labelmap["A"], w2v["cat"]] > \
               phis[c, model.labelmap["A"], w2v["market"]]


def test_run_test_pooled(model):
    th = model.run_test(
        ["cat dog pet".split(), "stock market price".split()], it=10, thinning=5
    )
    assert th.shape == (2, 3)
    np.testing.assert_allclose(th.sum(axis=1), 1.0, rtol=1e-4)
    assert th[0, model.labelmap["A"]] > th[0, model.labelmap["B"]]
    assert th[1, model.labelmap["B"]] > th[1, model.labelmap["A"]]


def test_dispatch_chunks_align_to_thinning():
    """Internal dispatch chunking (round 4: the tunnelled compiler crashes
    on monolithic multi-thousand-sweep scans) must align to thinning
    boundaries and cover the budget exactly."""
    from lda_thesis_tpu.parallel.trainer import DistributedLabeledLDA

    chunks = list(DistributedLabeledLDA._dispatch_chunks(2000, 10))
    assert sum(chunks) == 2000
    assert set(chunks[:-1]) <= {400}
    assert all(c % 10 == 0 for c in chunks[:-1])
    # trailing unsaved sweeps stay in the final chunk
    assert list(DistributedLabeledLDA._dispatch_chunks(1003, 25)) == [
        400, 400, 203]
    # thinning larger than the limit: one save block per dispatch
    assert list(DistributedLabeledLDA._dispatch_chunks(1000, 500)) == [
        500, 500]


# --------------------------------------------------------------------------
# bucketed chains layout (round 5, parallel/fused_sharded_buckets.py)
# --------------------------------------------------------------------------


def _toy_docs():
    return DOCS, LABS, ["A", "B"]


def _bucketed_build(mesh, docs, labs, labelset, dicti, seed=0):
    return DistributedLabeledLDA(
        docs, labs, labelset, dicti, alpha=0.1, beta=0.01, mesh=mesh,
        n_chains=4, seed=seed, n_buckets=2)


def _varied_docs():
    rng = np.random.default_rng(0)
    vocab = [f"w{i}" for i in range(40)]
    docs, labs = [], []
    for d in range(32):
        lab = ["A"] if d % 2 == 0 else ["B"]
        lo = 0 if lab == ["A"] else 20
        n = 4 if d % 4 < 2 else 14  # two length classes -> 2 real buckets
        docs.append([vocab[lo + rng.integers(0, 20)] for _ in range(n)])
        labs.append(lab)
    return docs, labs, ["A", "B"]


def test_bucketed_chains_trains_and_conserves():
    """n_buckets>1 on the chains trainer: per-bucket sharded layout, count
    conservation across chains/buckets, pooled estimators normalised."""
    from lda_thesis_tpu.data.vocab import Dictionary

    docs, labs, labelset = _varied_docs()
    dicti = Dictionary(docs)
    mesh = make_mesh(n_chains=2, n_data=4)
    m = _bucketed_build(mesh, docs, labs, labelset, dicti)
    assert m.n_buckets == 2 and len(m.state.z) == 2
    total = float(m.n_tokens)
    m.run_training(8, 4)
    n_vk = np.asarray(m.state.n_vk)
    assert n_vk.shape[0] == 4
    for c in range(4):
        assert float(n_vk[c].sum()) == total
    ph = m.pooled_phi()
    np.testing.assert_allclose(ph.sum(axis=1), 1.0, rtol=1e-4)
    th = m.run_test(docs[:4], 4, 2)
    assert th.shape == (4, m.K)


def test_bucketed_chains_resume_bit_identical(tmp_path):
    """Kill/resume of the bucketed chains trainer through
    save_sharded/restore_sharded reproduces the uninterrupted run exactly;
    a bucket-count mismatch raises with the fix-it hint."""
    import pytest as _pytest

    from lda_thesis_tpu.data.vocab import Dictionary
    from lda_thesis_tpu.parallel.sharded_io import (
        restore_sharded,
        save_sharded,
    )

    docs, labs, labelset = _varied_docs()
    dicti = Dictionary(docs)
    mesh = make_mesh(n_chains=2, n_data=4)

    ref = _bucketed_build(mesh, docs, labs, labelset, dicti)
    ref.run_training(8, 4)
    want_z = [np.asarray(z) for z in ref.state.z]
    want_nvk = np.asarray(ref.state.n_vk)

    m1 = _bucketed_build(mesh, docs, labs, labelset, dicti)
    m1.run_training(4, 4, total_iters=8)
    p = str(tmp_path / "bk")
    save_sharded(p, m1, iters_done=4)

    wrong = DistributedLabeledLDA(docs, labs, labelset, dicti, alpha=0.1,
                                  beta=0.01, mesh=mesh, n_chains=4, seed=0)
    with _pytest.raises(ValueError, match="n_buckets=2"):
        restore_sharded(p, wrong)

    m2 = _bucketed_build(mesh, docs, labs, labelset, dicti)
    meta = restore_sharded(p, m2)
    assert meta["n_buckets"] == 2 and meta["iters_done"] == 4
    m2.run_training(4, 4, total_iters=8)
    for g, wz in enumerate(want_z):
        np.testing.assert_array_equal(np.asarray(m2.state.z[g]), wz)
    np.testing.assert_array_equal(np.asarray(m2.state.n_vk), want_nvk)
