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
