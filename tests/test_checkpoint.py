"""Checkpoint/resume round-trip tests (reference has no load path — C21)."""

import numpy as np
import pytest

from lda_thesis_tpu.data.vocab import Dictionary
from lda_thesis_tpu.models.hslda import HSLDA
from lda_thesis_tpu.models.labeled_lda import LabeledLDA
from lda_thesis_tpu.utils.checkpoint import (
    load_checkpoint,
    restore_model,
    save_checkpoint,
    save_model,
)
from lda_thesis_tpu.utils.config import GibbsConfig, RunConfig

DOCS = [
    "cat dog pet animal".split(),
    "stock bond market price".split(),
    "dog bark pet tail".split(),
    "bond yield market trade".split(),
] * 3
LABS = [["A"], ["B"], ["A"], ["B"]] * 3


def test_raw_checkpoint_roundtrip(tmp_path):
    p = str(tmp_path / "ckpt")
    arrays = {"x": np.arange(6).reshape(2, 3), "y": np.float32(2.5)}
    meta = {"kind": "test", "alpha": 0.1}
    save_checkpoint(p, arrays, meta)
    a2, m2 = load_checkpoint(p)
    np.testing.assert_array_equal(a2["x"], arrays["x"])
    assert m2 == meta


def test_labeled_lda_resume_exact(tmp_path):
    """Resuming mid-training must continue the exact RNG stream."""
    dicti = Dictionary(DOCS)
    p = str(tmp_path / "m")

    m1 = LabeledLDA(DOCS, LABS, ["A", "B"], dicti, 0.1, 0.01, seed=7)
    m1.run_training(4, 2, perplexity=False)
    save_model(p, m1)
    m1.run_training(4, 2, perplexity=False)  # 8 total

    m2 = LabeledLDA(DOCS, LABS, ["A", "B"], dicti, 0.1, 0.01, seed=999)
    restore_model(p, m2)
    m2.run_training(4, 2, perplexity=False)  # resumed 4 + 4

    np.testing.assert_array_equal(np.asarray(m1.counts.z), np.asarray(m2.counts.z))
    np.testing.assert_allclose(
        np.asarray(m1.counts.n_vk), np.asarray(m2.counts.n_vk)
    )


def test_labeled_lda_shape_mismatch_rejected(tmp_path):
    dicti = Dictionary(DOCS)
    p = str(tmp_path / "m")
    m1 = LabeledLDA(DOCS, LABS, ["A", "B"], dicti, 0.1, 0.01, seed=0)
    save_model(p, m1)
    other = LabeledLDA(DOCS[:4], LABS[:4], ["A", "B"], Dictionary(DOCS[:4]),
                       0.1, 0.01, seed=0)
    with pytest.raises(ValueError):
        restore_model(p, other)


def test_hslda_roundtrip(tmp_path):
    p = str(tmp_path / "h")
    m1 = HSLDA(DOCS, LABS, ["A", "B"], k=4, seed=3)
    m1.run_training(it=2, thinning=2)
    save_model(p, m1)
    m2 = HSLDA(DOCS, LABS, ["A", "B"], k=4, seed=99)
    restore_model(p, m2)
    np.testing.assert_allclose(np.asarray(m1.eta), np.asarray(m2.eta))
    np.testing.assert_allclose(np.asarray(m1.beta), np.asarray(m2.beta))
    np.testing.assert_array_equal(np.asarray(m1.counts.z), np.asarray(m2.counts.z))


def test_config_defaults_and_validation():
    g = GibbsConfig(iters=40)
    assert g.thinning == 40  # reference thinning==0 rule
    r = RunConfig(file="x.csv", gibbs=GibbsConfig(iters=10, thinning=5))
    assert r.test_iters == 10 and r.test_thinning == 5
    with pytest.raises(ValueError):
        GibbsConfig(iters=0)
    with pytest.raises(ValueError):
        RunConfig(label_mode="bogus")
    with pytest.raises(ValueError):
        GibbsConfig(alpha=-1)


def test_hslda_chunked_resume_bit_identical(tmp_path):
    """Single-chain HSLDA whole-run loop (round-5 VERDICT item 3): the
    chunk-invariant cycle RNG makes a save/restore/continue run reproduce
    ONE uninterrupted call bit-for-bit — counts, η, and the in-jit thinned
    means included."""
    p = str(tmp_path / "h")
    full = HSLDA(DOCS, LABS, ["A", "B"], k=4, seed=3)
    full.run_training(it=8, thinning=2, opt=1)

    part = HSLDA(DOCS, LABS, ["A", "B"], k=4, seed=3)
    part.run_training(it=4, thinning=2, opt=1)
    save_model(p, part, {"iters_done": 4})

    resumed = HSLDA(DOCS, LABS, ["A", "B"], k=4, seed=99)
    meta = restore_model(p, resumed)
    assert meta["iters_done"] == 4 and meta["cycles_done"] == 4
    resumed.run_training(it=4, thinning=2, opt=1, continue_avg=True)

    np.testing.assert_array_equal(
        np.asarray(full.counts.z), np.asarray(resumed.counts.z))
    np.testing.assert_array_equal(
        np.asarray(full.counts.n_vk), np.asarray(resumed.counts.n_vk))
    np.testing.assert_array_equal(
        np.asarray(full.eta), np.asarray(resumed.eta))
    np.testing.assert_array_equal(np.asarray(full.ph), np.asarray(resumed.ph))
    np.testing.assert_array_equal(np.asarray(full.th), np.asarray(resumed.th))
