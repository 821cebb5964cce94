"""Elastic supervisor: fault-injected training resumes from the last
checkpoint and ends bit-identical to an uninterrupted run."""

import numpy as np
import pytest

from lda_thesis_tpu.data.vocab import prune_dict
from lda_thesis_tpu.models.labeled_lda import LabeledLDA
from lda_thesis_tpu.utils.elastic import ElasticGibbs, elastic_train

DOCS = [
    ["alpha", "beta", "gamma", "delta"],
    ["beta", "beta", "epsilon"],
    ["gamma", "delta", "delta", "zeta", "alpha"],
    ["epsilon", "zeta", "alpha"],
    ["delta", "gamma", "beta"],
    ["zeta", "zeta", "epsilon", "alpha"],
] * 3
LABS = [["A"], ["B"], ["A", "C"], ["C"], ["B", "C"], ["A"]] * 3
LABELSET = ["A", "B", "C"]


def _make_model():
    dicti = prune_dict(DOCS, lower=0, upper=1)
    return LabeledLDA(DOCS, LABS, LABELSET, dicti, alpha=0.1, beta=0.01,
                      seed=7, k_pad=8)


def _counts(model):
    return (np.asarray(model.counts.n_vk), np.asarray(model.counts.n_dk[0]))


def test_elastic_restart_bit_identical(tmp_path):
    ckpt = str(tmp_path / "el")

    # uninterrupted oracle: 8 iterations in 4-chunks (the supervisor's own
    # chunking, no faults)
    oracle = elastic_train(_make_model, total_iters=8, thinning=2,
                           checkpoint=str(tmp_path / "oracle"), save_every=4,
                           perplexity=False)

    # faulty run: dies after the first chunk twice, then succeeds
    fails = {"n": 0}
    real_run = ElasticGibbs.run

    def flaky_run(self, total_iters, thinning, save_every=0, **kw):
        real_run(self, min(self.iters + save_every, total_iters),
                 thinning, save_every, **kw)
        if fails["n"] < 2:
            fails["n"] += 1
            raise RuntimeError("injected preemption")
        real_run(self, total_iters, thinning, save_every, **kw)

    seen = []
    ElasticGibbs.run, orig = flaky_run, ElasticGibbs.run
    try:
        model = elastic_train(
            _make_model, total_iters=8, thinning=2, checkpoint=ckpt,
            save_every=4, on_failure=lambda e, a: seen.append(str(e)),
            perplexity=False)
    finally:
        ElasticGibbs.run = orig

    assert fails["n"] == 2 and len(seen) == 2
    for got, want in zip(_counts(model), _counts(oracle)):
        np.testing.assert_array_equal(got, want)
    np.testing.assert_allclose(np.asarray(model.ph_hat),
                               np.asarray(oracle.ph_hat), rtol=1e-6)


def test_elastic_exhausts_restarts(tmp_path):
    def bad_run(self, *a, **kw):
        raise RuntimeError("always down")

    ElasticGibbs.run, orig = bad_run, ElasticGibbs.run
    try:
        with pytest.raises(RuntimeError, match="always down"):
            elastic_train(_make_model, total_iters=4, thinning=2,
                          checkpoint=str(tmp_path / "x"), save_every=2,
                          max_restarts=2)
    finally:
        ElasticGibbs.run = orig


def test_progress_reporting(tmp_path):
    """ElasticGibbs drives utils/tracing.Progress at chunk boundaries."""
    from lda_thesis_tpu.utils.elastic import ElasticGibbs
    from lda_thesis_tpu.utils.tracing import Progress

    model = _make_model()
    lines = []
    prog = Progress(total_iters=4, tokens_per_iter=model.n_tokens,
                    interval=0.0, printer=lines.append)
    eg = ElasticGibbs(model, str(tmp_path / "ck"), resume=False)
    eg.run(4, 2, save_every=2, progress=prog, perplexity=False)
    assert len(lines) == 2  # one report per chunk
    assert "tokens/s" in lines[-1] and "[4/4]" in lines[-1]


def test_resume_first_false_ignores_stale_checkpoint(tmp_path):
    """elastic_train(resume_first=False) must NOT silently adopt a stale
    checkpoint as 'already trained' (round-5 review): the first attempt
    starts fresh and the stale files are cleared so later restart attempts
    cannot resurrect the old chain either."""
    import os

    from lda_thesis_tpu.utils.elastic import elastic_train

    ckpt = str(tmp_path / "stale")
    done = elastic_train(_make_model, total_iters=4, thinning=2,
                         checkpoint=ckpt, save_every=2, perplexity=False)
    stale_nvk = _counts(done)[0].copy()
    os.utime(ckpt + ".json")

    fresh = elastic_train(_make_model, total_iters=8, thinning=2,
                          checkpoint=ckpt, save_every=2,
                          resume_first=False, perplexity=False)
    # a resumed run would have trained 8-4=4 more iters on the stale chain;
    # the fresh one trains all 8 from scratch — same call structure as the
    # supervisor's 2-iter chunks (the per-call key split is part of the
    # draw stream)
    oracle = _make_model()
    for i in range(4):
        oracle.run_training(2, 2, perplexity=False, continue_avg=i > 0,
                            total_iters=8)
    np.testing.assert_array_equal(_counts(fresh)[0],
                                  np.asarray(oracle.counts.n_vk))
    assert not np.array_equal(_counts(fresh)[0], stale_nvk)


def test_progress_primed_on_resume(tmp_path):
    """A resumed ElasticGibbs primes Progress with iters already done, so
    the [done/total] line and final report cover the whole run."""
    from lda_thesis_tpu.utils.elastic import ElasticGibbs

    ckpt = str(tmp_path / "pr")
    eg = ElasticGibbs(_make_model(), ckpt, resume=False)
    eg.run(4, 2, save_every=2, perplexity=False)

    lines = []
    import lda_thesis_tpu.utils.tracing as tracing

    orig = tracing.Progress

    class CapturingProgress(orig):
        def __init__(self, **kw):
            super().__init__(interval=0.0, printer=lines.append,
                             **{k: v for k, v in kw.items()
                                if k not in ("interval", "printer")})

    tracing.Progress = CapturingProgress
    try:
        eg2 = ElasticGibbs(_make_model(), ckpt, resume=True)
        assert eg2.iters == 4
        eg2.run(8, 2, save_every=2, progress=True, perplexity=False)
    finally:
        tracing.Progress = orig
    assert lines and "[8/8]" in lines[-1]  # whole-run totals, not 4/8
