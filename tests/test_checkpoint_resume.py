"""Chunked checkpoint/resume: interrupted training is bit-identical to
uninterrupted (VERDICT r1 item 5 acceptance: kill a mid-run training,
resume, get identical final counts)."""

import numpy as np
import pytest

from lda_thesis_tpu.data.vocab import prune_dict
from lda_thesis_tpu.models.labeled_lda import LabeledLDA
from lda_thesis_tpu.utils.checkpoint import restore_model, save_model

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


def _model(seed=7, **kw):
    dicti = prune_dict(DOCS, lower=0, upper=1)
    return LabeledLDA(DOCS, LABS, LABELSET, dicti, alpha=0.1, beta=0.01,
                      seed=seed, k_pad=8, **kw)


def _chunked_train(model, total, chunk, thinning, ckpt=None):
    done = 0
    while done < total:
        step = min(chunk, total - done)
        model.run_training(step, thinning, perplexity=False,
                           continue_avg=done > 0)
        done += step
        if ckpt:
            save_model(ckpt, model, extra_meta={"iters_done": done})
    return model


def test_resume_bit_identical_strict(tmp_path):
    ckpt = str(tmp_path / "ck")

    ref = _model()
    ref.run_training(4, 2, perplexity=False)
    ref.run_training(4, 2, perplexity=False, continue_avg=True)

    m1 = _model()
    m1.run_training(4, 2, perplexity=False)
    save_model(ckpt, m1, extra_meta={"iters_done": 4})

    m2 = _model()
    meta = restore_model(ckpt, m2)
    assert meta["iters_done"] == 4
    assert m2._avg_s == 2  # 4 iters at thinning 2 -> two saves folded in
    m2.run_training(4, 2, perplexity=False, continue_avg=True)

    for g in range(len(ref.counts.z)):
        np.testing.assert_array_equal(
            np.asarray(ref.counts.z[g]), np.asarray(m2.counts.z[g])
        )
        np.testing.assert_array_equal(
            np.asarray(ref.counts.n_dk[g]), np.asarray(m2.counts.n_dk[g])
        )
    np.testing.assert_array_equal(
        np.asarray(ref.counts.n_vk), np.asarray(m2.counts.n_vk)
    )
    np.testing.assert_array_equal(np.asarray(ref.ph_hat), np.asarray(m2.ph_hat))
    np.testing.assert_array_equal(ref.th_hat, m2.th_hat)
    assert ref._avg_s == m2._avg_s


def test_cli_checkpoint_flow(tmp_path):
    """Drive the CLI's _train_gibbs chunk loop directly: save-every chunks +
    resume mid-run reproduce the uninterrupted chunked run exactly."""
    from types import SimpleNamespace

    from lda_thesis_tpu.cli.evaluate_labeled_lda import _train_gibbs, make_config

    class Corpus(SimpleNamespace):
        pass

    train = Corpus(docs=DOCS, labs=LABS, labelset=LABELSET)

    def opts(**kw):
        base = dict(file="x", lvl=1, it=8, thinning=2, lower=0.0, upper=1.0,
                    alpha=0.1, beta=0.01, pickle=False, seed=7,
                    no_perplexity=True, engine="gibbs", sweep="auto",
                    checkpoint=None,
                    save_every=4, resume=False, n_chains=1, n_data=1)
        base.update(kw)
        return SimpleNamespace(**base)

    o_ref = opts()
    ref = _train_gibbs(make_config(o_ref), o_ref, train)

    # "killed" run: only 4 iterations, checkpointed
    o_half = opts(it=4, checkpoint=str(tmp_path / "c"))
    _train_gibbs(make_config(o_half), o_half, train)
    # resumed run picks up at 4 and finishes 8
    o_res = opts(checkpoint=str(tmp_path / "c"), resume=True)
    res = _train_gibbs(make_config(o_res), o_res, train)

    np.testing.assert_array_equal(
        np.asarray(ref.counts.n_vk), np.asarray(res.counts.n_vk)
    )
    np.testing.assert_array_equal(np.asarray(ref.ph_hat), np.asarray(res.ph_hat))
    np.testing.assert_array_equal(ref.th_hat, res.th_hat)


def test_fused_merge_block_mismatch_raises(tmp_path):
    """Round-4 ADVICE: a resumed fused run that recomputes a different
    merge-block M than the checkpointed run must raise, not silently draw
    a different chain.  M is budget-dependent (select_merge_block caps it
    at budget//8), so resuming WITHOUT total_iters after a chunked run
    that used a large total is exactly the silent-mismatch case."""
    import pytest

    from lda_thesis_tpu.data.corpus import load_corpus, split_data  # noqa: F401
    from lda_thesis_tpu.data.vocab import Dictionary
    from lda_thesis_tpu.models.labeled_lda import LabeledLDA
    from lda_thesis_tpu.utils.checkpoint import restore_model, save_model

    docs = [f"w{i} w{(i+1) % 7} w{(i+2) % 7}".split() for i in range(12)]
    labs = [["A"] if i % 2 else ["B"] for i in range(12)]
    dicti = Dictionary(docs)

    def build():
        return LabeledLDA(docs, labs, ["A", "B"], dicti, alpha=0.1,
                          beta=0.01, seed=0, sweep="fused")

    m1 = build()
    # chunk 1 of a planned 80-sweep run: M = select(5, 10, 80) = 5
    m1.run_training(10, 10, total_iters=80, perplexity=False)
    path = str(tmp_path / "ck")
    save_model(path, m1, extra_meta={"iters_done": 10})

    m2 = build()
    restore_model(path, m2)
    with pytest.raises(ValueError, match="merge-block mismatch"):
        # no total_iters → budget=10 → M=1 ≠ checkpointed 5
        m2.run_training(10, 10, perplexity=False)
    # correct resume passes the original total
    m2.run_training(10, 10, total_iters=80, perplexity=False)
