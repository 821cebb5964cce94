"""LocalLDA unit tests (reference LocalLDA.py:11-130)."""

import numpy as np
import pytest

from lda_thesis_tpu.data.textproc import prep_doc, split_sentences
from lda_thesis_tpu.models.local_lda import LocalLDA

DOCS = [
    "The cat sat on the mat. The dog barked loudly! Cats and dogs are pets.",
    "Stock markets rallied today. Investors bought equities, bonds fell.",
    "The economy grew strongly. Inflation remained low - growth continued.",
    "Dogs chase cats around the garden. The garden has many flowers.",
] * 4


def test_sentence_splitting_not_char_level():
    s = split_sentences("Hello world. Second sentence!")
    assert "Hello world" in s[0]
    # guards against the reference's empty-alternation regex bug
    assert all(len(x) != 1 for x in s if x.strip())


def test_prep_doc_filters():
    # default path lemmatises verbs (reference LocalLDA.py:148: pos='v'),
    # so 'sat' -> 'sit'
    toks = prep_doc("The CAT!! sat, on a mat with numbers 123x ok")
    assert "cat" in toks and "sit" in toks and "mat" in toks
    assert "the" not in toks and "on" not in toks  # stopwords
    assert all(len(t) > 2 for t in toks)
    # raw branch keeps surface forms
    raw = prep_doc("The CAT!! sat, on a mat", lemma=False)
    assert "sat" in raw


def test_train_and_estimators():
    m = LocalLDA(DOCS, alpha=0.5, beta=0.1, K=4, seed=0)
    assert m.D > len(DOCS)  # sentence segmentation multiplied docs
    m.run_training(10, 5)

    ph = m.get_phi()
    th = m.get_theta()
    assert ph.shape == (4, m.V)
    assert th.shape == (m.D, 4)
    np.testing.assert_allclose(ph.sum(axis=1), 1.0, rtol=1e-4)
    np.testing.assert_allclose(th.sum(axis=1), 1.0, rtol=1e-4)
    assert m.ph_hat.shape == (4, m.V)
    np.testing.assert_allclose(m.ph_hat.sum(axis=1), 1.0, rtol=1e-4)

    top = m.print_topwords(5)
    assert len(top) == 4 and all(len(row) == 6 for row in top)
    assert m.perplexity() > 1.0


def test_counts_conserved():
    m = LocalLDA(DOCS, alpha=0.5, beta=0.1, K=4, seed=1)
    total = m.n_tokens
    m.run_training(5, 5)
    n_dk_total = sum(int(np.asarray(x).sum()) for x in m.counts.n_dk)
    assert n_dk_total == total
    assert int(np.asarray(m.counts.n_vk).sum()) == total
    np.testing.assert_array_equal(
        np.asarray(m.counts.n_vk).sum(axis=0), np.asarray(m.counts.n_k)
    )


def test_whole_doc_mode():
    m = LocalLDA(DOCS, alpha=0.5, beta=0.1, K=3, local_lda=False, seed=0)
    assert m.D <= len(DOCS)  # only >1-type docs kept, no sentence explosion
    m.run_training(3, 3)
    assert m.get_theta().shape[1] == 3


def test_dense_sweep_option_still_works():
    m = LocalLDA(DOCS, alpha=0.5, beta=0.1, K=4, seed=0, sweep="dense")
    m.run_training(6, 3)
    np.testing.assert_allclose(m.get_phi().sum(axis=1), 1.0, rtol=1e-4)
    np.testing.assert_allclose(m.get_theta().sum(axis=1), 1.0, rtol=1e-4)


def test_fused_checkpoint_resume_bit_identical(tmp_path):
    """Kill/resume at the fused-kernel merge-block boundary reproduces the
    uninterrupted chain bit-for-bit (chunk-invariant RNG + merge guard)."""
    from lda_thesis_tpu.utils.checkpoint import restore_model, save_model

    # same call sequence as the resumed run (the per-call key split is part
    # of the draw stream, exactly as in the L-LDA resume tests)
    full = LocalLDA(DOCS, alpha=0.5, beta=0.1, K=4, seed=3)
    full.run_training(4, 4, total_iters=8)
    full.run_training(4, 4, total_iters=8)

    part = LocalLDA(DOCS, alpha=0.5, beta=0.1, K=4, seed=3)
    part.run_training(4, 4, total_iters=8)
    save_model(str(tmp_path / "ck"), part, {"iters_done": 4})

    resumed = LocalLDA(DOCS, alpha=0.5, beta=0.1, K=4, seed=3)
    restore_model(str(tmp_path / "ck"), resumed)
    resumed.run_training(4, 4, total_iters=8)

    for a, b in zip(full.counts.z, resumed.counts.z):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(full.counts.n_vk), np.asarray(resumed.counts.n_vk))


def test_fused_vs_dense_same_structure():
    """Both kernels learn on the same corpus; fused perplexity lands in the
    same regime as the exact dense sweep (merge-block approximation)."""
    md = LocalLDA(DOCS, alpha=0.5, beta=0.1, K=4, seed=0, sweep="dense")
    md.run_training(20, 10)
    mf = LocalLDA(DOCS, alpha=0.5, beta=0.1, K=4, seed=0)
    mf.run_training(20, 10)
    pd_, pf = md.perplexity(), mf.perplexity()
    # different draw streams on a 16-doc toy corpus leave real spread
    # (measured: fused 12.5 vs dense 21.3, V=27); both must beat the
    # uniform model and stay within one small multiple of each other —
    # real-corpus quality parity is benchmarks/run_parity.py's job
    assert 1.0 < pf < md.V and 1.0 < pd_ < md.V
    assert pf < 3.0 * pd_ and pd_ < 3.0 * pf
