"""Vocab-axis-sharded topic-word table (parallel/vocab_sharded.py)."""

import jax
import numpy as np
import pytest

from lda_thesis_tpu.parallel import make_mesh
from lda_thesis_tpu.parallel.vocab_sharded import (
    full_table,
    init_vocab_sharded,
    make_vocab_sharded_block,
    shard_vocab_corpus,
)

D, U, A, K, V = 24, 8, 8, 128, 44


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() >= 8
    mesh = make_mesh(n_chains=1, n_data=8)
    rng = np.random.default_rng(3)
    tok_v = rng.integers(0, V, size=(D, U)).astype(np.int32)
    n_types = rng.integers(2, U + 1, size=(D,))
    tok_f = (np.arange(U)[None, :] < n_types[:, None]).astype(np.int32)
    lab_ids = np.zeros((D, A), np.int32)
    lab_valid = np.zeros((D, A), np.float32)
    for d in range(D):
        ids = np.sort(rng.choice(30, size=rng.integers(2, 5), replace=False))
        lab_ids[d, : len(ids)] = ids
        lab_valid[d, : len(ids)] = 1.0

    state = init_vocab_sharded(
        jax.random.PRNGKey(0), mesh, tok_v, tok_f, lab_ids, lab_valid, V, K)
    corpus = shard_vocab_corpus(
        mesh, tok_v.T, tok_f.T.astype(np.float32), lab_ids,
        lab_valid.T)
    return mesh, state, corpus, float(tok_f.sum())


def test_table_is_vocab_sharded(setup):
    mesh, state, corpus, total = setup
    # persistent table: V axis split over the 8 data shards
    shard_shapes = {s.data.shape for s in state.n_vk.addressable_shards}
    Vp = state.n_vk.shape[0]
    assert shard_shapes == {(Vp // 8, K)}


@pytest.mark.parametrize("M", [1, 3])
def test_block_invariants(setup, M):
    mesh, state, corpus, total = setup
    block = make_vocab_sharded_block(mesh, alpha=0.1, beta=0.01, M=M, V=V)
    for i in range(3):
        state = block(jax.random.PRNGKey(100 + i), state, *corpus)
    n_vk = np.asarray(full_table(state))
    assert float(n_vk.sum()) == total
    assert n_vk.min() >= 0
    np.testing.assert_array_equal(np.asarray(state.n_k), n_vk.sum(axis=0))
    assert float(np.asarray(state.n_dk).sum()) == total


def test_matches_unsharded_fused(setup):
    """Draw-for-draw parity: the vocab-sharded block must equal running the
    unsharded fused sampler per data shard against the same frozen table —
    including the denominator ``V*beta`` with the TRUE (unpadded) V.  The
    test problem has V=44, S=8 → Vp=48, so any padded-V leakage into the
    smoothing constant (ADVICE round 3, medium) changes the draws."""
    import jax.numpy as jnp

    from lda_thesis_tpu.ops.gibbs_fused import FusedLDAState, fused_train_block

    mesh, state, corpus, total = setup
    S = mesh.shape["data"]
    M, beta = 3, 0.01
    key = jax.random.PRNGKey(77)
    block = make_vocab_sharded_block(mesh, alpha=0.1, beta=beta, M=M, V=V)
    out = block(key, state, *corpus)

    # oracle: per-shard unsharded fused block against the frozen padded
    # table, vbeta from the true V; deltas committed once at block end
    z0 = np.asarray(state.z)
    ndk0 = np.asarray(state.n_dk)
    nvk0 = np.asarray(full_table(state))  # (Vp, K)
    nk0 = np.asarray(state.n_k)
    tvt, tft, li, lvt = (np.asarray(c) for c in corpus)
    Dp = z0.shape[1]
    ds = Dp // S
    z1 = np.empty_like(z0)
    ndk1 = np.empty_like(ndk0)
    delta = np.zeros_like(nvk0)
    for s in range(S):
        sl = slice(s * ds, (s + 1) * ds)
        st = FusedLDAState(
            z=jnp.asarray(z0[:, sl]), n_dk=jnp.asarray(ndk0[:, sl]),
            n_vk=jnp.asarray(nvk0), n_k=jnp.asarray(nk0))
        st2 = fused_train_block(
            jax.random.fold_in(key, s), st, jnp.asarray(tvt[:, sl]),
            jnp.asarray(tft[:, sl]), jnp.asarray(li[sl]),
            jnp.asarray(lvt[:, sl]), 0.1, beta, M, vbeta=V * beta)
        z1[:, sl] = np.asarray(st2.z)
        ndk1[:, sl] = np.asarray(st2.n_dk)
        delta += np.asarray(st2.n_vk) - nvk0

    np.testing.assert_array_equal(np.asarray(out.z), z1)
    np.testing.assert_array_equal(np.asarray(out.n_dk), ndk1)
    np.testing.assert_allclose(np.asarray(full_table(out)), nvk0 + delta,
                               atol=1e-4)


def test_learns_structure(setup):
    """Sharded-table training concentrates words on co-occurring labels."""
    mesh, state, corpus, total = setup
    block = make_vocab_sharded_block(mesh, alpha=0.1, beta=0.01, M=2, V=V)
    for i in range(10):
        state = block(jax.random.PRNGKey(i), state, *corpus)
    n_vk = np.asarray(full_table(state))
    # mass only on topics that appear in some document's label set
    lab_ids = np.asarray(corpus[2])
    lab_valid_t = np.asarray(corpus[3])
    allowed = np.zeros(K, bool)
    for d in range(lab_ids.shape[0]):
        allowed[lab_ids[d][lab_valid_t[:, d] > 0]] = True
    assert n_vk[:, ~allowed].sum() == 0


def test_train_loop_thinned_means_and_sharding(setup):
    """Whole-run vocab-sharded training loop: thinned φ̂/θ̂ means match a
    manual block-by-block oracle, and every V-sized array in the train
    state (including the means) stays vocab- or doc-sharded."""
    import jax.numpy as jnp

    from lda_thesis_tpu.parallel.vocab_sharded import (
        init_vocab_sharded_train,
        make_vocab_sharded_block,
        make_vocab_sharded_train_loop,
    )

    mesh, _, corpus, total = setup
    rng = np.random.default_rng(3)
    tok_v = rng.integers(0, V, size=(D, U)).astype(np.int32)
    n_types = rng.integers(2, U + 1, size=(D,))
    tok_f = (np.arange(U)[None, :] < n_types[:, None]).astype(np.int32)
    lab_ids = np.asarray(corpus[2])[:D]
    lab_valid_t = np.asarray(corpus[3])[:, :D]
    state = init_vocab_sharded_train(
        jax.random.PRNGKey(0), mesh, tok_v, tok_f, lab_ids,
        lab_valid_t.T, V, K)

    # sharded persistent state: table AND ph_hat split V/S per device
    Vp = state.n_vk.shape[0]
    assert {s.data.shape for s in state.ph_hat.addressable_shards} == {
        (Vp // 8, K)}

    alpha, beta, M = 0.1, 0.01, 2
    loop = make_vocab_sharded_train_loop(
        mesh, alpha, beta, V, K, topic_mask=None, corpus=corpus)
    key = jax.random.PRNGKey(11)
    out = loop(key, state, jnp.int32(0), iters=4, thinning=2, M=M)
    assert int(out.s) == 2

    # oracle: drive the public block API with the same chunk-invariant keys
    block = make_vocab_sharded_block(mesh, alpha=alpha, beta=beta, M=M, V=V)
    from lda_thesis_tpu.parallel.vocab_sharded import VocabShardedState
    st = VocabShardedState(state.z, state.n_dk, state.n_vk, state.n_k)
    ph_hat = np.zeros((Vp, K), np.float32)
    th_hat = None
    for save_i in range(2):
        st = block(jax.random.fold_in(key, save_i * M), st, *corpus)
        n_vk = np.asarray(st.n_vk)
        n_k = np.asarray(st.n_k)
        cur_ph = (n_vk + beta) / (n_k + V * beta)
        s = save_i + 1
        ph_hat = (s - 1) / s * ph_hat + cur_ph / s
    np.testing.assert_allclose(np.asarray(out.ph_hat), ph_hat, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.n_vk), np.asarray(st.n_vk))
    np.testing.assert_array_equal(np.asarray(out.z), np.asarray(st.z))


def _toy_docs():
    rng = np.random.default_rng(0)
    vocab = [f"w{i}" for i in range(40)]
    docs, labs = [], []
    for d in range(24):
        lab = ["A"] if d % 2 == 0 else ["B"]
        lo = 0 if lab == ["A"] else 20
        docs.append([vocab[lo + rng.integers(0, 20)] for _ in range(12)])
        labs.append(lab)
    return docs, labs, ["root", "A", "B"]


def test_distributed_trainer_vocab_mode(tmp_path):
    """DistributedLabeledLDA(table_shard='vocab'): trains end-to-end over
    the data mesh, learns label structure, and kill/resume through
    save_sharded/restore_sharded is bit-identical."""
    from lda_thesis_tpu.data.vocab import Dictionary
    from lda_thesis_tpu.parallel import make_mesh
    from lda_thesis_tpu.parallel.sharded_io import (
        restore_sharded,
        save_sharded,
    )
    from lda_thesis_tpu.parallel.trainer import DistributedLabeledLDA

    docs, labs, labelset = _toy_docs()
    dicti = Dictionary(docs)
    mesh = make_mesh(n_chains=1, n_data=8)

    def build():
        return DistributedLabeledLDA(
            docs, labs, labelset, dicti, alpha=0.1, beta=0.01,
            mesh=mesh, n_chains=1, seed=0, table_shard="vocab")

    ref = build()
    ref.run_training(8, 4)
    want = {f: np.asarray(getattr(ref.state, f)) for f in ref.state._fields}

    m1 = build()
    m1.run_training(4, 4, total_iters=8)
    path = str(tmp_path / "vckpt")
    save_sharded(path, m1, iters_done=4)
    del m1
    m2 = build()
    meta = restore_sharded(path, m2)
    assert meta["iters_done"] == 4 and meta["table_shard"] == "vocab"
    m2.run_training(4, 4, total_iters=8)
    for f, w in want.items():
        np.testing.assert_array_equal(
            np.asarray(getattr(m2.state, f)), w, err_msg=f)

    # quality smoke: A-branch words put mass on topic A, not B
    ph = ref.pooled_phi()  # (K, V)
    a_cols = [dicti.token2id[w] for w in dicti.token2id if int(w[1:]) < 20]
    k_a, k_b = labelset.index("A"), labelset.index("B")
    assert ph[k_a, a_cols].sum() > ph[k_b, a_cols].sum()
    th = ref.run_test(docs[:4], 10, 5)
    assert th.shape == (4, 3)


# --------------------------------------------------------------------------
# chains × vocab composition (round-5 VERDICT item 4)
# --------------------------------------------------------------------------


def _build_chains(table_shard, mesh, docs, labs, labelset, dicti, seed=0):
    from lda_thesis_tpu.parallel.trainer import DistributedLabeledLDA

    return DistributedLabeledLDA(
        docs, labs, labelset, dicti, alpha=0.1, beta=0.01, mesh=mesh,
        n_chains=4, seed=seed, table_shard=table_shard)


def test_chains_vocab_matches_replicated():
    """chains×vocab draws the IDENTICAL chains as chains×replicated on the
    same (2, 4) mesh: same corpus layout, same per-(chain, shard) keys, and
    integer-valued counts make psum_scatter == psum bitwise."""
    from lda_thesis_tpu.data.vocab import Dictionary
    from lda_thesis_tpu.parallel import make_mesh

    docs, labs, labelset = _toy_docs()
    dicti = Dictionary(docs)
    mesh = make_mesh(n_chains=2, n_data=4)

    rep = _build_chains("replicated", mesh, docs, labs, labelset, dicti)
    voc = _build_chains("vocab", mesh, docs, labs, labelset, dicti)
    rep.run_training(8, 4)
    voc.run_training(8, 4)

    Vn = rep.V
    np.testing.assert_array_equal(np.asarray(voc.state.z),
                                  np.asarray(rep.state.z))
    np.testing.assert_array_equal(np.asarray(voc.state.n_dk),
                                  np.asarray(rep.state.n_dk))
    np.testing.assert_array_equal(np.asarray(voc.state.n_vk)[:, :Vn],
                                  np.asarray(rep.state.n_vk))
    np.testing.assert_array_equal(np.asarray(voc.state.n_k),
                                  np.asarray(rep.state.n_k))
    # per-device persistent table shard = (C_local, Vp/S, K)
    Vp = voc.state.n_vk.shape[1]
    shard_shapes = {s.data.shape for s in voc.state.n_vk.addressable_shards}
    assert shard_shapes == {(4 // 2, Vp // 4, voc.Kp)}
    # pooled estimators agree to fp tolerance (different reduce orders)
    np.testing.assert_allclose(voc.pooled_phi(), rep.pooled_phi(),
                               rtol=1e-5, atol=1e-7)
    assert voc.mc_error() > 0
    assert voc.chain_phis().shape == (4, voc.K, Vn)


def test_chains_vocab_resume_bit_identical(tmp_path):
    """Kill/resume of the chains×vocab trainer through
    save_sharded/restore_sharded reproduces the uninterrupted run exactly."""
    from lda_thesis_tpu.data.vocab import Dictionary
    from lda_thesis_tpu.parallel import make_mesh
    from lda_thesis_tpu.parallel.sharded_io import (
        restore_sharded,
        save_sharded,
    )

    docs, labs, labelset = _toy_docs()
    dicti = Dictionary(docs)
    mesh = make_mesh(n_chains=2, n_data=4)

    ref = _build_chains("vocab", mesh, docs, labs, labelset, dicti)
    ref.run_training(8, 4)
    want = {f: np.asarray(getattr(ref.state, f)) for f in ref.state._fields}

    m1 = _build_chains("vocab", mesh, docs, labs, labelset, dicti)
    m1.run_training(4, 4, total_iters=8)
    path = str(tmp_path / "cvckpt")
    save_sharded(path, m1, iters_done=4)
    m2 = _build_chains("vocab", mesh, docs, labs, labelset, dicti)
    meta = restore_sharded(path, m2)
    assert meta["iters_done"] == 4 and meta["table_shard"] == "vocab"
    m2.run_training(4, 4, total_iters=8)
    for f, w in want.items():
        np.testing.assert_array_equal(
            np.asarray(getattr(m2.state, f)), w, err_msg=f)
    # per-chain fold-in works in chains×vocab mode
    th = m2.run_test(docs[:4], 4, 2, chain=1)
    assert th.shape == (4, 3)
