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
