"""Sharded HSLDA blocked-Gibbs tests on the fake 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lda_thesis_tpu.data.encode import binarize_labels, build_labelmap, encode_instances
from lda_thesis_tpu.ops.sampling import stirling_table
from lda_thesis_tpu.parallel import make_mesh
from lda_thesis_tpu.parallel.hslda_sharded import (
    HSLDAShardedState,
    init_hslda_sharded,
    make_hslda_train_step,
    pooled_ph,
    shard_hslda_corpus,
)


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() >= 8
    mesh = make_mesh(n_data=4, n_chains=2)
    rng = np.random.default_rng(0)
    D, V, K, L = 24, 40, 6, 5
    docs = [rng.integers(0, V, size=rng.integers(4, 10)).tolist() for _ in range(D)]
    tok_v, mask = encode_instances(docs)
    labs = np.zeros((D, L), np.float32)
    labs[:, 0] = 1
    for d in range(D):
        labs[d, rng.integers(1, L)] = 1
    tok_v, mask, labs = shard_hslda_corpus(mesh, tok_v, mask, labs)

    key = jax.random.PRNGKey(0)
    state = init_hslda_sharded(key, mesh, tok_v, mask, labs, V, K, n_chains=4)
    logs = np.log(np.where(stirling_table(16) > 0, stirling_table(16), 0))
    step = make_hslda_train_step(
        mesh, 4, jnp.asarray(logs, jnp.float32), D_total=int(tok_v.shape[0]),
    )
    return mesh, state, step, tok_v, mask, labs, V, K


def test_init_invariants(setup):
    _, state, _, tok_v, mask, labs, V, K = setup
    total = int(np.asarray(mask).sum())
    for c in range(4):
        assert int(np.asarray(state.n_dk[c]).sum()) == total
        assert int(np.asarray(state.n_vk[c]).sum()) == total
        np.testing.assert_array_equal(
            np.asarray(state.n_vk[c]).sum(axis=0), np.asarray(state.n_k[c])
        )
    np.testing.assert_allclose(np.asarray(state.beta).sum(axis=1), 1.0, rtol=1e-5)


def test_cycle_preserves_invariants(setup):
    _, state, step, tok_v, mask, labs, V, K = setup
    key = jax.random.PRNGKey(1)
    total = int(np.asarray(mask).sum())
    for i in range(3):
        key, k = jax.random.split(key)
        state = step(k, state, tok_v, mask, labs)
    for c in range(4):
        assert int(np.asarray(state.n_dk[c]).sum()) == total
        assert int(np.asarray(state.n_vk[c]).sum()) == total
        assert (np.asarray(state.n_dk[c]) >= 0).all()
    assert np.isfinite(np.asarray(state.eta)).all()
    np.testing.assert_allclose(np.asarray(state.beta).sum(axis=1), 1.0, rtol=1e-5)
    # a respects label signs on real (non-padded) docs
    a = np.asarray(state.a)
    l = np.asarray(labs)
    real = np.asarray(mask).sum(axis=1) > 0
    for c in range(4):
        assert (a[c][real][l[real] > 0] > 0).all()
        assert (a[c][real][l[real] == 0] < 0).all()
    # chains decorrelated
    assert not np.array_equal(np.asarray(state.z[0]), np.asarray(state.z[1]))


def test_pooled_ph(setup):
    _, state, step, tok_v, mask, labs, V, K = setup
    state = step(jax.random.PRNGKey(2), state, tok_v, mask, labs)
    ph = np.asarray(pooled_ph(state, gamma=1.0))
    assert ph.shape == (K, V)
    np.testing.assert_allclose(ph.sum(axis=1), 1.0, rtol=1e-4)


# --------------------------------------------------------------------------
# vocab-sharded HSLDA tables (round-5 VERDICT item 4)
# --------------------------------------------------------------------------


def _vocab_setup():
    mesh = make_mesh(n_data=4, n_chains=2)
    rng = np.random.default_rng(7)
    D, V, K, L = 24, 42, 6, 5  # V % 4 != 0: exercises vocab padding
    docs = [rng.integers(0, V, size=rng.integers(4, 10)).tolist()
            for _ in range(D)]
    tok_v, mask = encode_instances(docs)
    labs = np.zeros((D, L), np.float32)
    labs[:, 0] = 1
    for d in range(D):
        labs[d, rng.integers(1, L)] = 1
    tok_v, mask, labs = shard_hslda_corpus(mesh, tok_v, mask, labs)
    logs = np.log(np.where(stirling_table(16) > 0, stirling_table(16), 1e-300))
    return mesh, tok_v, mask, labs, jnp.asarray(logs, jnp.float32), D, V, K


def test_vocab_sharded_hslda_matches_replicated():
    """table_shard='vocab' draws the IDENTICAL chains as the replicated
    mode (int32 counts: psum_scatter == psum bitwise; true V*gamma
    denominator threaded through the padded transient view)."""
    from lda_thesis_tpu.parallel.hslda_sharded import make_hslda_train_loop

    mesh, tok_v, mask, labs, logs, D, V, K = _vocab_setup()
    key = jax.random.PRNGKey(3)

    states, phs = {}, {}
    for shard in ("replicated", "vocab"):
        st = init_hslda_sharded(key, mesh, tok_v, mask, labs, V, K,
                                n_chains=4, table_shard=shard)
        loop = make_hslda_train_loop(
            mesh, 4, logs, D_total=D, table_shard=shard, V=V)
        Vp = st.n_vk.shape[1]
        ph0 = jnp.zeros((4, K, Vp), jnp.float32)
        st, ph, s = loop(jax.random.PRNGKey(5), st, tok_v, mask, labs,
                         ph0, jnp.int32(0), jnp.int32(0), iters=4, thinning=2)
        assert int(s) == 2
        states[shard], phs[shard] = st, ph

    rep, voc = states["replicated"], states["vocab"]
    np.testing.assert_array_equal(np.asarray(voc.z), np.asarray(rep.z))
    np.testing.assert_array_equal(np.asarray(voc.n_dk), np.asarray(rep.n_dk))
    np.testing.assert_array_equal(np.asarray(voc.n_vk)[:, :V],
                                  np.asarray(rep.n_vk))
    np.testing.assert_array_equal(np.asarray(voc.n_k), np.asarray(rep.n_k))
    np.testing.assert_array_equal(np.asarray(voc.eta), np.asarray(rep.eta))
    # thinned means agree on real vocab columns; pad columns exactly 0
    np.testing.assert_array_equal(np.asarray(phs["vocab"])[:, :, :V],
                                  np.asarray(phs["replicated"])[:, :, :V])
    assert (np.asarray(phs["vocab"])[:, :, V:] == 0).all()
    # persistent table is genuinely sharded: per-device (C_local, Vp/S, K)
    Vp = voc.n_vk.shape[1]
    shard_shapes = {s.data.shape for s in voc.n_vk.addressable_shards}
    assert shard_shapes == {(2, Vp // 4, K)}


def test_vocab_sharded_hslda_trainer_end_to_end(tmp_path):
    """DistributedHSLDA(table_shard='vocab'): train, predict, and
    kill/resume bit-identically through save/restore_hslda_sharded."""
    from lda_thesis_tpu.parallel import DistributedHSLDA
    from lda_thesis_tpu.parallel.sharded_io import (
        restore_hslda_sharded,
        save_hslda_sharded,
    )

    rng = np.random.default_rng(1)
    vocab = [f"w{i}" for i in range(30)]
    docs = [[vocab[rng.integers(0, 30)] for _ in range(8)] for _ in range(24)]
    labs = [["A"] if d % 2 else ["B"] for d in range(24)]
    labelset = ["A", "B"]
    mesh = make_mesh(n_data=4, n_chains=2)

    def build():
        return DistributedHSLDA(docs, labs, labelset, mesh=mesh, n_chains=4,
                                k=4, seed=3, table_shard="vocab")

    ref = build()
    ref.run_training(it=4, thinning=2, opt=1)
    want = {f: np.asarray(getattr(ref.state, f)) for f in ref.state._fields}
    scores = ref.run_tests(docs[:3], it=4, s=2)
    assert scores.shape == (3, ref.L) and np.isfinite(scores).all()

    m1 = build()
    m1.run_training(it=2, thinning=2, opt=1)
    p = str(tmp_path / "hv")
    save_hslda_sharded(p, m1, iters_done=2)
    m2 = build()
    meta = restore_hslda_sharded(p, m2)
    assert meta["iters_done"] == 2 and meta["table_shard"] == "vocab"
    m2.run_training(it=2, thinning=2, opt=1, continue_avg=True)
    for f, w in want.items():
        np.testing.assert_array_equal(
            np.asarray(getattr(m2.state, f)), w, err_msg=f)
