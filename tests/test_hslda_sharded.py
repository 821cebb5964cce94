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
