"""Sharded AD-LDA parity tests on a fake 8-device CPU mesh (SURVEY.md C24)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lda_thesis_tpu.ops.gibbs import LDACounts, init_counts, train_sweep
from lda_thesis_tpu.parallel import (
    ShardedLDAState,
    make_mesh,
    make_sharded_train_step,
    pooled_phi,
    shard_corpus,
)
from lda_thesis_tpu.parallel.sharded import init_sharded_state


def _toy(D=24, U=8, V=32, K=8, seed=0):
    rng = np.random.default_rng(seed)
    tok_v = rng.integers(0, V, size=(D, U)).astype(np.int32)
    tok_f = rng.integers(1, 4, size=(D, U)).astype(np.int32)
    tok_f[:, U - 2 :] = 0  # padding slots
    labs = (rng.random((D, K)) < 0.4).astype(np.float32)
    labs[:, 0] = 1.0
    return tok_v, tok_f, labs


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must fake 8 CPU devices"
    return make_mesh(n_data=4, n_chains=2)


def test_invariants_after_sharded_sweeps(mesh):
    tok_v, tok_f, labs = _toy()
    V, K, C = 32, 8, 2
    tok_v, tok_f, labs = shard_corpus(mesh, tok_v, tok_f, labs)
    key = jax.random.PRNGKey(0)
    state = init_sharded_state(key, mesh, tok_v, tok_f, labs, V, n_chains=C)
    step = make_sharded_train_step(mesh, C, alpha=0.1, beta=0.01)

    total_f = int(np.asarray(tok_f).sum())
    for i in range(3):
        key, k = jax.random.split(key)
        state = step(k, state, tok_v, tok_f, labs, save=jnp.bool_(i == 2))

    n_dk = np.asarray(state.n_dk)
    n_vk = np.asarray(state.n_vk)
    n_k = np.asarray(state.n_k)
    for c in range(C):
        # count conservation per chain (the reference's runtime guards,
        # LabeledLDA.py:146-153, promoted to tests)
        assert n_dk[c].sum() == total_f
        assert n_vk[c].sum() == total_f
        np.testing.assert_array_equal(n_vk[c].sum(axis=0), n_k[c])
        assert (n_dk[c] >= 0).all() and (n_vk[c] >= 0).all()
    # chains decorrelated: distinct states with overwhelming probability
    assert not np.array_equal(np.asarray(state.z)[0], np.asarray(state.z)[1])
    # label-mask constraint: z only on admissible topics
    z = np.asarray(state.z)
    labs_np = np.asarray(labs)
    f = np.asarray(tok_f)
    for c in range(C):
        picked = labs_np[np.arange(z.shape[1])[:, None], z[c]]
        assert (picked[f > 0] > 0).all()


def test_one_data_shard_is_exactly_serial():
    """AD-LDA degenerates to the exact serial sampler at 1 data shard: a
    (1, 1) mesh with aligned RNG folding must reproduce `train_sweep`
    bit-for-bit (the scheme's correctness anchor — staleness only enters
    with >1 shard)."""
    mesh1 = make_mesh(n_data=1, n_chains=1, devices=jax.devices()[:1])
    tok_v, tok_f, labs = _toy(D=24, U=8, V=16, K=4, seed=5)
    V = 16
    tv, tf, lb = shard_corpus(mesh1, tok_v, tok_f, labs)
    key = jax.random.PRNGKey(11)
    state = init_sharded_state(key, mesh1, tv, tf, lb, V, n_chains=1)
    step = make_sharded_train_step(mesh1, 1, alpha=0.5, beta=0.1)

    # serial oracle with the sharded path's RNG folding (chain 0, shard 0)
    k0 = jax.random.fold_in(jax.random.fold_in(key, 0), 0)
    counts = init_counts(k0, jnp.asarray(tok_v), jnp.asarray(tok_f),
                         jnp.asarray(labs), V)

    for i in range(5):
        key, k = jax.random.split(key)
        state = step(k, state, tv, tf, lb, save=jnp.bool_(False))
        ks = jax.random.fold_in(jax.random.fold_in(k, 0), 0)
        counts = train_sweep(ks, counts, jnp.asarray(tok_v),
                             jnp.asarray(tok_f), jnp.asarray(labs), 0.5, 0.1)

    np.testing.assert_array_equal(np.asarray(state.z)[0], np.asarray(counts.z))
    np.testing.assert_array_equal(np.asarray(state.n_dk)[0], np.asarray(counts.n_dk))
    np.testing.assert_array_equal(np.asarray(state.n_vk)[0], np.asarray(counts.n_vk))
    np.testing.assert_array_equal(np.asarray(state.n_k)[0], np.asarray(counts.n_k))


def test_sharded_matches_single_device_distribution(mesh):
    """AD-LDA with 4 data shards: the stationary statistics must stay close
    to the serial sampler (exactness at 1 shard is proven above)."""
    tok_v, tok_f, labs = _toy(D=24, U=8, V=16, K=4, seed=1)
    V, K = 16, 4
    tv, tf, lb = shard_corpus(mesh, tok_v, tok_f, labs)
    key = jax.random.PRNGKey(7)
    state = init_sharded_state(key, mesh, tv, tf, lb, V, n_chains=2)
    step = make_sharded_train_step(mesh, 2, alpha=0.5, beta=0.1)
    for i in range(20):
        key, k = jax.random.split(key)
        state = step(k, state, tv, tf, lb, save=jnp.bool_(i >= 10))

    # serial oracle chain
    key2 = jax.random.PRNGKey(3)
    counts = init_counts(key2, jnp.asarray(tok_v), jnp.asarray(tok_f), jnp.asarray(labs), V)
    phs = []
    for i in range(20):
        key2, k = jax.random.split(key2)
        counts = train_sweep(k, counts, jnp.asarray(tok_v), jnp.asarray(tok_f),
                             jnp.asarray(labs), 0.5, 0.1)
        if i >= 10:
            ph = (counts.n_vk + 0.1) / (counts.n_k + V * 0.1)
            phs.append(np.asarray(ph))
    ph_serial = np.mean(phs, axis=0)
    ph_sharded = np.asarray(pooled_phi(state))
    # same model, same data -> posterior means agree loosely (MC noise on a
    # tiny corpus; this guards against gross divergence, not exact equality)
    assert np.abs(ph_serial - ph_sharded).mean() < 0.08


def test_pooled_phi_shape_and_normalisation(mesh):
    tok_v, tok_f, labs = _toy(D=16, U=8, V=16, K=4, seed=2)
    tv, tf, lb = shard_corpus(mesh, tok_v, tok_f, labs)
    key = jax.random.PRNGKey(0)
    state = init_sharded_state(key, mesh, tv, tf, lb, 16, n_chains=2)
    step = make_sharded_train_step(mesh, 2, alpha=0.1, beta=0.01)
    state = step(key, state, tv, tf, lb, save=jnp.bool_(True))
    ph = np.asarray(pooled_phi(state))
    assert ph.shape == (16, 4)
    np.testing.assert_allclose(ph.sum(axis=0), 1.0, rtol=1e-4)
