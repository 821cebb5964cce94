"""Fused whole-sweep kernel (ops/gibbs_fused.py): semantics + invariants.

The Pallas-vs-XLA-twin bitwise test lives in tests/test_fused_parity.py
(accelerator-only).  Here the twin path is exercised on CPU:

* count-tensor invariants after merge blocks (the reference's runtime
  guards, LabeledLDA.py:146-153, promoted to tests),
* M=1 merge blocks match an independent NumPy oracle of the same
  frozen-table algorithm, draw for draw,
* the model-level fused path learns the label structure and round-trips
  through checkpoints.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lda_thesis_tpu.ops.gibbs_fused import (
    FusedLDAState,
    fused_train_block,
    gather_cv,
    init_fused,
    theta_from_fused,
)

D, U, A, K, V = 16, 8, 8, 128, 40


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(1)
    tok_v = rng.integers(0, V, size=(D, U)).astype(np.int32)
    n_types = rng.integers(2, U + 1, size=(D,))
    tok_f = (np.arange(U)[None, :] < n_types[:, None]).astype(np.int32)
    tok_f *= rng.integers(1, 4, size=(D, U)).astype(np.int32)
    lab_ids = np.zeros((D, A), np.int32)
    lab_valid = np.zeros((D, A), np.float32)
    for d in range(D):
        ids = np.sort(rng.choice(20, size=rng.integers(2, 5), replace=False))
        lab_ids[d, : len(ids)] = ids
        lab_valid[d, : len(ids)] = 1.0
    return (jnp.asarray(tok_v), jnp.asarray(tok_f), jnp.asarray(lab_ids),
            jnp.asarray(lab_valid))


def _init(problem, seed=0):
    tok_v, tok_f, lab_ids, lab_valid = problem
    return init_fused(jax.random.PRNGKey(seed), tok_v, tok_f, lab_ids,
                      lab_valid, V, K)


def test_init_invariants(problem):
    tok_v, tok_f, lab_ids, lab_valid = problem
    st = _init(problem)
    total = float(tok_f.sum())
    assert float(st.n_vk.sum()) == total
    assert float(st.n_dk.sum()) == total
    np.testing.assert_array_equal(np.asarray(st.n_k), np.asarray(st.n_vk).sum(0))
    # z within each doc's valid slots
    valid_count = np.asarray(lab_valid).sum(axis=1).astype(int)
    z = np.asarray(st.z)  # (U, D)
    f = np.asarray(tok_f).T
    for d in range(D):
        assert (z[f[:, d] > 0, d] < valid_count[d]).all()


@pytest.mark.parametrize("M", [1, 2, 4])
def test_block_invariants(problem, M):
    tok_v, tok_f, lab_ids, lab_valid = problem
    st = _init(problem)
    total = float(tok_f.sum())
    tv_t = tok_v.T
    tf_t = tok_f.T.astype(jnp.float32)
    lv_t = lab_valid.T
    for i in range(3):
        st = fused_train_block(
            jax.random.PRNGKey(10 + i), st, tv_t, tf_t, lab_ids, lv_t,
            0.1, 0.01, M,
        )
    assert float(st.n_vk.sum()) == total
    assert float(st.n_dk.sum()) == total
    assert float(st.n_vk.min()) >= 0
    assert float(st.n_dk.min()) >= 0
    np.testing.assert_array_equal(np.asarray(st.n_k), np.asarray(st.n_vk).sum(0))


def _numpy_oracle_block(st, tok_v, tok_f, lab_ids, lab_valid, uniforms,
                        alpha, beta, M):
    """Frozen-table merge-block sampler, straight NumPy (the reference
    posterior LabeledLDA.py:113-117 with block-start counts)."""
    z = np.asarray(st.z).copy()  # (U, D)
    ndk = np.asarray(st.n_dk).copy()  # (A, D)
    n_vk0 = np.asarray(st.n_vk)
    n_k0 = np.asarray(st.n_k)
    tok_v = np.asarray(tok_v)
    tok_f = np.asarray(tok_f).astype(np.float64)
    lab_ids = np.asarray(lab_ids)
    lab_valid = np.asarray(lab_valid)
    z0 = z.copy()
    Vn = n_vk0.shape[0]
    for m in range(M):
        for u in range(U):
            for d in range(D):
                f = tok_f[d, u]
                v = tok_v[d, u]
                zs, zo = z0[u, d], z[u, d]
                w = np.zeros(A)
                for a in range(A):
                    if lab_valid[d, a] == 0:
                        continue
                    k = lab_ids[d, a]
                    cv = n_vk0[v, k] - (f if a == zs else 0.0)
                    nk = n_k0[k] - (f if a == zs else 0.0)
                    nd = ndk[a, d] - (f if a == zo else 0.0)
                    w[a] = (nd + alpha) * (cv + beta) / (nk + Vn * beta)
                c = np.cumsum(w)
                if f > 0:
                    r = uniforms[m, u, d] * c[-1]
                    zn = int((c < r).sum())
                else:
                    zn = zo
                ndk[zo, d] -= f
                ndk[zn, d] += f
                z[u, d] = zn
    # commit deltas
    n_vk = n_vk0.copy()
    for u in range(U):
        for d in range(D):
            f = tok_f[d, u]
            n_vk[tok_v[d, u], lab_ids[d, z0[u, d]]] -= f
            n_vk[tok_v[d, u], lab_ids[d, z[u, d]]] += f
    return z, ndk, n_vk


@pytest.mark.parametrize("M", [1, 3])
def test_block_matches_numpy_oracle(problem, M):
    """The jax twin reproduces an independent NumPy implementation of the
    frozen-table sampler draw for draw (same uniforms)."""
    tok_v, tok_f, lab_ids, lab_valid = problem
    st = _init(problem)
    key = jax.random.PRNGKey(7)
    uniforms = np.asarray(
        jax.random.uniform(key, (M, U, D), dtype=jnp.float32)
    ).astype(np.float64)

    z_np, ndk_np, nvk_np = _numpy_oracle_block(
        st, tok_v, tok_f, lab_ids, lab_valid, uniforms, 0.1, 0.01, M
    )
    st2 = fused_train_block(
        key, st, tok_v.T, tok_f.T.astype(jnp.float32), lab_ids,
        lab_valid.T, 0.1, 0.01, M,
    )
    # float32-vs-float64 posterior rounding can flip a draw only on exact
    # CDF ties; with random uniforms that is measure-zero — require equality
    np.testing.assert_array_equal(np.asarray(st2.z), z_np)
    np.testing.assert_array_equal(np.asarray(st2.n_dk), ndk_np)
    np.testing.assert_array_equal(np.asarray(st2.n_vk), nvk_np)


def test_gather_cv_values(problem):
    tok_v, tok_f, lab_ids, lab_valid = problem
    st = _init(problem)
    cv = np.asarray(gather_cv(st.n_vk, tok_v.T, lab_ids))  # (U, A, D)
    n_vk = np.asarray(st.n_vk)
    for u in range(U):
        for d in range(D):
            for a in range(A):
                assert cv[u, a, d] == n_vk[tok_v[d, u], lab_ids[d, a]]


def test_theta_from_fused(problem):
    tok_v, tok_f, lab_ids, lab_valid = problem
    st = _init(problem)
    th = np.asarray(theta_from_fused(st.n_dk, lab_ids, lab_valid, 0.1, K))
    assert th.shape == (D, K)
    np.testing.assert_allclose(th.sum(axis=1), 1.0, rtol=1e-5)
    # mass only on admissible topics
    mask = np.zeros((D, K))
    for d in range(D):
        for a in range(A):
            if lab_valid[d, a] > 0:
                mask[d, lab_ids[d, a]] = 1
    assert (th[mask == 0] == 0).all()


def test_gather_and_slot_pick_match_take_along_axis():
    """The MXU one-hot gather and the select-sum slot->global conversion
    (round-4 perf: TPU element gathers serialise) must be BITWISE equal to
    their take_along_axis formulations."""
    import jax.numpy as jnp

    from lda_thesis_tpu.ops.gibbs_fused import _slot_to_global, gather_cv

    rng = np.random.default_rng(5)
    U, D, A, K, V = 16, 24, 8, 128, 300
    n_vk = jnp.asarray(
        rng.integers(0, 2**20, size=(V, K)).astype(np.float32))
    tok_v_t = jnp.asarray(rng.integers(0, V, size=(U, D)).astype(np.int32))
    lab_ids = jnp.asarray(
        np.sort(rng.integers(0, K, size=(D, A)), axis=1).astype(np.int32))

    got = np.asarray(gather_cv(n_vk, tok_v_t, lab_ids))
    rows = np.asarray(n_vk)[np.asarray(tok_v_t)]  # (U, D, K)
    want = np.take_along_axis(
        rows, np.asarray(lab_ids)[None], axis=2).transpose(0, 2, 1)
    np.testing.assert_array_equal(got, want)

    z = jnp.asarray(rng.integers(0, A, size=(U, D)).astype(np.int32))
    got_z = np.asarray(_slot_to_global(lab_ids, z))
    want_z = np.take_along_axis(np.asarray(lab_ids), np.asarray(z).T,
                                axis=1).T
    np.testing.assert_array_equal(got_z, want_z)


# --------------------------------------------------------------------------
# dense-K (identity-slots) mode — the LocalLDA path (round-5 VERDICT item 2)
# --------------------------------------------------------------------------


def _identity_problem(seed=3, Kt=6):
    """All-topics-admissible problem: slot a = topic a (LocalLDA layout)."""
    rng = np.random.default_rng(seed)
    tok_v = rng.integers(0, V, size=(D, U)).astype(np.int32)
    n_types = rng.integers(2, U + 1, size=(D,))
    tok_f = (np.arange(U)[None, :] < n_types[:, None]).astype(np.int32)
    tok_f *= rng.integers(1, 4, size=(D, U)).astype(np.int32)
    ids = np.where(np.arange(A) < Kt, np.arange(A), 0).astype(np.int32)
    val = (np.arange(A) < Kt).astype(np.float32)
    lab_ids = np.broadcast_to(ids, (D, A)).copy()
    lab_valid = np.broadcast_to(val, (D, A)).copy()
    return (jnp.asarray(tok_v), jnp.asarray(tok_f), jnp.asarray(lab_ids),
            jnp.asarray(lab_valid))


def test_gather_cv_identity_slots_bitwise():
    """identity_slots=True (slice+transpose) == one-hot gather on valid
    slots, bitwise (ops/gibbs_fused.gather_cv docstring contract)."""
    tok_v, tok_f, lab_ids, lab_valid = _identity_problem()
    st = init_fused(jax.random.PRNGKey(2), tok_v, tok_f, lab_ids,
                    lab_valid, V, K)
    fast = np.asarray(gather_cv(st.n_vk, tok_v.T, lab_ids,
                                identity_slots=True))
    slow = np.asarray(gather_cv(st.n_vk, tok_v.T, lab_ids))
    valid = np.asarray(lab_valid)[0] > 0  # same row for every doc
    np.testing.assert_array_equal(fast[:, valid, :], slow[:, valid, :])


@pytest.mark.parametrize("M", [1, 3])
def test_identity_slots_block_bitwise_equal(M):
    """A dense-K merge block with identity_slots=True draws the identical
    chain as the generic compact path (pad-slot cv values are unused:
    their posterior weight is exactly 0 either way)."""
    tok_v, tok_f, lab_ids, lab_valid = _identity_problem()
    key = jax.random.PRNGKey(11)
    st0 = init_fused(jax.random.PRNGKey(4), tok_v, tok_f, lab_ids,
                     lab_valid, V, K)
    a = fused_train_block(key, st0, tok_v.T, tok_f.T.astype(jnp.float32),
                          lab_ids, lab_valid.T, 0.1, 0.01, M)
    b = fused_train_block(key, st0, tok_v.T, tok_f.T.astype(jnp.float32),
                          lab_ids, lab_valid.T, 0.1, 0.01, M,
                          identity_slots=True)
    np.testing.assert_array_equal(np.asarray(a.z), np.asarray(b.z))
    np.testing.assert_array_equal(np.asarray(a.n_dk), np.asarray(b.n_dk))
    np.testing.assert_array_equal(np.asarray(a.n_vk), np.asarray(b.n_vk))
    np.testing.assert_array_equal(np.asarray(a.n_k), np.asarray(b.n_k))


@pytest.mark.parametrize("identity", [False, True])
def test_table_i16_gather_bitwise_equal(identity):
    """The int16 table view (half gather traffic) draws the identical
    chain: counts are non-negative integers bounded by each word's corpus
    frequency, exactly representable in int16 when the caller's gate
    holds."""
    if identity:
        tok_v, tok_f, lab_ids, lab_valid = _identity_problem()
    else:
        rng = np.random.default_rng(8)
        tok_v = jnp.asarray(rng.integers(0, V, size=(D, U)).astype(np.int32))
        tok_f = jnp.asarray(rng.integers(1, 4, size=(D, U)).astype(np.int32))
        li = np.zeros((D, A), np.int32)
        lv = np.zeros((D, A), np.float32)
        for d in range(D):
            ids = np.sort(rng.choice(20, size=4, replace=False))
            li[d, :4] = ids
            lv[d, :4] = 1.0
        lab_ids, lab_valid = jnp.asarray(li), jnp.asarray(lv)
    st0 = init_fused(jax.random.PRNGKey(6), tok_v, tok_f, lab_ids,
                     lab_valid, V, K)
    key = jax.random.PRNGKey(31)
    kw = dict(identity_slots=identity)
    a = fused_train_block(key, st0, tok_v.T, tok_f.T.astype(jnp.float32),
                          lab_ids, lab_valid.T, 0.1, 0.01, 3, **kw)
    b = fused_train_block(key, st0, tok_v.T, tok_f.T.astype(jnp.float32),
                          lab_ids, lab_valid.T, 0.1, 0.01, 3,
                          table_i16=True, **kw)
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))


def test_table_i16_gate():
    """models gate the int16 gather on the corpus' max term frequency."""
    from lda_thesis_tpu.data.buckets import bucket_encode
    from lda_thesis_tpu.models.labeled_lda import _table_fits_i16

    small = bucket_encode([[(0, 5), (1, 3)], [(1, 4)]], n_buckets=1)
    assert _table_fits_i16(small)
    big = bucket_encode([[(0, 40000)], [(2, 3)]], n_buckets=1)
    assert not _table_fits_i16(big)
