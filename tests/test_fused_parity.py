"""Whole-sweep fused Pallas kernel == XLA twin, bitwise (accelerator-only).

The fused merge-block sampler (ops/gibbs_fused.py) is the default training
path on TPU; its Pallas kernel and the portable XLA twin implement the same
algorithm with identical op order — given identical uniforms they must
produce identical z, n_dk, n_vk, n_k.

Run on a real accelerator:
``LDA_TESTS_KEEP_PLATFORM=1 pytest tests/test_fused_parity.py``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="Mosaic kernels only compile on accelerator backends",
)


def _problem(D=512, U=16, A=8, K=128, V=300, seed=0):
    from lda_thesis_tpu.ops.gibbs_fused import init_fused

    rng = np.random.default_rng(seed)
    tok_v = rng.integers(0, V, size=(D, U)).astype(np.int32)
    n_types = rng.integers(2, U + 1, size=(D,))
    tok_f = (np.arange(U)[None, :] < n_types[:, None]).astype(np.int32)
    tok_f *= rng.integers(1, 4, size=(D, U)).astype(np.int32)
    lab_ids = np.zeros((D, A), np.int32)
    lab_valid = np.zeros((D, A), np.float32)
    for d in range(D):
        ids = np.sort(rng.choice(40, size=rng.integers(2, 6), replace=False))
        lab_ids[d, : len(ids)] = ids
        lab_valid[d, : len(ids)] = 1.0
    st = init_fused(jax.random.PRNGKey(seed + 1), jnp.asarray(tok_v),
                    jnp.asarray(tok_f), jnp.asarray(lab_ids),
                    jnp.asarray(lab_valid), V, K)
    return (st, jnp.asarray(tok_v.T), jnp.asarray(tok_f.T.astype(np.float32)),
            jnp.asarray(lab_ids), jnp.asarray(lab_valid.T))


@pytest.mark.parametrize("M", [1, 5])
def test_fused_block_pallas_equals_twin(M):
    from lda_thesis_tpu.ops.gibbs_fused import (
        _build_block_kernel,
        fused_block_xla,
        gather_cv,
    )

    st, tv_t, tf_t, lab_ids, lv_t = _problem()
    U, D = tv_t.shape
    A = lab_ids.shape[1]
    V, K = st.n_vk.shape
    alpha, beta = 0.1, 0.01
    vbeta = float(V * beta)
    tril = jnp.tril(jnp.ones((A, A), jnp.float32))

    cv_all = gather_cv(st.n_vk, tv_t, lab_ids)
    # nkg is pre-biased by V*beta (a traced value in the product path, so
    # per-split vocab sizes don't recompile the kernel)
    nkg = st.n_k[lab_ids].T + vbeta
    uniforms = jax.random.uniform(jax.random.PRNGKey(9), (M, U, D),
                                  dtype=jnp.float32)

    call = _build_block_kernel(M, U, A, D, alpha, beta)
    z_pal, ndk_pal = call(
        cv_all, tf_t.reshape(U, 1, D), uniforms.reshape(M * U, 1, D),
        st.z.reshape(U, 1, D), nkg, lv_t, st.n_dk, tril,
    )
    z_twin, ndk_twin = fused_block_xla(
        cv_all, tf_t, uniforms, st.z, nkg, lv_t, st.n_dk, tril,
        alpha, beta, M,
    )
    np.testing.assert_array_equal(
        np.asarray(z_pal.reshape(U, D)), np.asarray(z_twin))
    np.testing.assert_array_equal(np.asarray(ndk_pal), np.asarray(ndk_twin))


def test_fused_block_invariants_on_chip():
    from lda_thesis_tpu.ops.gibbs_fused import fused_train_block

    st, tv_t, tf_t, lab_ids, lv_t = _problem()
    total = float(tf_t.sum())
    for i in range(2):
        st = fused_train_block(jax.random.PRNGKey(i), st, tv_t, tf_t,
                               lab_ids, lv_t, 0.1, 0.01, 4)
    assert float(st.n_vk.sum()) == total
    assert float(st.n_dk.sum()) == total
    assert float(st.n_vk.min()) >= 0
    np.testing.assert_array_equal(np.asarray(st.n_k), np.asarray(st.n_vk).sum(0))


def test_identity_slots_bitwise_on_chip():
    """Dense-K mode (LocalLDA): the identity-slot gather (slice+transpose,
    no one-hot MXU contraction) must leave the Pallas chain bitwise
    unchanged vs the generic compact gather on the same problem."""
    from lda_thesis_tpu.ops.gibbs_fused import fused_train_block, init_fused

    rng = np.random.default_rng(12)
    D, U, A, K, V, Kt = 512, 16, 8, 128, 300, 6
    tok_v = rng.integers(0, V, size=(D, U)).astype(np.int32)
    n_types = rng.integers(2, U + 1, size=(D,))
    tok_f = (np.arange(U)[None, :] < n_types[:, None]).astype(np.int32)
    tok_f *= rng.integers(1, 4, size=(D, U)).astype(np.int32)
    ids = np.where(np.arange(A) < Kt, np.arange(A), 0).astype(np.int32)
    val = (np.arange(A) < Kt).astype(np.float32)
    lab_ids = jnp.asarray(np.broadcast_to(ids, (D, A)).copy())
    lab_valid = jnp.asarray(np.broadcast_to(val, (D, A)).copy())
    st0 = init_fused(jax.random.PRNGKey(5), jnp.asarray(tok_v),
                     jnp.asarray(tok_f), lab_ids, lab_valid, V, K)
    key = jax.random.PRNGKey(21)
    tv_t = jnp.asarray(tok_v.T)
    tf_t = jnp.asarray(tok_f.T.astype(np.float32))
    a = fused_train_block(key, st0, tv_t, tf_t, lab_ids, lab_valid.T,
                          0.1, 0.01, 5)
    b = fused_train_block(key, st0, tv_t, tf_t, lab_ids, lab_valid.T,
                          0.1, 0.01, 5, identity_slots=True)
    np.testing.assert_array_equal(np.asarray(a.z), np.asarray(b.z))
    np.testing.assert_array_equal(np.asarray(a.n_dk), np.asarray(b.n_dk))
    np.testing.assert_array_equal(np.asarray(a.n_vk), np.asarray(b.n_vk))
