"""Gibbs sweep kernel tests: posterior math vs NumPy oracle + count invariants."""

import numpy as np
import jax
import jax.numpy as jnp

from lda_thesis_tpu.ops.gibbs import (
    LDACounts,
    foldin_sweep,
    init_counts as _init_counts,
    log_likelihood as _log_likelihood,
    train_sweep as _train_sweep,
)

# jit in tests: eager-mode scan dispatch is ~1000x slower
init_counts = jax.jit(_init_counts, static_argnums=4)
train_sweep = jax.jit(_train_sweep, static_argnames=("alpha", "beta"))
log_likelihood = jax.jit(_log_likelihood)


def _tiny_problem(seed=0, D=6, U=5, V=9, K=4):
    rng = np.random.default_rng(seed)
    tok_v = rng.integers(0, V, size=(D, U)).astype(np.int32)
    tok_f = rng.integers(1, 4, size=(D, U)).astype(np.int32)
    tok_f[:, -1] = 0  # padding column
    labs = (rng.random((D, K)) < 0.5).astype(np.float32)
    labs[:, 0] = 1.0  # root always on
    return jnp.asarray(tok_v), jnp.asarray(tok_f), jnp.asarray(labs), V, K


def _np_counts_from_z(z, tok_v, tok_f, V, K):
    D, U = z.shape
    n_dk = np.zeros((D, K), np.int32)
    n_vk = np.zeros((V, K), np.int32)
    n_k = np.zeros(K, np.int32)
    for d in range(D):
        for n in range(U):
            f = int(tok_f[d, n])
            if f == 0:
                continue
            k = int(z[d, n])
            v = int(tok_v[d, n])
            n_dk[d, k] += f
            n_vk[v, k] += f
            n_k[k] += f
    return n_dk, n_vk, n_k


def test_init_counts_consistent_and_label_respecting():
    tok_v, tok_f, labs, V, K = _tiny_problem()
    c = init_counts(jax.random.PRNGKey(0), tok_v, tok_f, labs, V)
    n_dk, n_vk, n_k = _np_counts_from_z(
        np.asarray(c.z), np.asarray(tok_v), np.asarray(tok_f), V, K
    )
    np.testing.assert_array_equal(np.asarray(c.n_dk), n_dk)
    np.testing.assert_array_equal(np.asarray(c.n_vk), n_vk)
    np.testing.assert_array_equal(np.asarray(c.n_k), n_k)
    # every z respects the doc's label mask
    labs_np = np.asarray(labs)
    z = np.asarray(c.z)
    f = np.asarray(tok_f)
    for d in range(z.shape[0]):
        for n in range(z.shape[1]):
            if f[d, n] > 0:
                assert labs_np[d, z[d, n]] == 1


def test_train_sweep_invariants():
    tok_v, tok_f, labs, V, K = _tiny_problem(seed=1)
    c = init_counts(jax.random.PRNGKey(1), tok_v, tok_f, labs, V)
    total = int(np.asarray(tok_f).sum())
    key = jax.random.PRNGKey(2)
    for i in range(3):
        key, k = jax.random.split(key)
        c = train_sweep(k, c, tok_v, tok_f, labs, alpha=0.1, beta=0.01)
        # counts remain consistent with z and non-negative (reference guards
        # LabeledLDA.py:146-153 promoted to tests)
        n_dk, n_vk, n_k = _np_counts_from_z(
            np.asarray(c.z), np.asarray(tok_v), np.asarray(tok_f), V, K
        )
        np.testing.assert_array_equal(np.asarray(c.n_dk), n_dk)
        np.testing.assert_array_equal(np.asarray(c.n_vk), n_vk)
        np.testing.assert_array_equal(np.asarray(c.n_k), n_k)
        assert int(np.asarray(c.n_k).sum()) == total
        assert (np.asarray(c.n_dk) >= 0).all() and (np.asarray(c.n_vk) >= 0).all()
        # masks respected after resampling
        labs_np, z, f = np.asarray(labs), np.asarray(c.z), np.asarray(tok_f)
        assert all(
            labs_np[d, z[d, n]] == 1
            for d in range(z.shape[0])
            for n in range(z.shape[1])
            if f[d, n] > 0
        )


def test_single_slot_posterior_matches_reference_equation():
    """Freeze everything except one slot and compare the empirical resampling
    distribution against the reference posterior (LabeledLDA.py:113-117)."""
    V, K = 5, 3
    D, U = 1, 1
    tok_v = jnp.array([[2]], jnp.int32)
    tok_f = jnp.array([[2]], jnp.int32)
    labs = jnp.array([[1.0, 1.0, 1.0]])
    alpha, beta = 0.3, 0.05

    # hand-built global counts: pretend other docs contributed
    base_nvk = np.array(
        [[1, 0, 2], [0, 3, 1], [2, 1, 0], [1, 1, 1], [0, 0, 4]], np.int32
    )
    base_ndk = np.array([[2, 1, 0]], np.int32)  # this doc only
    z0 = 0  # current assignment of the slot (f=2 of word v=2 at topic 0)
    n_vk = base_nvk.copy()
    n_vk[2, z0] += 2
    n_dk = base_ndk.copy()
    n_dk[0, z0] += 2
    n_k = n_vk.sum(axis=0)

    counts = LDACounts(
        z=jnp.array([[z0]], jnp.int32),
        n_dk=jnp.asarray(n_dk),
        n_vk=jnp.asarray(n_vk),
        n_k=jnp.asarray(n_k),
    )

    # reference posterior with the slot decremented
    a = base_ndk[0] + alpha
    num_b = base_nvk[2] + beta
    den_b = base_nvk.sum(axis=0) + V * beta
    p_ref = a * num_b / den_b
    p_ref = p_ref / p_ref.sum()

    n = 6000
    keys = jax.random.split(jax.random.PRNGKey(123), n)
    draw_one = jax.jit(
        jax.vmap(
            lambda k: train_sweep(k, counts, tok_v, tok_f, labs, alpha, beta).z[0, 0]
        )
    )
    draws = np.asarray(draw_one(keys))
    freq = np.bincount(draws, minlength=K) / n
    np.testing.assert_allclose(freq, p_ref, atol=0.025)


def test_foldin_sweep_matches_reference_posterior():
    """Fold-in posterior p ∝ (n_dk+α)·φ[v] (reference LabeledLDA.py:185-194)."""
    V, K = 4, 3
    tok_v = jnp.array([[1]], jnp.int32)
    tok_f = jnp.array([[3]], jnp.int32)
    alpha = 0.2
    phi = np.array(
        [[0.4, 0.1, 0.2], [0.3, 0.0, 0.5], [0.2, 0.6, 0.2], [0.1, 0.3, 0.1]]
    )
    phi_j = jnp.asarray(phi, jnp.float32)
    z = jnp.array([[1]], jnp.int32)
    n_dk = jnp.array([[0, 3, 0]], jnp.int32)

    p_ref = (np.array([0, 0, 0]) + alpha) * phi[1]
    p_ref /= p_ref.sum()

    n = 6000
    keys = jax.random.split(jax.random.PRNGKey(7), n)
    draw_one = jax.jit(
        jax.vmap(
            lambda k: foldin_sweep(k, z, n_dk, tok_v, tok_f, phi_j, alpha)[0][0, 0]
        )
    )
    draws = np.asarray(draw_one(keys))
    freq = np.bincount(draws, minlength=K) / n
    np.testing.assert_allclose(freq, p_ref, atol=0.025)
    assert freq[1] == 0  # φ[1, 1] = 0 -> topic 1 unreachable


def test_foldin_beta_fallback():
    """All-zero φ row triggers CascadeLDA's +β recovery (CascadeLDA.py:224-229)."""
    V, K = 2, 3
    tok_v = jnp.array([[0]], jnp.int32)
    tok_f = jnp.array([[1]], jnp.int32)
    phi = jnp.zeros((V, K), jnp.float32)
    z = jnp.array([[0]], jnp.int32)
    n_dk = jnp.array([[1, 0, 0]], jnp.int32)
    z2, n2 = foldin_sweep(
        jax.random.PRNGKey(0), z, n_dk, tok_v, tok_f, phi, 0.5, beta_fallback=0.01
    )
    # with fallback p ∝ (n_dk+α)·β -> ∝ (n_dk+α); finite draw, counts stay valid
    assert int(np.asarray(n2).sum()) == 1 and (np.asarray(n2) >= 0).all()


def test_log_likelihood_matches_numpy():
    tok_v, tok_f, labs, V, K = _tiny_problem(seed=3)
    rng = np.random.default_rng(0)
    theta = rng.dirichlet(np.ones(K), size=tok_v.shape[0])
    phi_vk = rng.dirichlet(np.ones(V), size=K).T  # (V, K)
    ll, n = log_likelihood(
        jnp.asarray(theta, jnp.float32), jnp.asarray(phi_vk, jnp.float32), tok_v, tok_f
    )
    ref = 0.0
    tv, tf = np.asarray(tok_v), np.asarray(tok_f)
    for d in range(tv.shape[0]):
        for u in range(tv.shape[1]):
            if tf[d, u] > 0:
                ref += tf[d, u] * np.log(theta[d] @ phi_vk[tv[d, u]])
    assert np.isclose(float(ll), ref, rtol=1e-4)
    assert int(n) == int(tf.sum())


def test_test_loop_runs_trailing_remainder_sweeps():
    """With it % thinning != 0 the trailing sweeps must still execute
    (reference runs all ``it`` sweeps, LabeledLDA.py:199-211): the final z
    state after it=10 differs from it=8, while the saved average (updated
    only at thinning multiples) is identical."""
    from lda_thesis_tpu.models.labeled_lda import _test_loop

    rng = np.random.default_rng(0)
    D, U, V, K = 8, 6, 12, 4
    tok_v = jnp.asarray(rng.integers(0, V, (D, U)).astype(np.int32))
    tok_f = jnp.asarray(rng.integers(1, 4, (D, U)).astype(np.int32))
    phi = jnp.asarray(rng.dirichlet(np.ones(K), size=V).astype(np.float32))
    mask = jnp.ones((K,), jnp.float32)
    key = jax.random.PRNGKey(7)

    avg10, z10 = _test_loop(key, tok_v, tok_f, phi, mask, it=10, thinning=4, alpha=0.1)
    avg8, z8 = _test_loop(key, tok_v, tok_f, phi, mask, it=8, thinning=4, alpha=0.1)
    np.testing.assert_allclose(np.asarray(avg10), np.asarray(avg8), rtol=1e-6)
    assert np.any(np.asarray(z10) != np.asarray(z8))


def test_compact_sweep_exactly_matches_dense():
    """The compact-support sweep is the *identical* sampler: with ascending
    slot ids and the same key, every draw lands on the same global topic and
    all count tensors match the dense path exactly (ops/gibbs.py
    CompactLDACounts invariant)."""
    from lda_thesis_tpu.data.encode import compact_labels
    from lda_thesis_tpu.models.state import theta_from_counts
    from lda_thesis_tpu.ops.gibbs import (
        densify_ndk,
        init_counts_compact,
        theta_from_compact,
        train_sweep_compact,
    )

    rng = np.random.default_rng(0)
    D, U, V, K = 12, 7, 20, 16
    tok_v = jnp.asarray(rng.integers(0, V, (D, U)).astype(np.int32))
    tok_f = jnp.asarray(rng.integers(0, 4, (D, U)).astype(np.int32))
    mask = ((rng.random((D, K)) < 0.25) | (np.arange(K) == 0)[None, :]).astype(np.float32)
    lab_ids, lab_valid = compact_labels(mask)
    li, lv = jnp.asarray(lab_ids), jnp.asarray(lab_valid)
    labs = jnp.asarray(mask)

    key = jax.random.PRNGKey(3)
    cd = init_counts(key, tok_v, tok_f, labs, V)
    cc = init_counts_compact(key, tok_v, tok_f, li, lv, V, K)

    def zg(c):
        return np.asarray(jnp.take_along_axis(li, c.z.reshape(D, -1), axis=1))

    assert (np.asarray(cd.z) == zg(cc)).all()
    np.testing.assert_allclose(np.asarray(cd.n_vk), np.asarray(cc.n_vk))

    k2 = jax.random.PRNGKey(11)
    for _ in range(3):
        k2, ks = jax.random.split(k2)
        cd = train_sweep(ks, cd, tok_v, tok_f, labs, 0.1, 0.01)
        cc = train_sweep_compact(ks, cc, tok_v, tok_f, li, lv, 0.1, 0.01)
    assert (np.asarray(cd.z) == zg(cc)).all()
    np.testing.assert_allclose(np.asarray(cd.n_vk), np.asarray(cc.n_vk))
    np.testing.assert_allclose(np.asarray(cd.n_k), np.asarray(cc.n_k))
    np.testing.assert_allclose(
        np.asarray(cd.n_dk), np.asarray(densify_ndk(cc.n_dk, li, K))
    )
    np.testing.assert_allclose(
        np.asarray(theta_from_compact(cc.n_dk, li, lv, 0.1, K)),
        np.asarray(theta_from_counts(cd.n_dk, labs, 0.1)),
        atol=1e-6,
    )
