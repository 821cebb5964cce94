"""Pallas fused-draw kernel == XLA sweep, bitwise (accelerator-only).

The fused kernel (ops/gibbs_pallas.py) is opt-in (``LDA_PALLAS=1``) because
the XLA→Mosaic boundary is expensive on the available chip; this test keeps
it correct for environments where it wins: given identical uniforms the two
branches of ``train_sweep_fast`` must produce identical z, n_dk, n_vk, n_k.

Run on a real accelerator: ``LDA_TESTS_KEEP_PLATFORM=1 pytest tests/test_pallas_parity.py``.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="Mosaic kernels only compile on accelerator backends",
)


def test_fast_sweep_pallas_equals_xla():
    from lda_thesis_tpu.ops.gibbs import to_fast_layout, train_sweep_fast

    rng = np.random.default_rng(0)
    # D must be a multiple of the Pallas BLOCK so both branches pad the doc
    # axis identically — the (U, Dp) uniforms then align and the sweeps are
    # bitwise comparable.
    D, U, V, K = 512, 6, 64, 16
    tok_v = jnp.asarray(rng.integers(0, V, (D, U)), jnp.int32)
    tok_f = jnp.asarray(
        (rng.random((D, U)) < 0.7) * rng.integers(1, 4, (D, U)), jnp.int32)
    labs = jnp.asarray(
        (rng.random((D, K)) < 0.3) | (np.arange(K) == 0)[None, :], jnp.float32)
    z = jnp.asarray(rng.integers(0, K, (D, U)), jnp.int32)
    n_dk = jnp.zeros((D, K), jnp.float32)
    n_vk = jnp.ones((V, K), jnp.float32)
    n_k = jnp.full((K,), float(V), jnp.float32)
    key = jax.random.PRNGKey(3)

    outs = {}
    for mode, env in (("xla", {"LDA_NO_PALLAS": "1"}), ("pallas", {"LDA_PALLAS": "1"})):
        old = {k: os.environ.get(k) for k in ("LDA_PALLAS", "LDA_NO_PALLAS")}
        os.environ.pop("LDA_PALLAS", None)
        os.environ.pop("LDA_NO_PALLAS", None)
        os.environ.update(env)
        try:
            zt, ndk, tv, tf, ff, lp = to_fast_layout(z, n_dk, tok_v, tok_f, labs)
            outs[mode] = jax.jit(train_sweep_fast, static_argnames=())(
                key, zt, ndk, n_vk, n_k, tv, tf, ff, lp, 0.1, 0.01)
            jax.block_until_ready(outs[mode])
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    for a, b in zip(outs["xla"], outs["pallas"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
