"""Sampling primitive tests: Gumbel-max distribution, truncnorm, Stirling."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy import stats

from lda_thesis_tpu.ops.sampling import (
    gumbel_argmax,
    mask_to_logits,
    stirling_table,
    truncated_normal,
)


def test_gumbel_argmax_matches_categorical():
    key = jax.random.PRNGKey(0)
    probs = np.array([0.1, 0.0, 0.5, 0.4])
    logits = jnp.where(probs > 0, jnp.log(jnp.maximum(probs, 1e-38)), -jnp.inf)
    n = 20000
    draws = jax.vmap(lambda k: gumbel_argmax(k, logits))(jax.random.split(key, n))
    counts = np.bincount(np.asarray(draws), minlength=4)
    assert counts[1] == 0  # masked category never drawn
    freq = counts / n
    assert np.allclose(freq[[0, 2, 3]], probs[[0, 2, 3]], atol=0.02)


def test_mask_to_logits():
    out = np.asarray(mask_to_logits(jnp.array([1.0, 0.0, 1.0])))
    assert out[0] == 0 and np.isneginf(out[1]) and out[2] == 0


def test_gumbel_argmax_batched_rows_masked():
    key = jax.random.PRNGKey(1)
    mask = jnp.array([[1.0, 0.0, 1.0], [1.0, 1.0, 0.0]])
    logits = mask_to_logits(mask)
    z = np.asarray(
        jax.vmap(lambda k: gumbel_argmax(k, logits, axis=1))(jax.random.split(key, 500))
    )
    assert not (z[:, 0] == 1).any()
    assert not (z[:, 1] == 2).any()


@pytest.mark.parametrize(
    "lower,upper,loc",
    [
        (0.0, np.inf, 0.0),
        (-np.inf, 0.0, 0.0),
        (-1.0, 2.0, 0.5),
        (3.0, np.inf, 0.0),  # deep right tail
        (-np.inf, -4.0, 0.0),  # deep left tail
    ],
)
def test_truncated_normal_ks(lower, upper, loc):
    key = jax.random.PRNGKey(42)
    n = 8000
    x = np.asarray(
        truncated_normal(
            key,
            jnp.full((n,), lower),
            jnp.full((n,), upper),
            loc=jnp.float32(loc),
            scale=1.0,
        )
    )
    assert np.all(x >= lower - 1e-5) and np.all(x <= upper + 1e-5)
    a, b = (lower - loc), (upper - loc)
    ks = stats.kstest(x, stats.truncnorm(a, b, loc=loc).cdf)
    assert ks.pvalue > 1e-4, ks


def test_truncated_normal_hslda_shapes():
    # HSLDA usage (HSLDA.py:135-137): scipy's truncnorm takes *standardised*
    # bounds, so the reference's rvs(-mean, inf, loc=mean) truncates at
    # absolute 0.  Our API takes absolute bounds: positive labels a ∈ (0, ∞),
    # negative labels a ∈ (−∞, 0), each centred at mean_a.
    key = jax.random.PRNGKey(0)
    mean = jnp.array([[0.5, -2.0], [1.5, 0.0]])
    labs = jnp.array([[1, 0], [0, 1]])
    lower = jnp.where(labs == 1, 0.0, -jnp.inf)
    upper = jnp.where(labs == 1, jnp.inf, 0.0)
    a = np.asarray(truncated_normal(key, lower, upper, loc=mean))
    assert (a[np.asarray(labs) == 1] > 0).all()
    assert (a[np.asarray(labs) == 0] < 0).all()


def test_stirling_table_matches_reference_construction():
    # reference get_stirling_numbers (HSLDA.py:25-36), small n oracle
    n = 30
    mat = np.identity(n)
    mat[1, 0] = 0
    if n > 2:
        mat[2, 1] = 1
    for m in range(3, n):
        for k in range(1, m):
            mat[m, k] = mat[m - 1, k - 1] + (m - 1) * mat[m - 1, k]
    ref = mat / mat.max(axis=1, keepdims=True)
    ours = stirling_table(n)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-300)


def test_stirling_table_no_overflow():
    t = stirling_table(500)
    assert np.isfinite(t).all() and t.max() == 1.0
