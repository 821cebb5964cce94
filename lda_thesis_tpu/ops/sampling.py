"""Sampling primitives (SURVEY.md L2).

TPU-native replacements for the reference's sampling layer:

* :func:`gumbel_argmax` — exact categorical draws in log space, replacing
  ``np.random.multinomial(1, p).argmax()`` and its renormalisation hacks
  (reference LabeledLDA.py:119,170-171,192-193).
* :func:`mask_to_logits` — label-constraint masks as additive ``-inf`` logits.
* :func:`truncated_normal` — vectorised one/two-sided truncated normal via
  inverse-CDF (replaces ``scipy.stats.truncnorm.rvs``, reference HSLDA.py:7,137,292).
* :func:`stirling_table` — normalised unsigned-Stirling-first-kind table for
  HSLDA's auxiliary-variable update (reference HSLDA.py:25-36).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "mask_to_logits",
    "gumbel_argmax",
    "categorical_from_probs",
    "truncated_normal",
    "stirling_table",
    "NEG_INF",
]

NEG_INF = -jnp.inf


def mask_to_logits(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Binary mask -> additive logits (0 where allowed, -inf where not)."""
    return jnp.where(mask > 0, jnp.asarray(0.0, dtype), jnp.asarray(-jnp.inf, dtype))


def gumbel_argmax(key: jax.Array, logits: jax.Array, axis: int = -1) -> jax.Array:
    """Exact categorical sample via the Gumbel-max trick.

    ``-inf`` logits are never selected (unless an entire slice is ``-inf``,
    in which case index 0 is returned — callers guarantee index 0 = root is
    always admissible, mirroring the reference's always-on root label).
    """
    g = jax.random.gumbel(key, logits.shape, dtype=logits.dtype)
    return jnp.argmax(logits + g, axis=axis)


def categorical_from_probs(key: jax.Array, probs: jax.Array, axis: int = -1) -> jax.Array:
    """Categorical draw from (possibly unnormalised) non-negative weights."""
    logits = jnp.where(probs > 0, jnp.log(jnp.maximum(probs, 1e-38)), -jnp.inf)
    return gumbel_argmax(key, logits, axis=axis)


def _norm_cdf(x: jax.Array) -> jax.Array:
    return 0.5 * (1.0 + jax.lax.erf(x / np.sqrt(2.0)))


def truncated_normal(
    key: jax.Array,
    lower: jax.Array,
    upper: jax.Array,
    loc: jax.Array = 0.0,
    scale: jax.Array = 1.0,
) -> jax.Array:
    """Sample N(loc, scale^2) truncated to [lower, upper] (elementwise).

    Inverse-CDF in the standardised frame with a tail-stable reflection:
    for intervals on the right half-line we sample the mirrored left
    interval and negate, so the ``ndtri`` argument stays in the well-
    conditioned lower tail. Bounds may be ``±inf`` (reference semantics:
    HSLDA's ``a`` is one-sided truncated, HSLDA.py:135-137,290-292).
    """
    lo = (jnp.asarray(lower) - loc) / scale
    hi = (jnp.asarray(upper) - loc) / scale
    shape = jnp.broadcast_shapes(jnp.shape(lo), jnp.shape(hi))
    lo = jnp.broadcast_to(lo, shape)
    hi = jnp.broadcast_to(hi, shape)

    # reflect right-half intervals into the left half for tail stability
    flip = lo + hi > 0  # interval mass centre on the right
    lo_f = jnp.where(flip, -hi, lo)
    hi_f = jnp.where(flip, -lo, hi)

    u = jax.random.uniform(key, shape, dtype=jnp.float32, minval=1e-7, maxval=1.0)
    cdf_lo = _norm_cdf(lo_f)
    cdf_hi = _norm_cdf(hi_f)
    p = cdf_lo + u * (cdf_hi - cdf_lo)
    p = jnp.clip(p, 1e-38, 1.0 - 1e-7)
    x = jax.scipy.special.ndtri(p)
    x = jnp.clip(x, lo_f, hi_f)
    x = jnp.where(flip, -x, x)
    return loc + scale * x


def stirling_table(n: int) -> np.ndarray:
    """Row-normalised table of unsigned Stirling numbers of the first kind.

    ``table[m, k] = s(m, k) / max_k s(m, k)`` — the reference's
    ``get_stirling_numbers`` (HSLDA.py:25-36) computed in log space so the
    table does not overflow for large ``m`` (the reference overflows float64
    around m ≈ 170).
    """
    logs = np.full((n, n), -np.inf)
    logs[0, 0] = 0.0
    for m in range(1, n):
        # s(m, k) = s(m-1, k-1) + (m-1) * s(m-1, k)
        prev = logs[m - 1]
        left = np.concatenate([[-np.inf], prev[:-1]])
        right = np.log(m - 1) + prev if m > 1 else np.full(n, -np.inf)
        logs[m] = np.logaddexp(left, right)
    row_max = logs.max(axis=1, keepdims=True)
    return np.exp(logs - row_max)
