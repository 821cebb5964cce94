"""Shared model-state helpers: estimators and thinned running averages.

Posterior estimators (SURVEY.md C9) in the framework's (V, K)-major layout:

* :func:`phi_from_counts` — smoothed φ = (n_vk + β)/(n_k + Vβ)
  (reference ``get_phi``, LabeledLDA.py:231-234)
* :func:`theta_from_counts` — label-mask-asymmetric θ = (n_dk + labs·α)/Σ
  (reference ``get_theta``, LabeledLDA.py:236-239; with ``labs = 1`` this is
  LocalLDA's symmetric version, LocalLDA.py:116-119)
* :func:`phi_unsmoothed` — n_vk/Σ (reference ``get_ph``, CascadeLDA.py:394-395,
  HSLDA.py:151-152), with 0/0 rows mapped to 0 instead of NaN
* :func:`running_average` — incremental thinned mean
  m_s = (s−1)/s · m_{s−1} + 1/s · x (reference LabeledLDA.py:138-145)
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "phi_from_counts",
    "theta_from_counts",
    "phi_unsmoothed",
    "zbar_from_counts",
    "running_average",
    "pad_axis",
]


def phi_from_counts(n_vk, n_k, beta: float, topic_mask=None):
    """(V, K) smoothed topic-word distribution; padded topics forced to 0."""
    V = n_vk.shape[0]
    phi = (n_vk.astype(jnp.float32) + beta) / (
        n_k.astype(jnp.float32) + V * beta
    )
    if topic_mask is not None:
        phi = phi * topic_mask
    return phi


def theta_from_counts(n_dk, labs, alpha: float):
    """(D, K) doc-topic estimate with the label-masked asymmetric α prior."""
    num = n_dk.astype(jnp.float32) + labs * alpha
    den = num.sum(axis=1, keepdims=True)
    return num / jnp.maximum(den, 1e-38)


def phi_unsmoothed(n_vk, topic_mask=None):
    """(V, K) unsmoothed topic-word distribution; empty topics -> 0 rows."""
    den = n_vk.sum(axis=0, keepdims=True).astype(jnp.float32)  # (1, K)
    phi = n_vk.astype(jnp.float32) / jnp.maximum(den, 1.0)
    if topic_mask is not None:
        phi = phi * topic_mask
    return phi


def zbar_from_counts(n_dk):
    """(D, K) empirical topic mixture n_dk/Σ (reference HSLDA.py:148-149)."""
    den = n_dk.sum(axis=1, keepdims=True).astype(jnp.float32)
    return n_dk.astype(jnp.float32) / jnp.maximum(den, 1.0)


def running_average(avg, cur, s):
    """Thinned incremental mean; ``s`` is the 1-based save index (traced)."""
    s = s.astype(jnp.float32) if hasattr(s, "astype") else jnp.float32(s)
    new = (s - 1.0) / s * avg + cur / s
    return jnp.where(s <= 1.0, cur, new)


def pad_axis(x, axis: int, multiple: int, value=0):
    """Pad ``x`` along ``axis`` up to the next multiple of ``multiple``."""
    size = x.shape[axis]
    target = ((size + multiple - 1) // multiple) * multiple
    if target == size:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, target - size)
    return jnp.pad(x, widths, constant_values=value)
