"""Small shared helpers for the parallel layer."""

from __future__ import annotations

import numpy as np

__all__ = ["pad_axis_to"]


def pad_axis_to(x: np.ndarray, target: int, axis: int = 0) -> np.ndarray:
    """Zero-pad ``axis`` of a host array up to ``target`` (no-op if equal)."""
    x = np.asarray(x)
    if x.shape[axis] == target:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - x.shape[axis])
    return np.pad(x, pad)
