"""Small shared helpers for the parallel layer."""

from __future__ import annotations

import numpy as np

__all__ = ["pad_axis_to", "dispatch_chunks", "check_merge_block"]


def dispatch_chunks(iters: int, thinning: int, limit: int):
    """Split ``iters`` into dispatch chunks of at most ~``limit`` sweeps
    (cycles), aligned to ``thinning`` boundaries so the thinned-save
    structure is identical to a single dispatch — the trailing
    ``iters % thinning`` sweeps run unsaved in the final chunk (the
    reference multiples-only rule).  All full chunks share one program
    shape, so at most two executables cover any budget.  Used by every
    distributed trainer: the tunnelled backend's compiler crashes on
    monolithic multi-thousand-step scans."""
    chunk = max((int(limit) // int(thinning)) * int(thinning), int(thinning))
    done = 0
    while done < int(iters):
        step = min(chunk, int(iters) - done)
        yield step
        done += step


def check_merge_block(model, merge: int) -> None:
    """Bit-identical resume guard (round-4 ADVICE): checkpoints record the
    fused merge-block M in use; a resumed run that recomputes a different
    M raises instead of silently drawing a different chain.  Shared by the
    single-chip model and every distributed trainer."""
    ckpt = getattr(model, "_ckpt_merge_M", None)
    if ckpt is not None and int(ckpt) != int(merge):
        raise ValueError(
            f"fused merge-block mismatch: checkpoint used M={ckpt}, this "
            f"run selected M={merge} — pass total_iters= (the full planned "
            f"sweep count of the original run) so the resumed chain is "
            f"bit-identical")
    model._merge_M = int(merge)


def pad_axis_to(x: np.ndarray, target: int, axis: int = 0) -> np.ndarray:
    """Zero-pad ``axis`` of a host array up to ``target`` (no-op if equal)."""
    x = np.asarray(x)
    if x.shape[axis] == target:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - x.shape[axis])
    return np.pad(x, pad)
