"""Elastic training supervisor: checkpoint-every-N + automatic resume.

Fresh-design subsystem (the reference has no failure handling at all —
SURVEY.md §5: uncaught ValueError/FloatingPointError guards abort the run,
LabeledLDA.py:146-153).  This supervisor turns the existing atomic
checkpoint layer (utils/checkpoint.py) into crash tolerance: training runs
in chunks, every chunk is checkpointed atomically, and any failure —
a preempted TPU worker, an OOM, a killed process on rerun, or an injected
fault in tests — resumes from the last durable chunk instead of losing the
run.  Resumed training is bit-identical to the uninterrupted run
(tests/test_checkpoint_resume.py, tests/test_elastic.py) because the RNG
key and thinned-average state are part of the checkpoint.

Used by the CLIs via ``--checkpoint PATH --save-every N --resume``; library
users call :func:`elastic_train` directly.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

from .checkpoint import restore_model, save_model

__all__ = ["elastic_train", "ElasticGibbs"]


class ElasticGibbs:
    """Bookkeeping for chunked, resumable Gibbs training of one model."""

    def __init__(self, model, checkpoint: str, resume: bool = True):
        self.model = model
        self.checkpoint = checkpoint
        self.iters = 0
        if resume and checkpoint and os.path.exists(checkpoint + ".json"):
            meta = restore_model(checkpoint, model)
            self.iters = int(meta.get("iters_done", 0))

    def run(self, total_iters: int, thinning: int, save_every: int = 0,
            **train_kw) -> None:
        """Run ``total_iters - iters_done`` more iterations, checkpointing
        every ``save_every`` (0 = only at the end, if a path is set)."""
        chunk = save_every if save_every > 0 else max(total_iters - self.iters, 1)
        while self.iters < total_iters:
            step = min(chunk, total_iters - self.iters)
            self.model.run_training(
                step, thinning, continue_avg=self.iters > 0, **train_kw
            )
            self.iters += step
            if self.checkpoint:
                save_model(self.checkpoint, self.model,
                           extra_meta={"iters_done": self.iters})


def elastic_train(
    make_model: Callable[[], object],
    total_iters: int,
    thinning: int,
    checkpoint: str,
    save_every: int,
    max_restarts: int = 3,
    on_failure: Optional[Callable[[BaseException, int], None]] = None,
    **train_kw,
):
    """Train to ``total_iters`` with automatic restart-from-checkpoint.

    ``make_model`` builds a *fresh* model (same seed/config); each attempt
    restores whatever progress the last attempt durably checkpointed.  Up to
    ``max_restarts`` failures are absorbed; the final exception propagates.
    Returns the trained model.
    """
    attempt = 0
    while True:
        eg = ElasticGibbs(make_model(), checkpoint, resume=True)
        try:
            eg.run(total_iters, thinning, save_every, **train_kw)
            return eg.model
        except Exception as e:  # noqa: BLE001 — supervisor absorbs any fault
            attempt += 1
            if on_failure is not None:
                on_failure(e, attempt)
            if attempt > max_restarts:
                raise
