"""Profiling / tracing / progress observability.

The reference's only observability is ``print`` statements and a manual
wall-clock comparison (SURVEY.md §5).  This module provides:

* :func:`trace` — context manager around ``jax.profiler.trace`` writing a
  TensorBoard-loadable trace (XLA ops, fusion, HBM traffic) to a directory;
* :func:`annotate` — named ``TraceAnnotation`` scopes for host-side phases;
* :class:`Progress` — rate/ETA progress reporting for long Gibbs runs
  (tokens/s, sweeps/s) without per-iteration host syncs.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax

__all__ = ["trace", "annotate", "Progress"]


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device profile for the enclosed block.

    View with: ``tensorboard --logdir <log_dir>`` (profile plugin).
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named host-side scope that shows up on the profiler timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


class Progress:
    """Throughput/ETA reporter for iterative training.

    >>> prog = Progress(total_iters=2000, tokens_per_iter=250_000)
    >>> for i in range(2000):
    ...     step()
    ...     prog.update()   # prints at most every `interval` seconds
    """

    def __init__(
        self,
        total_iters: int,
        tokens_per_iter: int = 0,
        interval: float = 5.0,
        printer=print,
    ):
        self.total = int(total_iters)
        self.tokens_per_iter = int(tokens_per_iter)
        self.interval = float(interval)
        self.printer = printer
        self.done = 0
        self.t0 = time.perf_counter()
        self._last = self.t0

    def update(self, n: int = 1) -> None:
        self.done += n
        now = time.perf_counter()
        if now - self._last < self.interval and self.done < self.total:
            return
        self._last = now
        dt = now - self.t0
        rate = self.done / max(dt, 1e-9)
        eta = (self.total - self.done) / max(rate, 1e-9)
        msg = (
            f"[{self.done}/{self.total}] {rate:.2f} it/s, "
            f"eta {eta:.0f}s"
        )
        if self.tokens_per_iter:
            msg += f", {rate * self.tokens_per_iter / 1e6:.2f}M tokens/s"
        self.printer(msg)
