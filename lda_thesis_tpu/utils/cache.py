"""Persistent XLA compile cache for the product CLIs.

Compile latency on the tunnelled TPU backend is highly variable (12 s to
8 min observed for the same program), and every CLI invocation is a fresh
process, so without a persistent cache the end-to-end wall-clock of e.g.
``evaluate_labeled_lda -i 4 -s 4`` is dominated by recompiling the same
training/test scans.  The reference has no analogue (pure NumPy, nothing
to compile); this is framework-grade plumbing for the JAX path.

Environment knobs:

- ``LDA_CACHE_DIR`` — cache directory (default
  ``~/.cache/lda_thesis_tpu/xla``).
- ``LDA_NO_CACHE=1`` — disable entirely (e.g. read-only home).
- ``LDA_CACHE_MIN_COMPILE_S`` — only persist compiles slower than this
  (default 0.2 s; the TPU scans always qualify, CPU toys usually don't).
"""

from __future__ import annotations

import os

__all__ = ["enable_persistent_cache"]

_enabled = False


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a writable directory.

    Idempotent; returns the cache dir in use (``None`` when disabled).
    Failures (read-only filesystem, unsupported backend) degrade to a
    warning-free no-op — the cache is an optimisation, never a requirement.
    """
    global _enabled
    if os.environ.get("LDA_NO_CACHE"):
        return None
    if path is None:
        path = os.environ.get("LDA_CACHE_DIR")
    if path is None:
        # prefer the repo-shipped cache (pre-warmed for the product configs
        # by benchmarks/prewarm.py and committed) when it is writable
        repo_cache = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
        if os.path.isdir(repo_cache) and os.access(repo_cache, os.W_OK):
            path = repo_cache
        else:
            path = os.path.join(
                os.path.expanduser("~"), ".cache", "lda_thesis_tpu", "xla")
    if _enabled:
        return path
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(os.environ.get("LDA_CACHE_MIN_COMPILE_S", "0.2")),
        )
    except Exception:
        return None
    _enabled = True
    return path
