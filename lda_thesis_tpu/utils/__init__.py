"""Auxiliary subsystems: checkpoint/resume, config, logging/tracing.

The reference has none of these (SURVEY.md §5): persistence is write-only
pickling behind a CLI flag (evaluate_LabeledLDA.py:142-145) with no load
path, configuration is optparse flags, observability is ``print``.  This
package supplies the framework-grade equivalents.
"""

from .cache import enable_persistent_cache
from .checkpoint import load_checkpoint, restore_model, save_checkpoint, save_model
from .config import GibbsConfig, RunConfig
from .tracing import Progress, annotate, trace

__all__ = [
    "enable_persistent_cache",
    "save_checkpoint",
    "load_checkpoint",
    "save_model",
    "restore_model",
    "GibbsConfig",
    "RunConfig",
    "trace",
    "annotate",
    "Progress",
]
