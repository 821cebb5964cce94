"""TPU-native supervised-LDA inference framework.

Brand-new JAX/XLA/Pallas implementation of the model family of
KenHBS/LDA_thesis (Labeled LDA, CascadeLDA, HSLDA, LocalLDA) — see
ARCHITECTURE.md and SURVEY.md.
"""

__version__ = "0.1.0"

from . import data, eval, models, ops, parallel  # noqa: F401

__all__ = ["data", "eval", "models", "ops", "parallel", "__version__"]
