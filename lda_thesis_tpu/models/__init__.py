"""Model family: Labeled LDA, LocalLDA, CascadeLDA, HSLDA."""

from .labeled_lda import LabeledLDA
from .local_lda import LocalLDA

__all__ = ["LabeledLDA", "LocalLDA"]
