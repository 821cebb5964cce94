"""Model family: Labeled LDA, LocalLDA, CascadeLDA, HSLDA."""

from .cascade_lda import CascadeLDA
from .hslda import HSLDA
from .labeled_lda import LabeledLDA
from .local_lda import LocalLDA

__all__ = ["CascadeLDA", "HSLDA", "LabeledLDA", "LocalLDA"]
