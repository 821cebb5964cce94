"""Model family: Labeled LDA, LocalLDA, CascadeLDA, HSLDA."""

from .labeled_lda import LabeledLDA

__all__ = ["LabeledLDA"]
