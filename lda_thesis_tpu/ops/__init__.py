"""Device-side sampling primitives and Gibbs sweep kernels."""

from .gibbs import LDACounts, foldin_sweep, init_counts, log_likelihood, train_sweep
from .sampling import (
    categorical_from_probs,
    gumbel_argmax,
    mask_to_logits,
    stirling_table,
    truncated_normal,
)

__all__ = [
    "LDACounts",
    "foldin_sweep",
    "init_counts",
    "log_likelihood",
    "train_sweep",
    "categorical_from_probs",
    "gumbel_argmax",
    "mask_to_logits",
    "stirling_table",
    "truncated_normal",
]
