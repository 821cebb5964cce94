"""Multilabel ranking evaluation and CascadeLDA tree-probability reassembly."""

from .cascade import setup_theta
from .metrics import (
    binary_yreal,
    evaluate_ranking,
    get_f1,
    macro_auc_roc,
    n_error,
    one_roc,
    rates,
)

__all__ = [
    "setup_theta",
    "binary_yreal",
    "evaluate_ranking",
    "get_f1",
    "macro_auc_roc",
    "n_error",
    "one_roc",
    "rates",
]
