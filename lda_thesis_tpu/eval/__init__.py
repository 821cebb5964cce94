"""Multilabel ranking evaluation and CascadeLDA tree-probability reassembly."""

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
    "binary_yreal",
    "evaluate_ranking",
    "get_f1",
    "macro_auc_roc",
    "n_error",
    "one_roc",
    "rates",
]
