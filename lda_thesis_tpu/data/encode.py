"""Dense encoding of corpora for the TPU sampler.

This is the single biggest structural change from the reference (SURVEY.md §7
step 1): instead of per-document Python lists of ``(token-id, freq)`` tuples
(reference LabeledLDA.py:64,78-83), documents are packed into **padded dense
arrays** that the Gibbs kernels scan over:

* type layout ``(D, U)`` — one slot per unique token *type* per document, with
  its frequency; the L-LDA family flips all ``f`` occurrences of a type at
  once (reference LabeledLDA.py:89-92,108-125).
* instance layout ``(D, N)`` — one slot per token occurrence; HSLDA samples
  per instance (reference HSLDA.py:102,232).

Padding slots carry ``f = 0`` (type layout) or ``mask = 0`` (instance layout)
and are algebraic no-ops in every kernel.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "EncodedCorpus",
    "build_labelmap",
    "binarize_labels",
    "compact_labels",
    "encode_bow_types",
    "encode_instances",
    "encode_corpus",
]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def build_labelmap(labelset: Sequence[str], root: str = "root") -> Dict[str, int]:
    """Label -> topic-id map with the always-on root label at index 0.

    Mirrors ``labelset.insert(0, 'root')`` (reference LabeledLDA.py:51-52);
    HSLDA instead uses the empty string as root (reference HSLDA.py:86-87),
    pass ``root=''``.
    """
    labels = [root] + [l for l in labelset if l != root]
    return {l: i for i, l in enumerate(labels)}


def binarize_labels(
    labs: Sequence[Sequence[str]],
    labelmap: Dict[str, int],
    dtype=np.float32,
) -> np.ndarray:
    """(D, K) binary mask with column 0 (root) always on (LabeledLDA.py:94-99)."""
    D, K = len(labs), len(labelmap)
    out = np.zeros((D, K), dtype=dtype)
    out[:, 0] = 1
    for d, lab in enumerate(labs):
        for x in lab:
            idx = labelmap.get(x)
            if idx is not None:
                out[d, idx] = 1
    return out


def compact_labels(
    lab_mask: np.ndarray,  # (D, K) binary
    pad_multiple: int = 8,
) -> Tuple[np.ndarray, np.ndarray]:
    """(D, K) label mask -> compact ``(lab_ids, lab_valid)`` of shape (D, A).

    A = max labels per document rounded up to ``pad_multiple``.  Slot ids are
    ascending per row so the compact inverse-CDF draw visits topics in the
    same order as the dense one (see ops/gibbs.CompactLDACounts); pad slots
    carry id 0 with valid = 0.
    """
    D = lab_mask.shape[0]
    per_doc = [np.flatnonzero(lab_mask[d]) for d in range(D)]
    A = max(1, max((len(x) for x in per_doc), default=1))
    A = _round_up(A, pad_multiple)
    lab_ids = np.zeros((D, A), dtype=np.int32)
    lab_valid = np.zeros((D, A), dtype=np.float32)
    for d, ids in enumerate(per_doc):
        lab_ids[d, : len(ids)] = ids
        lab_valid[d, : len(ids)] = 1.0
    return lab_ids, lab_valid


def encode_bow_types(
    bows: Sequence[Sequence[Tuple[int, int]]],
    pad_multiple: int = 8,
    min_width: int = 1,
) -> Tuple[np.ndarray, np.ndarray]:
    """Pack per-doc ``(id, freq)`` lists into ``tok_v, tok_f`` of shape (D, U)."""
    D = len(bows)
    U = max([min_width] + [len(b) for b in bows])
    U = _round_up(U, pad_multiple)
    tok_v = np.zeros((D, U), dtype=np.int32)
    tok_f = np.zeros((D, U), dtype=np.int32)
    for d, bow in enumerate(bows):
        for n, (v, f) in enumerate(bow):
            tok_v[d, n] = v
            tok_f[d, n] = f
    return tok_v, tok_f


def encode_instances(
    docs: Sequence[Sequence[int]],
    pad_multiple: int = 8,
    min_width: int = 1,
) -> Tuple[np.ndarray, np.ndarray]:
    """Pack per-doc token-id lists into ``tok_v (D,N), mask (D,N)``."""
    D = len(docs)
    N = max([min_width] + [len(d) for d in docs])
    N = _round_up(N, pad_multiple)
    tok_v = np.zeros((D, N), dtype=np.int32)
    mask = np.zeros((D, N), dtype=np.int32)
    for d, doc in enumerate(docs):
        tok_v[d, : len(doc)] = doc
        mask[d, : len(doc)] = 1
    return tok_v, mask


@dataclass
class EncodedCorpus:
    """Dense, device-ready corpus (type layout) with label masks."""

    tok_v: np.ndarray  # (D, U) int32 token-type vocabulary ids
    tok_f: np.ndarray  # (D, U) int32 frequencies, 0 = padding
    labs: np.ndarray  # (D, K) float32 label mask, col 0 = root
    labelmap: Dict[str, int]
    V: int

    @property
    def D(self) -> int:
        return self.tok_v.shape[0]

    @property
    def K(self) -> int:
        return self.labs.shape[1]

    @property
    def n_tokens(self) -> int:
        return int(self.tok_f.sum())

    @property
    def doc_len(self) -> np.ndarray:
        return self.tok_f.sum(axis=1)


def encode_corpus(
    docs: Sequence[Sequence[str]],
    labs: Sequence[Sequence[str]],
    labelset: Sequence[str],
    dicti,
    root: str = "root",
    pad_multiple: int = 8,
) -> EncodedCorpus:
    """Tokenised docs + labels + dictionary -> :class:`EncodedCorpus`.

    Documents with no in-vocabulary tokens are kept (all-padding rows) so that
    row indices stay aligned with the label arrays; kernels treat them as
    no-ops and estimators guard their normalisation.
    """
    labelmap = build_labelmap(labelset, root=root)
    bows = [dicti.doc2bow(doc) for doc in docs]
    tok_v, tok_f = encode_bow_types(bows, pad_multiple=pad_multiple)
    lab_mask = binarize_labels(labs, labelmap)
    return EncodedCorpus(
        tok_v=tok_v, tok_f=tok_f, labs=lab_mask, labelmap=labelmap, V=len(dicti)
    )
