"""English stopword set for corpus preprocessing.

The reference removes stopwords through gensim's ``remove_stopwords`` filter
(inside ``preprocess_documents``, reference LabeledLDA.py:45).  gensim's
``STOPWORDS`` frozenset is the Stone/Denis/Kwantes (2010) list — itself the
scikit-learn / Glasgow-IR 318-word list plus a small number of additions.
This module reproduces that set without a gensim dependency: scikit-learn's
``ENGLISH_STOP_WORDS`` (available in this environment and identical to the
base list) plus the documented gensim additions.

The set is exposed as a regular module constant so callers can pass their own
set anywhere a stopword set is accepted.
"""

from __future__ import annotations

try:  # scikit-learn ships the 318-word Glasgow-IR base list
    from sklearn.feature_extraction.text import ENGLISH_STOP_WORDS as _BASE
except Exception:  # pragma: no cover - sklearn is present in CI, guard anyway
    _BASE = frozenset()

# Words in gensim.parsing.preprocessing.STOPWORDS beyond the sklearn base list.
_GENSIM_EXTRA = frozenset(
    """
    ll ve don didn doesn just make really quite unless using used various
    say says kg km regarding doing
    """.split()
)

STOPWORDS: frozenset = frozenset(_BASE) | _GENSIM_EXTRA

__all__ = ["STOPWORDS"]
