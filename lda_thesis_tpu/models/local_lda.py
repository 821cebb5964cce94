"""LocalLDA — sentence-level unsupervised LDA (reference LocalLDA.py:11-130).

Each *sentence* becomes a pseudo-document; the model is plain collapsed-Gibbs
LDA with K free topics and a symmetric α prior.  TPU-native: the training
sweep is exactly the Labeled-LDA kernel (ops/gibbs.py) with an all-ones
label mask, so LocalLDA reuses the same compiled training loop.

Deliberate deviations from the reference (SURVEY.md §2 "bugs to NOT
replicate"):
* z-init draws one topic per token slot; the reference draws exactly K
  z-values per document regardless of its length (``np.random.choice(K, K)``,
  LocalLDA.py:50), silently mis-counting documents with more/fewer types.
* sentence splitting uses the separators ``! . ? , -``; the reference's
  pattern carries a trailing empty alternation that splits between every
  character (LocalLDA.py:154-156).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.encode import encode_bow_types
from ..data.textproc import prep_docs, split_sentences
from ..data.vocab import Dictionary
from ..ops.gibbs import init_counts, log_likelihood
from .labeled_lda import _train_loop
from .state import phi_from_counts, theta_from_counts

__all__ = ["LocalLDA"]


class LocalLDA:
    """Sentence-level LDA with the reference's constructor semantics."""

    def __init__(
        self,
        docs: Sequence[str],
        alpha: float,
        beta: float,
        K: int,
        local_lda: bool = True,
        stem: bool = False,
        seed: int = 0,
        k_pad: int = 128,
    ):
        self.a = float(alpha)
        self.b = float(beta)
        self.K = int(K)

        if local_lda:
            sentences: List[str] = []
            for doc in docs:
                sentences.extend(split_sentences(doc))
            docs = sentences

        prepped = prep_docs(docs, stem=stem)
        self.word2id = Dictionary(prepped)
        doc_tups = [self.word2id.doc2bow(d) for d in prepped]
        # the reference keeps only sentences with >1 distinct type (LocalLDA.py:28)
        doc_tups = [t for t in doc_tups if len(t) > 1]

        self.V = len(self.word2id)
        self.D = len(doc_tups)
        self.w_to_v = self.word2id.token2id
        self.v_to_w = self.word2id.id2token

        tok_v, tok_f = encode_bow_types(doc_tups)
        self.tok_v = jnp.asarray(tok_v)
        self.tok_f = jnp.asarray(tok_f)

        # unsupervised = all topics admissible; pad the topic axis to the
        # lane width with masked-off columns
        self.Kp = ((self.K + k_pad - 1) // k_pad) * k_pad
        mask = (np.arange(self.Kp) < self.K).astype(np.float32)
        self.labs = jnp.asarray(np.broadcast_to(mask, (self.D, self.Kp)).copy())
        self.topic_mask = jnp.asarray(mask)

        self._key = jax.random.PRNGKey(seed)
        self._key, k0 = jax.random.split(self._key)
        self.counts = init_counts(k0, self.tok_v, self.tok_f, self.labs, self.V)

        self.ph_hat: Optional[np.ndarray] = None
        self.th_hat: Optional[np.ndarray] = None

    # ---------------------------------------------------------------- train

    def run_training(self, iters: int, thinning: int) -> None:
        """Gibbs sweeps + thinned φ/θ averaging (reference LocalLDA.py:86-109)."""
        self._key, k = jax.random.split(self._key)
        self.counts, ph_hat, th_hat, _ = _train_loop(
            k,
            self.counts,
            self.tok_v,
            self.tok_f,
            self.labs,
            self.topic_mask,
            iters=int(iters),
            thinning=int(thinning),
            alpha=self.a,
            beta=self.b,
            perplexity=False,
        )
        self.ph_hat = np.asarray(ph_hat[:, : self.K]).T  # (K, V) ref orientation
        self.th_hat = np.asarray(th_hat[:, : self.K])
        self._check_ph_hat()

    def _check_ph_hat(self) -> None:
        """Reference runtime guards (LocalLDA.py:102-109)."""
        if self.ph_hat is None:
            return
        if np.any(self.ph_hat < 0):
            raise ValueError("A negative value occurred in ph_hat")
        if np.any(np.isnan(self.ph_hat)):
            raise ValueError("A nan has creeped into ph_hat")
        if np.any(self.ph_hat.sum(axis=0) == 0):
            raise ValueError("A word in dictionary has no z-value")

    # ------------------------------------------------------------ estimators

    def get_phi(self) -> np.ndarray:
        """(K, V) smoothed φ (reference LocalLDA.py:111-114)."""
        phi = phi_from_counts(self.counts.n_vk, self.counts.n_k, self.b, self.topic_mask)
        return np.asarray(phi[:, : self.K].T)

    def get_theta(self) -> np.ndarray:
        """(D, K) symmetric-α θ (reference LocalLDA.py:116-119)."""
        th = theta_from_counts(self.counts.n_dk, self.labs, self.a)
        return np.asarray(th[:, : self.K])

    # ------------------------------------------------------------ diagnostics

    def print_topwords(self, n: int = 10):
        """Top-n words per topic (reference LocalLDA.py:121-130)."""
        ph = self.get_phi()
        topiclist = []
        for k in range(self.K):
            idx = np.argsort(-ph[k])[:n]
            topiclist.append([str(k)] + [self.v_to_w[int(v)] for v in idx])
        print(topiclist)
        return topiclist

    def perplexity(self) -> float:
        phi = phi_from_counts(self.counts.n_vk, self.counts.n_k, self.b, self.topic_mask)
        th = theta_from_counts(self.counts.n_dk, self.labs, self.a)
        ll, n = log_likelihood(th, phi, self.tok_v, self.tok_f)
        return float(np.exp(-ll / max(int(n), 1)))
