"""Labeled LDA trained by variational inference (CAVI or SVI).

Drop-in alternative to the collapsed-Gibbs :class:`LabeledLDA` — same
constructor and estimator surface, deterministic optimisation instead of
sampling.  ``fit()`` runs batch CAVI (monotone ELBO); ``fit_svi()`` runs
stochastic VI with a Robbins-Monro step-size schedule for corpora that do
not fit a single batch.  Held-out inference reuses the same CAVI machinery
with λ frozen.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.encode import binarize_labels, build_labelmap, encode_bow_types
from ..ops.vi import VIState, cavi_step, elbo, svi_epoch, vi_init

__all__ = ["LabeledLDAVI"]


class LabeledLDAVI:
    """Label-constrained LDA with mean-field variational inference."""

    def __init__(
        self,
        docs: Sequence[Sequence[str]],
        labs: Sequence[Sequence[str]],
        labelset: Sequence[str],
        dicti,
        alpha: float,
        beta: float,
        seed: int = 0,
        k_pad: int = 128,
    ):
        self.alpha = float(alpha)
        self.beta = float(beta)
        self.dicti = dicti
        self.labelmap = build_labelmap(labelset)
        self.K = len(self.labelmap)
        self.V = len(dicti)
        self.D = len(docs)
        self.v_to_w = dicti.id2token

        bows = [dicti.doc2bow(doc) for doc in docs]
        tok_v, tok_f = encode_bow_types(bows)
        lab_mask = binarize_labels(labs, self.labelmap)

        self.Kp = ((self.K + k_pad - 1) // k_pad) * k_pad
        lab_mask = np.pad(lab_mask, ((0, 0), (0, self.Kp - self.K)))
        self.tok_v = jnp.asarray(tok_v)
        self.tok_f = jnp.asarray(tok_f)
        self.labs = jnp.asarray(lab_mask)

        self._key = jax.random.PRNGKey(seed)
        self._key, k0 = jax.random.split(self._key)
        self.state = vi_init(self.labs, self.V, self.alpha, self.beta, key=k0)
        self.elbo_history: List[float] = []

    # ------------------------------------------------------------------ train

    def fit(self, iters: int = 50, tol: float = 1e-4) -> None:
        """Batch CAVI until ``iters`` or relative-ELBO convergence."""
        prev = -np.inf
        for _ in range(int(iters)):
            self.state, e = cavi_step(
                self.state, self.tok_v, self.tok_f, self.labs,
                self.alpha, self.beta,
            )
            e = float(e)
            self.elbo_history.append(e)
            if np.isfinite(prev) and abs(e - prev) <= tol * abs(prev):
                break
            prev = e

    def fit_svi(
        self,
        epochs: int = 60,
        batch_size: int = 2048,
        tau: float = 1.0,
        kappa: float = 0.8,
        local_iters: int = 1,
    ) -> None:
        """Stochastic VI (Hoffman '13): ρ_t = (τ₀ + t)^−κ per GLOBAL
        minibatch update (the round-3 variant held one per-epoch ρ across
        all batches of the epoch — the dominant defect), ``local_iters``
        inner γ iterations per batch.

        Defaults are the measured winner of benchmarks/svi_sweep.py on the
        abstracts corpus (AUC 0.9036 / 0.9091 / 0.8945 at depths 1/2/3 vs
        CAVI's 0.9020 / 0.9039 / 0.8979).  Sweep findings worth knowing:
        large τ₀ (≥64) starves λ of early signal on this corpus size
        (AUC collapses to ~0.55), and ``local_iters=1`` with γ warm-started
        across epochs beats within-batch γ convergence — the hard label
        masks leave γ little freedom, so aggressive early global steps are
        what locks λ onto the label co-occurrence structure."""
        batch_size = min(batch_size, self.D)
        n_batches = max(self.D // batch_size, 1)
        for t in range(int(epochs)):
            self._key, k = jax.random.split(self._key)
            self.state = svi_epoch(
                k, self.state, self.tok_v, self.tok_f, self.labs,
                self.alpha, self.beta, jnp.int32(t * n_batches), batch_size,
                local_iters=int(local_iters), tau=float(tau),
                kappa=float(kappa),
            )
        # one clean full CAVI pass: refreshes γ for every document (the
        # truncated epoch permutations leave some docs an epoch stale) and
        # the recorded ELBO belongs to the state we actually keep
        self.state, e = cavi_step(
            self.state, self.tok_v, self.tok_f, self.labs, self.alpha, self.beta
        )
        self.elbo_history.append(float(e))

    # ------------------------------------------------------------ estimators

    def get_phi(self) -> np.ndarray:
        """(K, V) posterior-mean topic-word distribution."""
        lam = np.asarray(self.state.lam[:, : self.K])
        return (lam / lam.sum(axis=0, keepdims=True)).T

    def get_theta(self) -> np.ndarray:
        """(D, K) posterior-mean doc-topic distribution (masked)."""
        g = np.asarray(self.state.gamma[:, : self.K])
        return g / np.maximum(g.sum(axis=1, keepdims=True), 1e-38)

    # ------------------------------------------------------------------- test

    def infer(self, newdocs: Sequence[Sequence[str]], iters: int = 50) -> np.ndarray:
        """Fold-in θ̂ for held-out docs: CAVI on γ with λ frozen, labels free
        (all topics admissible — mirrors the Gibbs fold-in's unconstrained
        test inference, LabeledLDA.py:185-194)."""
        bows = [self.dicti.doc2bow(doc) for doc in newdocs]
        tok_v, tok_f = encode_bow_types(bows)
        tok_v, tok_f = jnp.asarray(tok_v), jnp.asarray(tok_f)
        n = tok_v.shape[0]
        mask = np.zeros((n, self.Kp), np.float32)
        mask[:, : self.K] = 1.0
        mask = jnp.asarray(mask)

        sub = VIState(gamma=mask * self.alpha + mask, lam=self.state.lam)
        for _ in range(int(iters)):
            new, _ = cavi_step(sub, tok_v, tok_f, mask, self.alpha, self.beta)
            # freeze λ: keep only the γ update
            sub = VIState(gamma=new.gamma, lam=self.state.lam)
        g = np.asarray(sub.gamma[:, : self.K])
        return g / np.maximum(g.sum(axis=1, keepdims=True), 1e-38)

    # ------------------------------------------------------------ diagnostics

    def perplexity(self) -> float:
        theta = jnp.asarray(self.get_theta())
        phi_vk = jnp.asarray(self.get_phi().T)
        from ..ops.gibbs import log_likelihood

        ll, ntok = log_likelihood(theta, phi_vk, self.tok_v, self.tok_f)
        return float(np.exp(-float(ll) / max(int(ntok), 1)))

    def topwords_per_topic(self, topwords: int = 10):
        ph = self.get_phi()
        labels = list(self.labelmap.keys())
        out = []
        for k in range(self.K):
            idx = np.argsort(-ph[k])[:topwords]
            out.append([labels[k]] + [self.v_to_w[int(v)] for v in idx])
        return out
