"""HSLDA — Hierarchically Supervised LDA (Perotte '11), TPU-native.

Reference: HSLDA.py:82-394.  K latent topics + per-label probit regression on
the empirical topic mixture z̄, hierarchy-aware via sign-constrained
truncated-normal auxiliary variables ``a``; blocked Gibbs over five variable
groups z → η → a → m → β (HSLDA.py:312-317).

TPU-native structure: the z-sweep is ops/hslda_gibbs.hslda_z_sweep (position-
major parallel scan, probit coupling as MXU matmuls); the linear-model blocks
are dense jnp — Cholesky-factor multivariate-normal draws for η, vectorised
inverse-CDF truncated normals for ``a``, Gumbel-max Antoniak draws over a
log-space Stirling table for ``m``, Gamma-normalised Dirichlet for β.

Deliberate deviations from the reference (documented, SURVEY.md §2):
* ``sample_m`` draws the auxiliary table-count *index* m ∈ {0..n} from
  p(m) ∝ s(n, m)·(αβ_k)^m.  The reference draws ``np.random.choice(m_probs)``
  — a probability *value*, not an index (HSLDA.py:308) — and feeds the mean
  (not the sum) of those values into the Dirichlet update.  We use the
  correct Antoniak draw; ``mdot`` keeps the reference's mean-over-documents
  scaling so β stays on the same concentration scale.
* the reference labelmap maps both ``''`` (root) and the first corpus label
  to id 0, leaving a dead trailing dimension (HSLDA.py:86-87); here root
  ``''`` is id 0 and real labels occupy 1..L-1.
* test-time thinned averaging runs once per iteration; the reference's check
  sits inside the token loop (HSLDA.py:367-374), over-weighting early tokens.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.encode import binarize_labels, build_labelmap, encode_instances
from ..ops.gibbs import foldin_sweep
from ..ops.hslda_gibbs import hslda_init_counts, hslda_z_sweep
from ..ops.sampling import gumbel_argmax, stirling_table, truncated_normal

__all__ = ["HSLDA"]


def _norm_cdf(x):
    return 0.5 * (1.0 + jax.scipy.special.erf(x / np.sqrt(2.0)))


@partial(jax.jit, static_argnames=("opt", "gamma", "xi"))
def _train_cycle(key, counts, tok_v, mask, labs, eta, a, beta,
                 stirling_logs, mu, sigma, aprime, alpha, gamma: float, xi: float,
                 opt: int, lab_pos_ids=None, lab_pos_valid=None):
    """One full blocked-Gibbs cycle z → η → a → m → β (HSLDA.py:312-317)."""
    D, L = labs.shape
    K = counts.n_dk.shape[1]
    k_z, k_eta, k_a, k_m, k_beta = jax.random.split(key, 5)

    # ---- z (HSLDA.py:171-272)
    counts, _ = hslda_z_sweep(
        k_z, counts, tok_v, mask, labs, eta, a,
        alpha_beta=alpha * beta, gamma=gamma, xi=xi, opt=opt,
        lab_pos_ids=lab_pos_ids, lab_pos_valid=lab_pos_valid,
    )
    n_d = jnp.maximum(mask.sum(axis=1), 1).astype(jnp.float32)
    zbar = counts.n_dk.astype(jnp.float32) / n_d[:, None]  # (D, K)

    # ---- η: Bayesian regression posterior (HSLDA.py:274-287)
    sig_inv = jnp.eye(K) / sigma + zbar.T @ zbar  # (K, K) precision
    chol_prec = jnp.linalg.cholesky(sig_inv)
    raw_mean = mu / sigma + zbar.T @ a  # (K, L)
    # μ̂ = Σ̂ raw_mean via two triangular solves
    tmp = jax.scipy.linalg.solve_triangular(chol_prec, raw_mean, lower=True)
    mu_hat = jax.scipy.linalg.solve_triangular(chol_prec.T, tmp, lower=False)
    # draw: η_l = μ̂_l + Σ̂^{1/2} ε, with Σ̂^{1/2} = chol_prec^{-T}
    eps = jax.random.normal(k_eta, (K, L))
    eta_new = (
        mu_hat + jax.scipy.linalg.solve_triangular(chol_prec.T, eps, lower=False)
    ).T  # (L, K)

    # ---- a: sign-constrained truncated normals (HSLDA.py:289-292)
    mean_a = zbar @ eta_new.T  # (D, L)
    lo = jnp.where(labs > 0, 0.0, -jnp.inf)
    hi = jnp.where(labs > 0, jnp.inf, 0.0)
    a_new = truncated_normal(k_a, lo, hi, loc=mean_a, scale=1.0)

    # ---- m: Antoniak table counts (HSLDA.py:298-310, index-draw fix).
    # Drawn in document blocks so the (·, K, S) Stirling-logit transient
    # stays bounded at real-corpus scale (D≈4.2k, S up to the longest doc).
    S = stirling_logs.shape[0]
    log_ab = jnp.log(jnp.maximum(alpha * beta, 1e-38))  # (K,)
    n_clip = jnp.minimum(counts.n_dk, S - 1)  # (D, K) clipped to the table
    marange = jnp.arange(S, dtype=jnp.float32)
    D_BLOCK = 512
    Dp = ((D + D_BLOCK - 1) // D_BLOCK) * D_BLOCK
    n_pad = jnp.pad(n_clip, ((0, Dp - D), (0, 0)))
    m_blocks = []
    for g in range(Dp // D_BLOCK):
        nb = n_pad[g * D_BLOCK : (g + 1) * D_BLOCK]
        logits = (
            stirling_logs[nb]  # (D_BLOCK, K, S) log s(n, m), -inf above n
            + marange[None, None, :] * log_ab[None, :, None]
        )
        m_blocks.append(
            gumbel_argmax(jax.random.fold_in(k_m, g), logits, axis=2)
        )
    m_aux = jnp.concatenate(m_blocks, axis=0)[:D]  # (D, K) table counts
    mdot = m_aux.astype(jnp.float32).mean(axis=0)  # reference scaling (HSLDA.py:310)

    # ---- β ~ Dir(mdot + α') (HSLDA.py:294-296)
    g = jax.random.gamma(k_beta, mdot + aprime)
    beta_new = g / g.sum()

    return counts, eta_new, a_new, beta_new, zbar, mean_a


@partial(jax.jit, static_argnames=("opt", "gamma", "xi", "iters", "thinning"))
def _train_loop_hslda(key, counts, eta, a, beta, ph_hat, th_hat, n_saves,
                      start, tok_v, mask, labs, stirling_logs,
                      lab_pos_ids, lab_pos_valid, mu, sigma, aprime, alpha,
                      gamma: float, xi: float, opt: int,
                      iters: int, thinning: int):
    """Whole-run training loop: ``iters`` blocked-Gibbs cycles in ONE
    dispatch (round-5 VERDICT item 3 — the per-cycle dispatch loop paid
    ~0.4 s of tunnel overhead per cycle, a large fraction of the 7–18 s
    warm wall).  Mirrors parallel/hslda_sharded.make_hslda_train_loop:

    * chunk-invariant RNG — cycle i of the run draws from
      ``fold_in(key, start + i)``, so a chunked / checkpointed / resumed
      run is bit-identical to an uninterrupted one;
    * thinned φ̂/z̄ running means fold in on save-block boundaries inside
      the scan.  They accumulate in float32 (the host path they replace
      used float64), a documented sub-1e-6-scale drift — same note as the
      sharded loop.
    """
    n_blocks = iters // thinning
    rem = iters - n_blocks * thinning
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        start + jnp.arange(max(iters, 1), dtype=jnp.int32))
    n_d = jnp.maximum(mask.sum(axis=1), 1).astype(jnp.float32)

    def one_cycle(st, k):
        counts, eta, a, beta = st
        counts, eta, a, beta, _, _ = _train_cycle(
            k, counts, tok_v, mask, labs, eta, a, beta, stirling_logs,
            mu, sigma, aprime, alpha, gamma=gamma, xi=xi, opt=opt,
            lab_pos_ids=lab_pos_ids, lab_pos_valid=lab_pos_valid,
        )
        return (counts, eta, a, beta), None

    def cur_estimates(counts):
        n_kv = counts.n_vk.astype(jnp.float32).T  # (K, V) unsmoothed
        cur_ph = n_kv / jnp.maximum(n_kv.sum(axis=1, keepdims=True), 1.0)
        cur_th = counts.n_dk.astype(jnp.float32) / n_d[:, None]
        return cur_ph, cur_th

    def save_block(carry, block_keys):
        st, ph, th, s = carry
        st, _ = jax.lax.scan(one_cycle, st, block_keys)
        cur_ph, cur_th = cur_estimates(st[0])
        s = s + 1
        f = s.astype(jnp.float32)
        ph = jnp.where(f <= 1.0, cur_ph, (f - 1.0) / f * ph + cur_ph / f)
        th = jnp.where(f <= 1.0, cur_th, (f - 1.0) / f * th + cur_th / f)
        return (st, ph, th, s), None

    carry = ((counts, eta, a, beta), ph_hat, th_hat, n_saves)
    if n_blocks:
        carry, _ = jax.lax.scan(
            save_block, carry,
            keys[: n_blocks * thinning].reshape(n_blocks, thinning, 2))
    (counts, eta, a, beta), ph_hat, th_hat, n_saves = carry
    if rem:
        (counts, eta, a, beta), _ = jax.lax.scan(
            one_cycle, (counts, eta, a, beta),
            keys[n_blocks * thinning : iters])
    return counts, eta, a, beta, ph_hat, th_hat, n_saves


@partial(jax.jit, static_argnames=("it", "thinning"))
def _test_loop(key, tok_v, mask, init_phi, sweep_phi, alpha_beta,
               it: int, thinning: int):
    """Batched fold-in for held-out docs (HSLDA.py:335-374): init z from the
    thinned φ̂, then frozen-φ sweeps with per-iteration thinned z̄ averaging."""
    D, N = tok_v.shape
    K = init_phi.shape[1]
    k_init, k_sweeps = jax.random.split(key)
    n_d = jnp.maximum(mask.sum(axis=1), 1).astype(jnp.float32)

    uniforms = jax.random.uniform(k_init, (N, D), dtype=jnp.float32)
    mF = mask.astype(jnp.float32)

    def init_step(n_dk, xs):
        v, mf, u = xs
        c = jnp.cumsum(init_phi[v], axis=1)
        z = jnp.sum(c < (u * c[:, -1])[:, None], axis=1).astype(jnp.int32)
        n_dk = n_dk + mf[:, None] * jax.nn.one_hot(z, K, dtype=jnp.float32)
        return n_dk, z

    n_dk, z_t = jax.lax.scan(
        init_step, jnp.zeros((D, K), jnp.float32), (tok_v.T, mF.T, uniforms)
    )
    z = z_t.T

    save = (jnp.arange(it, dtype=jnp.int32) + 1) % thinning == 0
    keys = jax.random.split(k_sweeps, it)

    def body(carry, xs):
        z, n_dk, avg, s = carry
        k_i, save_i = xs
        z, n_dk = foldin_sweep(k_i, z, n_dk, tok_v, mask, sweep_phi, alpha_beta)

        def on_save(_):
            cur = n_dk.astype(jnp.float32) / n_d[:, None]
            s2 = s + 1
            f = s2.astype(jnp.float32)
            return jnp.where(f <= 1.0, cur, (f - 1.0) / f * avg + cur / f), s2

        avg, s = jax.lax.cond(save_i, on_save, lambda _: (avg, s), None)
        return (z, n_dk, avg, s), None

    (z, n_dk, avg, _), _ = jax.lax.scan(
        body, (z, n_dk, jnp.zeros((D, K), jnp.float32), jnp.int32(0)), (keys, save)
    )
    return avg


class HSLDA:
    """Hierarchically supervised LDA with probit label cascade."""

    def __init__(
        self,
        docs: Sequence[Sequence[str]],
        labs: Sequence[Sequence[str]],
        labelset: Sequence[str],
        k: int = 15,
        alpha_prime: float = 1.0,
        alpha: float = 1.0,
        gamma: float = 1.0,
        mu: float = 0.0,
        sigma: float = 1.0,
        xi: float = 0.0,
        seed: int = 0,
    ):
        self.K = int(k)
        self.aprime = float(alpha_prime)
        self.alpha = float(alpha)
        self.gamma = float(gamma)
        self.mu = float(mu)
        self.sigma = float(sigma)
        self.xi = float(xi)

        # root '' at id 0 (reference HSLDA.py:86-87; see module docstring)
        self.labelmap: Dict[str, int] = build_labelmap(labelset, root="")
        self.lablist = list(self.labelmap.keys())
        self.L = len(self.labelmap)

        # growing vocabulary over token instances (HSLDA.py:102,162-169)
        self.w_to_v: Dict[str, int] = {}
        docs_ids = [[self._term_to_id(t) for t in doc] for doc in docs]
        self.v_to_w = {v: w for w, v in self.w_to_v.items()}
        self.V = len(self.w_to_v)
        self.D = len(docs)

        tok_v, mask = encode_instances(docs_ids)
        self.tok_v = jnp.asarray(tok_v)
        self.mask = jnp.asarray(mask)
        lab_mask_np = binarize_labels(labs, self.labelmap)
        self.labs = jnp.asarray(lab_mask_np)
        # compact positive-label layout for the opt=2 sparse Φ coupling
        from ..data.encode import compact_labels as _compact

        _ids, _valid = _compact(np.asarray(lab_mask_np))
        self._lab_pos_ids = jnp.asarray(_ids)
        self._lab_pos_valid = jnp.asarray(_valid)

        # label-tree parent map (HSLDA.py:139-142)
        self.child_to_parent = {
            self.labelmap[x]: self.labelmap.get(x[:-1], 0)
            for x in labelset if x in self.labelmap
        }

        self._key = jax.random.PRNGKey(seed)
        ks = jax.random.split(self._key, 6)
        self._key = ks[0]

        # priors and initial state (HSLDA.py:109-137)
        self.eta = self.mu + jax.random.normal(ks[1], (self.L, self.K))
        g = jax.random.gamma(ks[2], jnp.full((self.K,), self.aprime))
        self.beta = g / g.sum()
        g = jax.random.gamma(ks[3], jnp.broadcast_to(self.alpha * self.beta, (self.D, self.K)))
        theta0 = g / jnp.maximum(g.sum(axis=1, keepdims=True), 1e-38)
        self.counts = hslda_init_counts(ks[4], self.tok_v, self.mask, theta0, self.V)

        n_d = jnp.maximum(self.mask.sum(axis=1), 1).astype(jnp.float32)
        zbar = self.counts.n_dk.astype(jnp.float32) / n_d[:, None]
        mean_a = zbar @ self.eta.T
        lo = jnp.where(self.labs > 0, 0.0, -jnp.inf)
        hi = jnp.where(self.labs > 0, jnp.inf, 0.0)
        self.a = truncated_normal(ks[5], lo, hi, loc=mean_a, scale=1.0)

        # Stirling table in log space (reference caps at 150, HSLDA.py:144;
        # here sized to the longest document so it never needs regrowing)
        max_n = int(np.asarray(self.mask.sum(axis=1)).max()) + 2
        table = stirling_table(max(max_n, 8))
        with np.errstate(divide="ignore"):
            self._stirling_logs = jnp.asarray(np.log(table), jnp.float32)

        self.ph: Optional[np.ndarray] = None  # thinned (K, V) φ̂
        self.th: Optional[np.ndarray] = None  # thinned (D, K) z̄

        # chunk-invariant RNG for the whole-run training loop: cycle i of
        # the run draws from fold_in(master, i) with i counted globally, so
        # chunked/checkpointed runs are bit-identical to uninterrupted ones
        # (same scheme/constant as parallel/hslda_trainer.DistributedHSLDA)
        self._master_key = jax.random.fold_in(self._key, 0x45D)
        self._cycles_done = 0

    def _term_to_id(self, term: str) -> int:
        tid = self.w_to_v.get(term)
        if tid is None:
            tid = len(self.w_to_v)
            self.w_to_v[term] = tid
        return tid

    # ------------------------------------------------------------------ train

    def get_zbar(self) -> np.ndarray:
        n_d = np.maximum(np.asarray(self.mask.sum(axis=1)), 1)
        return np.asarray(self.counts.n_dk) / n_d[:, None]

    def get_ph(self) -> np.ndarray:
        n_kv = np.asarray(self.counts.n_vk).T  # (K, V)
        den = n_kv.sum(axis=1, keepdims=True)
        return n_kv / np.maximum(den, 1)

    def run_training(self, it: int = 25, thinning: int = 5, opt: int = 1,
                     continue_avg: bool = False) -> None:
        """Blocked-Gibbs cycles with thinned φ̂/z̄ averaging (HSLDA.py:312-333)
        — ONE whole-run jitted dispatch per ≤10-cycle chunk
        (:func:`_train_loop_hslda`; the round-4 per-cycle dispatch loop paid
        ~0.4 s of tunnel overhead × cycles, round-5 VERDICT item 3).

        ``continue_avg=True`` carries the thinned means across calls (for
        checkpointed / chunked training); the default restarts them each
        call, as the reference's per-call local counter does.  Chunked /
        resumed runs are bit-identical to uninterrupted ones with the same
        call structure (chunk-invariant cycle RNG).
        """
        from ..parallel._util import dispatch_chunks

        it, thinning = int(it), int(thinning)
        if continue_avg and self.ph is not None:
            s = jnp.int32(int(getattr(self, "_avg_s", 0)))
            ph = jnp.asarray(self.ph, jnp.float32)
            th = jnp.asarray(self.th, jnp.float32)
        else:
            s = jnp.int32(0)
            ph = jnp.zeros((self.K, self.V), jnp.float32)
            th = jnp.zeros((self.D, self.K), jnp.float32)
        counts, eta, a, beta = self.counts, self.eta, self.a, self.beta
        # bounded dispatch chunks aligned to thinning (the tunnelled
        # compiler chokes on monolithic multi-cycle scans; bit-identical to
        # one dispatch by the cycle-counter RNG — same structure as
        # parallel/hslda_trainer.DistributedHSLDA.run_training)
        for step in dispatch_chunks(it, thinning, limit=10):
            counts, eta, a, beta, ph, th, s = _train_loop_hslda(
                self._master_key, counts, eta, a, beta, ph, th, s,
                jnp.int32(self._cycles_done), self.tok_v, self.mask,
                self.labs, self._stirling_logs, self._lab_pos_ids,
                self._lab_pos_valid, self.mu, self.sigma, self.aprime,
                self.alpha, gamma=self.gamma, xi=self.xi, opt=int(opt),
                iters=step, thinning=thinning,
            )
            self._cycles_done += step
        jax.block_until_ready(counts)
        self.counts, self.eta, self.a, self.beta = counts, eta, a, beta
        self._avg_s = int(s)
        if self._avg_s:
            self.ph = np.asarray(ph)
            self.th = np.asarray(th)

    # ------------------------------------------------------------------- test

    def _encode_test(self, newdocs: Sequence[Sequence[str]]):
        ids = [
            [self.w_to_v[t] for t in doc if t in self.w_to_v] for doc in newdocs
        ]
        tok_v, mask = encode_instances(ids)
        return jnp.asarray(tok_v), jnp.asarray(mask)

    def run_tests(self, newdocs: Sequence[Sequence[str]], it: int = 250, s: int = 25) -> np.ndarray:
        """Label probabilities Φ(η·z̄ − ξ) for a batch of held-out docs
        (reference run_test/run_tests, HSLDA.py:346-394), all docs in parallel."""
        tok_v, mask = self._encode_test(newdocs)
        ph = self.ph if self.ph is not None else self.get_ph()
        init_phi = jnp.asarray(np.ascontiguousarray(ph.T), jnp.float32)  # (V, K)
        sweep = np.asarray(self.counts.n_vk).astype(np.float64) + self.gamma  # (V, K)
        sweep = sweep / sweep.sum(axis=0, keepdims=True)
        sweep_phi = jnp.asarray(sweep, jnp.float32)

        self._key, k = jax.random.split(self._key)
        zbar = _test_loop(
            k, tok_v, mask, init_phi, sweep_phi,
            alpha_beta=self.alpha * self.beta, it=int(it), thinning=int(s),
        )
        mean_a = np.asarray(zbar) @ np.asarray(self.eta).T - self.xi
        return np.asarray(_norm_cdf(jnp.asarray(mean_a)))

    def run_test(self, newdoc, it: int = 250, s: int = 25) -> np.ndarray:
        return self.run_tests([newdoc], it=it, s=s)[0]

    # ------------------------------------------------------------ diagnostics

    def display_topics(self, n: int = 10) -> List[List[str]]:
        ph = self.ph if self.ph is not None else self.get_ph()
        top_v = np.argsort(-ph)[:, :n]
        return [[self.v_to_w[int(v)] for v in top] for top in top_v]

    def label_predictions(self, probs: np.ndarray):
        return sorted(zip(probs.tolist(), self.lablist))[::-1]
