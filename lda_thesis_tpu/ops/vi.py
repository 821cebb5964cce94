"""Variational inference kernels for (labeled) LDA — CAVI and SVI.

The deterministic alternative inference path (BASELINE.json north star; the
reference has no VI).  Mean-field family q(θ_d)=Dir(γ_d), q(β_k)=Dir(λ_k),
q(z_dn)=Cat(r_dn) with the label-constrained prior α_dk = α·lab_dk —
responsibilities are masked exactly like the collapsed sampler's posterior
(reference math at LabeledLDA.py:113-117; Blei et al. '03 updates).

TPU formulation: the (D, U, K) responsibility tensor is never materialised —
a ``lax.scan`` over the U type positions computes r one (D, K) slice at a
time, accumulating the γ and λ sufficient statistics (and the ELBO's token
terms) on the fly.  Everything is dense f32; no transcendental besides the
digammas hoisted out of the scan.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ["VIState", "vi_init", "cavi_step", "svi_epoch", "elbo"]

_digamma = jax.scipy.special.digamma
_lgamma = jax.scipy.special.gammaln


class VIState(NamedTuple):
    gamma: jax.Array  # (D, K) doc-topic Dirichlet params
    lam: jax.Array  # (V, K) topic-word Dirichlet params


def vi_init(labs: jax.Array, V: int, alpha: float, beta: float, key=None) -> VIState:
    """γ = prior + tokens/K heuristic start; λ = β + small noise."""
    D, K = labs.shape
    gamma = labs * alpha + labs
    lam = jnp.full((V, K), beta, jnp.float32) + 0.5
    if key is not None:
        lam = lam + jax.random.uniform(key, (V, K), minval=0.0, maxval=0.5)
    return VIState(gamma=gamma, lam=lam)


def _expect_logs(state: VIState, labs, alpha: float):
    """E[log θ] (masked) and E[log β] from the current variational params."""
    gamma = state.gamma
    el_theta = _digamma(gamma) - _digamma(gamma.sum(axis=1, keepdims=True))
    el_theta = jnp.where(labs > 0, el_theta, -jnp.inf)  # hard label constraint
    el_beta = _digamma(state.lam) - _digamma(state.lam.sum(axis=0, keepdims=True))
    return el_theta, el_beta


def _accumulate(tok_v, tok_f, el_theta, el_beta, V: int):
    """Scan over type positions: responsibilities → (γ stats, λ stats, ELBO tokens)."""
    D, K = el_theta.shape
    fF = tok_f.astype(jnp.float32)

    def step(carry, xs):
        g_acc, l_acc, tok_elbo = carry
        v, ff = xs  # (D,)
        s = el_theta + el_beta[v]  # (D, K)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.where(jnp.isfinite(s), jnp.exp(s - m), 0.0)
        denom = e.sum(axis=1, keepdims=True)
        r = e / jnp.maximum(denom, 1e-38)  # (D, K) responsibilities
        fr = ff[:, None] * r
        g_acc = g_acc + fr
        l_acc = l_acc.at[v].add(fr)
        # Σ f·(Σ_k r·s − Σ_k r·log r) = Σ f·logsumexp(s)  (standard identity)
        lse = (m[:, 0] + jnp.log(jnp.maximum(denom[:, 0], 1e-38)))
        tok_elbo = tok_elbo + jnp.sum(ff * jnp.where(ff > 0, lse, 0.0))
        return (g_acc, l_acc, tok_elbo), None

    carry0 = (
        jnp.zeros((D, K), jnp.float32),
        jnp.zeros((V, K), jnp.float32),
        jnp.float32(0.0),
    )
    (g_acc, l_acc, tok_elbo), _ = jax.lax.scan(step, carry0, (tok_v.T, fF.T))
    return g_acc, l_acc, tok_elbo


@partial(jax.jit, static_argnames=("alpha", "beta"))
def cavi_step(
    state: VIState,
    tok_v: jax.Array,
    tok_f: jax.Array,
    labs: jax.Array,
    alpha: float,
    beta: float,
) -> Tuple[VIState, jax.Array]:
    """One full CAVI iteration; returns (new state, ELBO of the new state).

    Batch coordinate ascent: r given (γ, λ); then γ = α·lab + Σ f·r and
    λ = β + Σ f·r jointly.  ELBO is non-decreasing across iterations.
    """
    V = state.lam.shape[0]
    el_theta, el_beta = _expect_logs(state, labs, alpha)
    g_stats, l_stats, tok_elbo = _accumulate(tok_v, tok_f, el_theta, el_beta, V)
    new = VIState(gamma=labs * alpha + g_stats, lam=beta + l_stats)
    return new, elbo(new, tok_v, tok_f, labs, alpha, beta)


def _gamma_stats(tok_v, tok_f, el_theta, el_beta):
    """γ sufficient statistics only (no (V, K) λ accumulator) — the cheap
    inner kernel of the SVI local iterations."""
    fF = tok_f.astype(jnp.float32)

    def step(g_acc, xs):
        v, ff = xs
        s = el_theta + el_beta[v]
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.where(jnp.isfinite(s), jnp.exp(s - m), 0.0)
        r = e / jnp.maximum(e.sum(axis=1, keepdims=True), 1e-38)
        return g_acc + ff[:, None] * r, None

    g_acc, _ = jax.lax.scan(
        step, jnp.zeros_like(el_theta), (tok_v.T, fF.T))
    return g_acc


@partial(jax.jit, static_argnames=("alpha", "beta", "batch_size",
                                   "local_iters", "tau", "kappa"))
def svi_epoch(
    key: jax.Array,
    state: VIState,
    tok_v: jax.Array,
    tok_f: jax.Array,
    labs: jax.Array,
    alpha: float,
    beta: float,
    t0: jax.Array,
    batch_size: int,
    local_iters: int = 1,
    tau: float = 1.0,
    kappa: float = 0.8,
) -> VIState:
    """One stochastic-VI epoch (Hoffman '13): shuffled minibatches, the
    LOCAL variational parameters γ iterated ``local_iters`` times per batch
    (λ fixed) before the natural-gradient global step
    λ ← (1−ρ_t)λ + ρ_t·λ̂ with minibatch-scaled sufficient statistics.

    Two round-3 defects fixed here (round-4 VERDICT item 5):

    * the schedule counts GLOBAL minibatch updates, ρ_t = (τ₀ + t)^−κ with
      ``t0`` = updates already taken — the round-3 variant held one
      per-epoch ρ fixed across all batches of the epoch, so epoch 0 ran
      every batch at ρ=1 (each batch fully *replacing* λ);
    * γ is optimised for ``local_iters`` inner iterations per batch (warm-
      started from its previous visit) before each global step.

    Defaults mirror the swept winners baked into
    ``LabeledLDAVI.fit_svi`` (benchmarks/svi_sweep.py: local_iters=1,
    τ₀=1, κ=0.8 → AUC 0.9036/0.9091/0.8945 at depths 1/2/3) — round-5
    ADVICE: the old defaults here (8, 64.0) were a known-bad schedule on
    this corpus (τ₀≥64 starves λ of early signal, AUC ~0.55), so a direct
    ``svi_epoch`` caller now gets the tuned schedule too.

    Returns the updated state; the caller advances its counter by the
    number of batches per epoch (``D // batch_size``)."""
    D = tok_v.shape[0]
    V = state.lam.shape[0]
    n_batches = D // batch_size
    perm = jax.random.permutation(key, D)[: n_batches * batch_size]
    batches = perm.reshape(n_batches, batch_size)

    def one_batch(carry, idx):
        state, t = carry
        rho = (tau + t.astype(jnp.float32)) ** jnp.float32(-kappa)
        bv, bf, bl = tok_v[idx], tok_f[idx], labs[idx]
        el_beta = _digamma(state.lam) - _digamma(
            state.lam.sum(axis=0, keepdims=True))

        def local(gamma_b, _):
            el_theta = _digamma(gamma_b) - _digamma(
                gamma_b.sum(axis=1, keepdims=True))
            el_theta = jnp.where(bl > 0, el_theta, -jnp.inf)
            return bl * alpha + _gamma_stats(bv, bf, el_theta, el_beta), None

        gamma_b, _ = jax.lax.scan(local, state.gamma[idx], None,
                                  length=max(int(local_iters) - 1, 0))
        # final local pass also collects the λ statistics
        el_theta = _digamma(gamma_b) - _digamma(
            gamma_b.sum(axis=1, keepdims=True))
        el_theta = jnp.where(bl > 0, el_theta, -jnp.inf)
        g_stats, l_stats, _ = _accumulate(bv, bf, el_theta, el_beta, V)
        gamma = state.gamma.at[idx].set(bl * alpha + g_stats)
        lam_hat = beta + (D / batch_size) * l_stats
        lam = (1.0 - rho) * state.lam + rho * lam_hat
        return (VIState(gamma=gamma, lam=lam), t + 1), None

    (state, _), _ = jax.lax.scan(one_batch, (state, t0), batches)
    return state


@partial(jax.jit, static_argnames=("alpha", "beta"))
def elbo(
    state: VIState,
    tok_v: jax.Array,
    tok_f: jax.Array,
    labs: jax.Array,
    alpha: float,
    beta: float,
) -> jax.Array:
    """Evidence lower bound of the current variational state (masked dims of
    θ are treated as absent — their γ is 0 by construction)."""
    gamma, lam = state
    V, K = lam.shape
    el_theta, el_beta = _expect_logs(state, labs, alpha)
    el_theta_f = jnp.where(labs > 0, el_theta, 0.0)

    # token term: Σ f·logsumexp(Elogθ + Elogβ[v]) (computed in the scan)
    _, _, tok_elbo = _accumulate(tok_v, tok_f, el_theta, el_beta, V)

    # E[log p(θ|α)] − E[log q(θ|γ)] over admissible topics
    a_mat = labs * alpha
    n_lab = labs.sum(axis=1)
    theta_prior = (
        _lgamma(jnp.maximum(alpha * n_lab, 1e-38))
        - n_lab * _lgamma(jnp.float32(alpha))
        + jnp.sum((a_mat - labs) * el_theta_f, axis=1)
    )
    g_safe = jnp.where(labs > 0, gamma, 1.0)
    theta_q = (
        _lgamma(jnp.maximum(gamma.sum(axis=1), 1e-38))
        - jnp.sum(labs * _lgamma(g_safe), axis=1)
        + jnp.sum((gamma - labs) * el_theta_f, axis=1)
    )

    # E[log p(β|η)] − E[log q(β|λ)]
    beta_prior = (
        _lgamma(jnp.float32(V * beta)) - V * _lgamma(jnp.float32(beta))
        + jnp.sum((beta - 1.0) * el_beta, axis=0)
    )
    beta_q = (
        _lgamma(lam.sum(axis=0)) - jnp.sum(_lgamma(lam), axis=0)
        + jnp.sum((lam - 1.0) * el_beta, axis=0)
    )

    return (
        tok_elbo
        + jnp.sum(theta_prior - theta_q)
        + jnp.sum(beta_prior - beta_q)
    )
