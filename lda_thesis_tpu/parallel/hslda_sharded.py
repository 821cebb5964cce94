"""SPMD HSLDA: many chains × sharded documents over a ``(chains, data)`` mesh.

The north-star scaling configuration (BASELINE.json): ≥64 independent HSLDA
chains over multiple hosts with ``psum`` count merges.  Per blocked-Gibbs
cycle (models/hslda.py :func:`_train_cycle` semantics, reference
HSLDA.py:312-317), each variable group distributes as:

* **z-sweep** — docs sharded; each (chain, shard) sweeps its local docs
  against a full replica of its chain's ``n_vk``; per-shard deltas merged
  with ``psum`` over ``data`` (AD-LDA, same scheme as sharded.py).
* **η** — needs the *global* Gram matrices ``z̄ᵀz̄ (K,K)`` and ``z̄ᵀa (K,L)``:
  computed as per-shard partial matmuls + ``psum`` over ``data``; the draw
  uses a per-chain key (no data-index folding) so every shard of a chain
  draws the *same* η — replication by construction, no broadcast needed.
* **a** — embarrassingly doc-parallel truncated normals (per-shard keys).
* **m** — doc-parallel Antoniak draws; ``mdot`` = ``psum`` of local sums / D.
* **β** — per-chain key ⇒ replicated Dirichlet draw.

Chains never communicate; pooled estimators average over the chains axis.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.state import running_average
from ..ops.hslda_gibbs import HSLDACounts, hslda_init_counts, hslda_z_sweep
from ..ops.sampling import gumbel_argmax, truncated_normal

__all__ = ["HSLDAShardedState", "init_hslda_sharded", "make_hslda_train_step",
           "make_hslda_train_loop", "pooled_ph"]


class HSLDAShardedState(NamedTuple):
    z: jax.Array  # (C, D, N) int32
    n_dk: jax.Array  # (C, D, K) int32
    n_vk: jax.Array  # (C, V, K) int32
    n_k: jax.Array  # (C, K) int32
    eta: jax.Array  # (C, L, K)
    a: jax.Array  # (C, D, L)
    beta: jax.Array  # (C, K)


def _specs(mesh, table_shard: str = "replicated"):
    """State shardings.  ``table_shard="vocab"`` (round-5 VERDICT item 4):
    each chain's ``(V, K)`` table keeps its V axis sharded over ``data`` —
    per-device persistent table memory C_local·V/S·K instead of
    C_local·V·K (the axis that dominates the 64-chain north-star
    footprint).  The cycle all_gathers a transient full view per chain and
    psum_scatters the deltas back; counts are int32, so the vocab-sharded
    run draws bit-identical chains to the replicated one."""
    return dict(
        z=P("chains", "data", None),
        n_dk=P("chains", "data", None),
        n_vk=(P("chains", "data", None) if table_shard == "vocab"
              else P("chains", None, None)),
        n_k=P("chains", None),
        eta=P("chains", None, None),
        a=P("chains", "data", None),
        beta=P("chains", None),
    )


def shard_hslda_corpus(mesh: Mesh, tok_v, mask, labs):
    """Pad doc axis to the data-mesh size; device_put with P('data')."""
    n_data = mesh.shape["data"]

    def pad(x):
        x = np.asarray(x)
        target = ((x.shape[0] + n_data - 1) // n_data) * n_data
        if target == x.shape[0]:
            return x
        return np.concatenate(
            [x, np.zeros((target - x.shape[0],) + x.shape[1:], x.dtype)]
        )

    sh = NamedSharding(mesh, P("data", None))
    return tuple(jax.device_put(pad(x), sh) for x in (tok_v, mask, labs))


def init_hslda_sharded(
    key, mesh: Mesh, tok_v, mask, labs, V: int, K: int, n_chains: int,
    alpha: float = 1.0, aprime: float = 1.0, mu: float = 0.0,
    table_shard: str = "replicated",
) -> HSLDAShardedState:
    """Per-chain prior draws + per-(chain, shard) count init (HSLDA.py:109-137)."""
    local_chains = n_chains // mesh.shape["chains"]
    L = labs.shape[1]
    S = mesh.shape["data"]
    Vp = ((V + S - 1) // S) * S if table_shard == "vocab" else V
    sp = _specs(mesh, table_shard)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P("data", None), P("data", None), P("data", None)),
        out_specs=(sp["z"], sp["n_dk"], sp["n_vk"], sp["n_k"], sp["eta"],
                   sp["a"], sp["beta"]),
        check_vma=False,
    )
    def _init(key, tok_v, mask, labs):
        ci = jax.lax.axis_index("chains")
        di = jax.lax.axis_index("data")

        def one_chain(j):
            kc = jax.random.fold_in(key, ci * 1009 + j)  # chain-replicated
            kd = jax.random.fold_in(kc, di + 1)  # shard-local
            k1, k2, k3 = jax.random.split(kc, 3)
            eta = mu + jax.random.normal(k1, (L, K))
            g = jax.random.gamma(k2, jnp.full((K,), aprime))
            beta = g / g.sum()
            g = jax.random.gamma(
                k3, jnp.broadcast_to(alpha * beta, (tok_v.shape[0], K))
            )
            theta0 = g / jnp.maximum(g.sum(axis=1, keepdims=True), 1e-38)
            # theta0 uses the chain key -> same across shards is NOT needed
            # (per-doc draws); re-randomise per shard:
            g2 = jax.random.gamma(
                kd, jnp.broadcast_to(alpha * beta, (tok_v.shape[0], K))
            )
            theta0 = g2 / jnp.maximum(g2.sum(axis=1, keepdims=True), 1e-38)
            c = hslda_init_counts(kd, tok_v, mask, theta0, V)
            n_d = jnp.maximum(mask.sum(axis=1), 1).astype(jnp.float32)
            zbar = c.n_dk.astype(jnp.float32) / n_d[:, None]
            mean_a = zbar @ eta.T
            lo = jnp.where(labs > 0, 0.0, -jnp.inf)
            hi = jnp.where(labs > 0, jnp.inf, 0.0)
            a = truncated_normal(jax.random.fold_in(kd, 7), lo, hi,
                                 loc=mean_a, scale=1.0)
            return c.z, c.n_dk, c.n_vk, c.n_k, eta, a, beta

        z, n_dk, n_vk, n_k, eta, a, beta = jax.vmap(one_chain)(
            jnp.arange(local_chains)
        )
        if table_shard == "vocab":
            n_vk = jnp.pad(n_vk, ((0, 0), (0, Vp - V), (0, 0)))
            n_vk = jax.lax.psum_scatter(n_vk, "data", scatter_dimension=1,
                                        tiled=True)
        else:
            n_vk = jax.lax.psum(n_vk, "data")
        n_k = jax.lax.psum(n_k, "data")
        return z, n_dk, n_vk, n_k, eta, a, beta

    return HSLDAShardedState(*jax.jit(_init)(key, tok_v, mask, labs))


def _build_cycle(
    mesh: Mesh, n_chains: int, D_total: int,
    alpha: float, aprime: float, gamma: float,
    mu: float, sigma: float, xi: float, opt: int,
    table_shard: str = "replicated", V: int = None,
):
    """The UNJITTED shard_map'd blocked-Gibbs cycle (z → η → a → m → β).

    Callers wrap it: :func:`make_hslda_train_step` jits one cycle (the
    round-3 API); :func:`make_hslda_train_loop` scans it inside a single
    whole-run jit — one dispatch per ``run_training`` call, the same
    structure as parallel/fused_sharded.make_fused_train_loop (a nested
    jit boundary per cycle costs ~0.4 s on the tunnelled backend).

    ``table_shard="vocab"`` (requires the true ``V``): persistent ``n_vk``
    keeps its V axis sharded over ``data``; the cycle all_gathers a
    transient full view per chain, sweeps against it with the true ``V·γ``
    denominator, and psum_scatters the int32 deltas back — bit-identical
    draws to the replicated path."""
    local_chains = n_chains // mesh.shape["chains"]
    vocab = table_shard == "vocab"
    if vocab and V is None:
        raise TypeError("table_shard='vocab' requires the true vocab size V")
    sp = _specs(mesh, table_shard)
    state_specs = (sp["z"], sp["n_dk"], sp["n_vk"], sp["n_k"], sp["eta"],
                   sp["a"], sp["beta"])

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(),) + state_specs
        + (P("data", None), P("data", None), P("data", None), P()),
        out_specs=state_specs,
        check_vma=False,
    )
    def _step(key, z, n_dk, n_vk, n_k, eta, a, beta, tok_v, mask, labs, st_logs):
        ci = jax.lax.axis_index("chains")
        di = jax.lax.axis_index("data")
        K = n_dk.shape[-1]
        L = labs.shape[1]
        S = st_logs.shape[0]
        n_vk_local = n_vk
        if vocab:
            # block start: transient full table view per chain (rides ICI)
            n_vk = jax.lax.all_gather(n_vk, "data", axis=1, tiled=True)

        def one_chain(j, z, n_dk, n_vk, n_k, eta, a, beta):
            kc = jax.random.fold_in(key, ci * 1009 + j)  # chain-replicated
            kd = jax.random.fold_in(kc, di + 1)  # shard-local
            kz, keta, ka, km, kbeta = jax.random.split(kc, 5)
            kz_l, ka_l, km_l = jax.random.split(kd, 3)

            # ---- z (local sweep, AD-LDA merge happens after the vmap)
            counts = HSLDACounts(z=z, n_dk=n_dk, n_vk=n_vk, n_k=n_k)
            new, _ = hslda_z_sweep(
                kz_l, counts, tok_v, mask, labs, eta, a,
                alpha_beta=alpha * beta, gamma=gamma, xi=xi, opt=opt,
                V=V,
            )
            d_vk = new.n_vk - n_vk
            d_k = new.n_k - n_k
            n_d = jnp.maximum(mask.sum(axis=1), 1).astype(jnp.float32)
            zbar = new.n_dk.astype(jnp.float32) / n_d[:, None]

            # ---- η: global Gram matrices via psum over data
            sig_data = jax.lax.psum(zbar.T @ zbar, "data")  # (K, K)
            raw = jax.lax.psum(zbar.T @ a, "data")  # (K, L)
            prec = jnp.eye(K) / sigma + sig_data
            chol = jnp.linalg.cholesky(prec)
            tmp = jax.scipy.linalg.solve_triangular(chol, mu / sigma + raw, lower=True)
            mu_hat = jax.scipy.linalg.solve_triangular(chol.T, tmp, lower=False)
            eps = jax.random.normal(keta, (K, L))  # chain key -> replicated
            eta_new = (
                mu_hat
                + jax.scipy.linalg.solve_triangular(chol.T, eps, lower=False)
            ).T

            # ---- a (doc-local)
            mean_a = zbar @ eta_new.T
            lo = jnp.where(labs > 0, 0.0, -jnp.inf)
            hi = jnp.where(labs > 0, jnp.inf, 0.0)
            a_new = truncated_normal(ka_l, lo, hi, loc=mean_a, scale=1.0)

            # ---- m (doc-local Antoniak draws) + global mean via psum
            log_ab = jnp.log(jnp.maximum(alpha * beta, 1e-38))
            n = jnp.minimum(new.n_dk, S - 1)
            logits = st_logs[n] + jnp.arange(S, dtype=jnp.float32)[None, None, :] * log_ab[None, :, None]
            m_aux = gumbel_argmax(km_l, logits, axis=2)
            mdot = jax.lax.psum(m_aux.astype(jnp.float32).sum(axis=0), "data") / D_total

            # ---- β (chain key -> replicated)
            g = jax.random.gamma(kbeta, mdot + aprime)
            beta_new = g / g.sum()
            return new.z, new.n_dk, d_vk, d_k, eta_new, a_new, beta_new

        z, n_dk, d_vk, d_k, eta, a, beta = jax.vmap(
            one_chain, in_axes=(0,) * 8
        )(jnp.arange(local_chains), z, n_dk, n_vk, n_k, eta, a, beta)
        if vocab:
            # AD-LDA merge + re-shard in one collective (int32: exact)
            n_vk = n_vk_local + jax.lax.psum_scatter(
                d_vk, "data", scatter_dimension=1, tiled=True)
        else:
            n_vk = n_vk + jax.lax.psum(d_vk, "data")
        n_k = n_k + jax.lax.psum(d_k, "data")
        return z, n_dk, n_vk, n_k, eta, a, beta

    return _step


def make_hslda_train_step(
    mesh: Mesh, n_chains: int, stirling_logs, D_total: int,
    alpha: float = 1.0, aprime: float = 1.0, gamma: float = 1.0,
    mu: float = 0.0, sigma: float = 1.0, xi: float = 0.0, opt: int = 1,
):
    """Build the jitted full sharded blocked-Gibbs cycle (one dispatch per
    cycle — prefer :func:`make_hslda_train_loop` for multi-cycle runs)."""
    _step = _build_cycle(mesh, n_chains, D_total, alpha, aprime, gamma,
                         mu, sigma, xi, opt)

    def step(key, state: HSLDAShardedState, tok_v, mask, labs) -> HSLDAShardedState:
        return HSLDAShardedState(
            *_step(key, *state, tok_v, mask, labs, stirling_logs)
        )

    return jax.jit(step)


def make_hslda_train_loop(
    mesh: Mesh, n_chains: int, stirling_logs, D_total: int,
    alpha: float = 1.0, aprime: float = 1.0, gamma: float = 1.0,
    mu: float = 0.0, sigma: float = 1.0, xi: float = 0.0, opt: int = 1,
    table_shard: str = "replicated", V: int = None,
):
    """Whole-run jitted multi-cycle trainer: ``lax.scan`` over save blocks
    of blocked-Gibbs cycles with the thinned per-chain φ̂ running mean
    updated on block boundaries — ONE dispatch per ``run_training`` call
    (HSLDA.py:312-333 semantics; round-4 VERDICT item 3).

    Returns ``loop(key, state, tok_v, mask, labs, ph_hat, n_saves, start,
    iters, thinning)`` → ``(state, ph_hat (C, K, V), n_saves)``;
    iters/thinning static, ``start`` = cycles already done (chunk-invariant
    RNG).  ``ph_hat``/``n_saves`` thread through chunked calls so a
    checkpointed run keeps one continuous running mean.

    Numerics note (round-5 ADVICE): the in-jit ``chain_ph`` running mean
    accumulates in float32 (the host-side path it replaced in round 3 used
    float64), so recorded ph_hat/AUC carry small (<1e-6-scale) drift
    relative to round-3 records — distinct from the documented RNG-stream
    change, and irrelevant to within-version bit-identity, which is what
    the resume tests assert.

    ``table_shard="vocab"`` — vocab-sharded persistent tables (see
    :func:`_specs`): ``ph_hat`` is then (C, K, Vp) with its V axis sharded
    over ``data`` so no replicated V-sized array survives the loop."""
    vocab = table_shard == "vocab"
    _step = _build_cycle(mesh, n_chains, D_total, alpha, aprime, gamma,
                         mu, sigma, xi, opt, table_shard=table_shard, V=V)

    @partial(jax.jit, static_argnames=("iters", "thinning"))
    def loop(key, state: HSLDAShardedState, tok_v, mask, labs,
             ph_hat, n_saves, start, iters: int, thinning: int):
        # chunk-invariant stream: cycle i of the run draws from
        # fold_in(master, start + i), so a checkpointed/resumed run is
        # bit-identical to an uninterrupted one (same scheme as
        # fused_sharded.make_fused_train_loop)
        n_blocks = iters // thinning
        rem = iters - n_blocks * thinning
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            start + jnp.arange(max(iters, 1), dtype=jnp.int32))

        def one_cycle(st, k):
            return HSLDAShardedState(
                *_step(k, *st, tok_v, mask, labs, stirling_logs)
            ), None

        def chain_ph(st):
            n_kv = st.n_vk.astype(jnp.float32).transpose(0, 2, 1)  # (C, K, V)
            ph = n_kv / jnp.maximum(n_kv.sum(axis=2, keepdims=True), 1.0)
            if vocab:
                # keep the thinned mean vocab-sharded too (pad columns are
                # exactly 0: zero counts / max(sum, 1))
                ph = jax.lax.with_sharding_constraint(
                    ph, NamedSharding(mesh, P("chains", None, "data")))
            return ph

        def save_block(carry, block_keys):
            st, ph, s = carry
            st, _ = jax.lax.scan(one_cycle, st, block_keys)
            s = s + 1
            ph = running_average(ph, chain_ph(st), s)
            return (st, ph, s), None

        carry = (state, ph_hat, n_saves)
        if n_blocks:
            carry, _ = jax.lax.scan(
                save_block, carry,
                keys[: n_blocks * thinning].reshape(n_blocks, thinning, 2))
        state, ph_hat, n_saves = carry
        if rem:
            state, _ = jax.lax.scan(one_cycle, state,
                                    keys[n_blocks * thinning : iters])
        return state, ph_hat, n_saves

    return loop


def pooled_ph(state: HSLDAShardedState, gamma: float,
              V: int = None) -> jax.Array:
    """(K, V) chain-pooled smoothed topic-word estimate.

    ``V`` — the TRUE vocabulary size; REQUIRED for vocab-sharded states
    (``table_shard="vocab"`` pads the table's V axis to a multiple of the
    shard count — smoothing the zero pad rows with γ would inflate every
    denominator by (Vp−V)·γ and put mass on nonexistent words).  Defaults
    to the table's own row count, exact for unpadded (replicated) states.
    """
    n_vk = state.n_vk if V is None else state.n_vk[:, :V]
    n_kv = n_vk.astype(jnp.float32).transpose(0, 2, 1) + gamma  # (C, K, V)
    ph = n_kv / n_kv.sum(axis=2, keepdims=True)
    return ph.mean(axis=0)
