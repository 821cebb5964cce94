"""HSLDA blocked-Gibbs kernels (SURVEY.md C15/C16) — TPU-native.

The z-sweep implements Eq. (1) of Perotte '11 (reference ``sample_z``,
HSLDA.py:171-272): token-instance collapsed Gibbs over K latent topics with a
probit-regression coupling term ``p2`` linking each token's topic to the
document's label auxiliary variables.

TPU formulation: a ``lax.scan`` over the N instance positions with all D
documents updating in parallel (same position-major scheme as ops/gibbs.py).
The per-token probit coupling is evaluated with **MXU matmuls** instead of
the reference's per-document (L', K) Python arithmetic:

opt=1 (reference default), in log space, dropping k-independent terms:

    log p2[d, k] ≐ −( ((labs⊙(M−a)) @ η)[d,k] / n_d  +  (labs @ η²)[d,k] / (2 n_d²) )

where ``M[d, l] = ⟨z̄_d, η_l⟩`` is maintained incrementally as z changes
(the reference's ``means_a`` bookkeeping, HSLDA.py:229-235,265) and
``labs @ η²`` is hoisted out of the sweep entirely.

opt=2/3 evaluate ``Φ(±(m_k − ξ))`` label-blockwise: the coupling needs a
(D, L, K) tensor per position, which at real-corpus scale (D≈4.2k, L≈450)
is ~120 MB per scan step — instead the label axis is processed in
``L_BLOCK``-wide chunks (an unrolled loop of (D, L_BLOCK, K) transients,
exact same sum).  Padded label slots contribute a k-independent constant
to ``log p2`` (η row 0, M 0 → Φ(−ξ)), which the Gumbel-argmax draw is
invariant to, so no masking is required.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .sampling import gumbel_argmax

__all__ = ["HSLDACounts", "hslda_init_counts", "hslda_z_sweep"]


class HSLDACounts(NamedTuple):
    """Instance-level count state (reference HSLDA.py:116-130)."""

    z: jax.Array  # (D, N) int32
    n_dk: jax.Array  # (D, K) int32
    n_vk: jax.Array  # (V, K) int32
    n_k: jax.Array  # (K,) int32


def _one_hot_i32(z, K):
    return jax.nn.one_hot(z, K, dtype=jnp.int32)


def _log_ndtr(x):
    """log Φ(x), stable in the left tail."""
    return jax.scipy.special.log_ndtr(x)


def hslda_init_counts(
    key: jax.Array,
    tok_v: jax.Array,  # (D, N) int32 token instances
    mask: jax.Array,  # (D, N) int32 1=real token
    theta: jax.Array,  # (D, K) initial doc-topic proportions (θ ~ Dir(αβ))
    V: int,
) -> HSLDACounts:
    """z ~ Categorical(θ_d) per instance and count tensors (HSLDA.py:122-130)."""
    D, N = tok_v.shape
    K = theta.shape[1]
    logits = jnp.log(jnp.maximum(theta, 1e-38))
    keys = jax.random.split(key, N)

    def step(carry, xs):
        n_dk, n_vk, n_k = carry
        v, m, k = xs
        z = gumbel_argmax(k, logits, axis=1)
        mo = m[:, None] * _one_hot_i32(z, K)
        n_dk = n_dk + mo
        n_k = n_k + mo.sum(axis=0)
        n_vk = n_vk.at[v, z].add(m)
        return (n_dk, n_vk, n_k), z

    carry0 = (
        jnp.zeros((D, K), jnp.int32),
        jnp.zeros((V, K), jnp.int32),
        jnp.zeros((K,), jnp.int32),
    )
    (n_dk, n_vk, n_k), z_t = jax.lax.scan(step, carry0, (tok_v.T, mask.T, keys))
    return HSLDACounts(z=z_t.T.astype(jnp.int32), n_dk=n_dk, n_vk=n_vk, n_k=n_k)


def hslda_z_sweep(
    key: jax.Array,
    counts: HSLDACounts,
    tok_v: jax.Array,  # (D, N)
    mask: jax.Array,  # (D, N)
    labs: jax.Array,  # (D, L) float binary
    eta: jax.Array,  # (L, K)
    a: jax.Array,  # (D, L) probit auxiliaries
    alpha_beta: jax.Array,  # (K,) α·β vector
    gamma: float,
    xi: float,
    opt: int = 1,
    lab_pos_ids: jax.Array | None = None,  # (D, A) positive-label ids
    lab_pos_valid: jax.Array | None = None,  # (D, A) 1/0
    V: int | None = None,
) -> Tuple[HSLDACounts, jax.Array]:
    """One full z-sweep; returns (new counts, mean_a = z̄ @ ηᵀ).

    ``V`` — the TRUE vocabulary size for the ``V·γ`` smoothing denominator
    (reference HSLDA.py:243).  Defaults to the table's own row count, which
    is exact for unpadded tables; callers sweeping against a *padded*
    transient table (parallel/hslda_sharded.py vocab-sharded mode pads V to
    a multiple of the shard count) MUST pass the real ``V`` or the
    denominator silently diverges from the replicated path.

    ``opt`` selects the coupling variant (reference HSLDA.py:240-261):
    1 — Gaussian kernel on positive labels, 2 — Φ(m−ξ) on positive labels,
    3 — Φ(±(m−ξ)) on all labels.

    For opt=2 the coupling sums over *positive* labels only (~4–24 of the
    ~450 at real-corpus scale); when the caller passes the compact
    ``lab_pos_ids``/``lab_pos_valid`` layout, the per-position Φ transient
    shrinks from (D, L, K) label blocks to (D, A, K) — the same sum, ~L/A×
    less transcendental work (this was the round-2 opt-cost gap,
    PARITY.md).  opt=3 genuinely couples every label (negative labels enter
    through Φ(−m)) and keeps the blockwise evaluation.
    """
    D, N = tok_v.shape
    K = counts.n_dk.shape[1]
    if V is None:
        V = counts.n_vk.shape[0]
    L = labs.shape[1]

    n_d = jnp.maximum(mask.sum(axis=1), 1).astype(jnp.float32)  # (D,)
    inv_nd = (1.0 / n_d)[:, None]
    vgamma = jnp.float32(V) * gamma
    # hoisted coupling terms
    sparse2 = opt == 2 and lab_pos_ids is not None
    if opt == 1:
        T2 = (labs @ (eta * eta)) * (0.5 * inv_nd * inv_nd)  # (D, K)
    elif sparse2:
        # per-doc positive-label η rows, hoisted out of the scan
        eta_pos = eta[lab_pos_ids]  # (D, A, K)
        pos_valid = lab_pos_valid[:, :, None]  # (D, A, 1)
    else:
        # pad the label axis to the block width; padded slots have η = 0,
        # labs = 0 and only shift log p2 by a per-document constant
        L_BLOCK = min(64, L)
        Lpad = ((L + L_BLOCK - 1) // L_BLOCK) * L_BLOCK - L
        if Lpad:
            labs = jnp.pad(labs, ((0, 0), (0, Lpad)))
            eta = jnp.pad(eta, ((0, Lpad), (0, 0)))
    etaT = eta.T  # (K, Lp)
    keys = jax.random.split(key, N)

    # M[d, l] = ⟨z̄_d, η_l⟩ maintained incrementally through the scan
    M0 = (counts.n_dk.astype(jnp.float32) @ eta.T) * inv_nd

    def step(carry, xs):
        n_dk, n_vk, n_k, M = carry
        v, m, z_old, k = xs  # (D,), (D,), (D,), key
        mf = m.astype(jnp.float32)[:, None]

        # decrement
        mo = m[:, None] * _one_hot_i32(z_old, K)
        n_dk = n_dk - mo
        n_k = n_k - mo.sum(axis=0)
        n_vk = n_vk.at[v, z_old].add(-m)
        M = M - etaT[z_old] * inv_nd * mf  # (D, L)

        # p1: collapsed-LDA part with the HDP-style αβ prior (HSLDA.py:240-243)
        logp1 = (
            jnp.log(n_dk.astype(jnp.float32) + alpha_beta[None, :])
            + jnp.log(n_vk[v].astype(jnp.float32) + gamma)
            - jnp.log(n_k.astype(jnp.float32) + vgamma)
        )

        # p2: probit coupling (HSLDA.py:245-261)
        if opt == 1:
            C = (M - a) * labs  # (D, L), zero on negative labels
            T1 = (C @ eta) * inv_nd  # (D, K) — MXU matmul
            logp2 = -(T1 + T2)
        elif sparse2:
            M_pos = jnp.take_along_axis(M, lab_pos_ids, axis=1)  # (D, A)
            mk = (
                M_pos[:, :, None]
                + eta_pos * inv_nd[:, :, None]
                - xi
            )  # (D, A, K)
            logp2 = jnp.sum(pos_valid * _log_ndtr(mk), axis=1)
        else:
            # candidate means m_k[d, l] = M[d, l] + η_lk / n_d, minus ξ —
            # evaluated in L_BLOCK-wide label chunks (unrolled) to bound
            # the transient to (D, L_BLOCK, K)
            Lp = eta.shape[0]
            logp2 = jnp.zeros((D, K), jnp.float32)
            for g in range(Lp // L_BLOCK):
                sl = slice(g * L_BLOCK, (g + 1) * L_BLOCK)
                mk = (
                    M[:, sl, None]
                    + eta[None, sl, :] * inv_nd[:, :, None]
                    - xi
                )  # (D, L_BLOCK, K)
                if opt == 2:
                    logp2 = logp2 + jnp.sum(
                        labs[:, sl, None] * _log_ndtr(mk), axis=1
                    )
                else:  # opt == 3
                    signed = jnp.where(labs[:, sl, None] > 0, mk, -mk)
                    logp2 = logp2 + jnp.sum(_log_ndtr(signed), axis=1)

        z_new = gumbel_argmax(k, logp1 + logp2, axis=1)
        z_new = jnp.where(m > 0, z_new, z_old)

        # increment
        mn = m[:, None] * _one_hot_i32(z_new, K)
        n_dk = n_dk + mn
        n_k = n_k + mn.sum(axis=0)
        n_vk = n_vk.at[v, z_new].add(m)
        M = M + etaT[z_new] * inv_nd * mf
        return (n_dk, n_vk, n_k, M), z_new

    (n_dk, n_vk, n_k, M), z_t = jax.lax.scan(
        step,
        (counts.n_dk, counts.n_vk, counts.n_k, M0),
        (tok_v.T, mask.T, counts.z.T, keys),
    )
    new = HSLDACounts(z=z_t.T.astype(jnp.int32), n_dk=n_dk, n_vk=n_vk, n_k=n_k)
    return new, M[:, :L]
