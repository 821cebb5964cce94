"""Collapsed-Gibbs sweep kernels (the hot path — SURVEY.md C6/C7/C10).

TPU-first formulation of the reference's per-token Python loops
(LabeledLDA.py:101-125, 155-212; LocalLDA.py:60-84; CascadeLDA.py:210-247,
303-344, 397-421):

Documents are dense ``(D, U)`` arrays of (token-type, frequency) slots; a
sweep is a ``lax.scan`` over the U type positions.  At position ``n`` all D
documents resample their n-th type **in parallel**:

    decrement f-weighted counts of z_old
    log p(k) = log labs + log(n_dk + α) + log(n_vk[v] + β) − log(n_k + Vβ)
    z_new  ~ Gumbel-max(log p)
    increment f-weighted counts of z_new

Counts are exact throughout (scatter-adds commit each position's updates
before the next position), so the only deviation from the reference is the
update *order*: token position-major instead of document-major.  Padding
slots have f = 0 and are algebraic no-ops.

Layouts: ``n_dk (D, K)``, ``n_vk (V, K)`` — the topic axis K is the TPU lane
dimension, so per-token access to the topic-word table is a *row*
gather/scatter.  (The reference stores ``n_k_v (K, V)``; transposed here on
purpose.)
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .sampling import gumbel_argmax, mask_to_logits

__all__ = [
    "LDACounts",
    "BucketLDAState",
    "CompactLDACounts",
    "CompactBucketState",
    "to_fast_layout",
    "train_sweep_fast",
    "init_counts",
    "init_bucket_counts",
    "init_counts_compact",
    "init_bucket_counts_compact",
    "train_sweep",
    "train_sweep_buckets",
    "train_sweep_compact",
    "train_sweep_buckets_compact",
    "densify_ndk",
    "theta_from_compact",
    "foldin_sweep",
    "cascade_test_loop",
    "log_likelihood",
]


class LDACounts(NamedTuple):
    """Dense Gibbs count state (reference ``n_d_k/n_k_v/n_zk``, LabeledLDA.py:74-76)."""

    z: jax.Array  # (D, U) int32 current topic of each type slot
    n_dk: jax.Array  # (D, K) int32
    n_vk: jax.Array  # (V, K) int32
    n_k: jax.Array  # (K,) int32


def _one_hot_i32(z: jax.Array, K: int) -> jax.Array:
    return jax.nn.one_hot(z, K, dtype=jnp.int32)


def init_counts(
    key: jax.Array,
    tok_v: jax.Array,  # (D, U) int32
    tok_f: jax.Array,  # (D, U) int32
    labs: jax.Array,  # (D, K) float mask
    V: int,
) -> LDACounts:
    """Initialise z from the per-doc label distribution and build count tensors.

    Mirrors the reference init (LabeledLDA.py:85-92): z ~ Categorical over the
    doc's admissible labels, uniformly.  Counts are float32 (exact integer
    arithmetic below 2^24 — see :func:`train_sweep`).
    """
    D, U = tok_v.shape
    K = labs.shape[1]
    c_labs = jnp.cumsum(labs, axis=1)  # (D, K) inverse-CDF table
    total = c_labs[:, -1]
    uniforms = jax.random.uniform(key, (U, D), dtype=jnp.float32)
    fF = tok_f.astype(jnp.float32)

    def step(carry, xs):
        n_dk, n_vk, n_k = carry
        v, ff, u = xs
        z = jnp.sum(c_labs < (u * total)[:, None], axis=1).astype(jnp.int32)
        fo = ff[:, None] * jax.nn.one_hot(z, K, dtype=jnp.float32)
        n_dk = n_dk + fo
        n_k = n_k + fo.sum(axis=0)
        n_vk = n_vk.at[v, z].add(ff)
        return (n_dk, n_vk, n_k), z

    carry0 = (
        jnp.zeros((D, K), jnp.float32),
        jnp.zeros((V, K), jnp.float32),
        jnp.zeros((K,), jnp.float32),
    )
    (n_dk, n_vk, n_k), z_t = jax.lax.scan(
        step, carry0, (tok_v.T, fF.T, uniforms)
    )
    return LDACounts(z=z_t.T.astype(jnp.int32), n_dk=n_dk, n_vk=n_vk, n_k=n_k)


def train_sweep(
    key: jax.Array,
    counts: LDACounts,
    tok_v: jax.Array,
    tok_f: jax.Array,
    labs: jax.Array,
    alpha: float,
    beta: float,
    vbeta: float = None,
) -> LDACounts:
    """One full collapsed-Gibbs sweep over all (doc, type) slots.

    Posterior per slot (reference LabeledLDA.py:113-117):
        p(z=k) ∝ labs_k · (n_dk + α) · (n_vk[v] + β) / (n_k + V·β)

    ``vbeta`` — the denominator constant V·β; defaults to the table's own
    row count × β.  Callers whose table pads the vocab axis (stable-shape
    bucketing) must pass the true V·β.

    TPU-tuned formulation (chosen by benchmarks/micro_sweep_variants.py on a
    v5e chip — 12.4M tokens/s vs 10.0M for log-domain Gumbel-max and 6-8M for
    row-scatter count updates):

    * the categorical draw is an exact inverse-CDF search in the *linear*
      domain — the reference's own multinomial semantics without its
      renormalisation hacks — with the cumulative sum computed as one
      ``w @ triu(1)`` MXU matmul (faster than the VPU lane cumsum) and only
      a (D,) uniform per position, zero transcendentals;
    * ``n_dk``/``n_k`` updates are dense one-hot multiply-adds (TPU scatters
      serialise; dense VPU updates don't) — only the unavoidable ``n_vk``
      row updates use scatter-add;
    * counts are float32 (exact integer arithmetic below 2^24).
    """
    from .gibbs_pallas import BLOCK, fused_draw_update, pallas_supported

    D, U = tok_v.shape
    K = counts.n_dk.shape[1]
    V = counts.n_vk.shape[0]
    vbeta = jnp.float32(V * beta if vbeta is None else vbeta)
    tri = jnp.triu(jnp.ones((K, K), jnp.float32))  # inclusive-cumsum operator
    fF = tok_f.astype(jnp.float32)
    use_pallas = pallas_supported()

    if use_pallas:
        # pad the doc axis to the kernel block size; padded rows have f = 0
        # and an all-zero mask, so they are algebraic no-ops
        Dp = ((D + BLOCK - 1) // BLOCK) * BLOCK
        pad = Dp - D

        def pad_rows(x, value=0):
            if pad == 0:
                return x
            return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                           constant_values=value)

        tok_v_p = pad_rows(tok_v)
        fF_p = pad_rows(fF)
        labs_p = pad_rows(labs)
        z0 = pad_rows(counts.z)
        n_dk0 = pad_rows(counts.n_dk.astype(jnp.float32))
        uniforms = jax.random.uniform(key, (U, Dp), dtype=jnp.float32)

        def step(carry, xs):
            n_dk, n_vk, n_k = carry
            v, ff, z_old, u = xs
            dec_k = jnp.zeros((K,), jnp.float32).at[z_old].add(ff)
            nk_minus = n_k - dec_k
            n_vk = n_vk.at[v, z_old].add(-ff)
            cv = n_vk[v]
            recip = 1.0 / (nk_minus + vbeta)
            n_dk, z_new, dnk = fused_draw_update(
                u, ff, z_old, labs_p, n_dk, cv, recip, tri, alpha, beta
            )
            n_vk = n_vk.at[v, z_new].add(ff)
            n_k = n_k + dnk  # == nk_minus + (increments); Δ includes the dec
            return (n_dk, n_vk, n_k), z_new

        (n_dk, n_vk, n_k), z_t = jax.lax.scan(
            step,
            (n_dk0, counts.n_vk.astype(jnp.float32), counts.n_k.astype(jnp.float32)),
            (tok_v_p.T, fF_p.T, z0.T, uniforms),
        )
        return LDACounts(
            z=z_t.T[:D].astype(jnp.int32),
            n_dk=n_dk[:D],
            n_vk=n_vk,
            n_k=n_k,
        )

    def step(carry, xs):
        n_dk, n_vk, n_k = carry
        v, f, ff, z_old, u = xs  # (D,) each
        fo = ff[:, None] * jax.nn.one_hot(z_old, K, dtype=jnp.float32)
        n_dk = n_dk - fo
        n_k = n_k - fo.sum(axis=0)
        n_vk = n_vk.at[v, z_old].add(-ff)

        cv = n_vk[v]  # (D, K) fresh topic-word counts for each doc's word
        w = labs * (n_dk + alpha) * (cv + beta) * (1.0 / (n_k + vbeta))
        c = jnp.dot(w, tri, preferred_element_type=jnp.float32)
        r = u * c[:, -1]
        z_new = jnp.sum(c < r[:, None], axis=1).astype(jnp.int32)
        z_new = jnp.where(f > 0, z_new, z_old)

        fn = ff[:, None] * jax.nn.one_hot(z_new, K, dtype=jnp.float32)
        n_dk = n_dk + fn
        n_k = n_k + fn.sum(axis=0)
        n_vk = n_vk.at[v, z_new].add(ff)
        return (n_dk, n_vk, n_k), z_new

    uniforms = jax.random.uniform(key, (U, D), dtype=jnp.float32)
    n_dk0 = counts.n_dk.astype(jnp.float32)
    n_vk0 = counts.n_vk.astype(jnp.float32)
    n_k0 = counts.n_k.astype(jnp.float32)
    (n_dk, n_vk, n_k), z_t = jax.lax.scan(
        step,
        (n_dk0, n_vk0, n_k0),
        (tok_v.T, tok_f.T, fF.T, counts.z.T, uniforms),
    )
    return LDACounts(z=z_t.T.astype(jnp.int32), n_dk=n_dk, n_vk=n_vk, n_k=n_k)


def foldin_sweep(
    key: jax.Array,
    z: jax.Array,  # (D, U)
    n_dk: jax.Array,  # (D, K) float32
    tok_v: jax.Array,
    tok_f: jax.Array,
    phi: jax.Array,  # (V, K) topic-word distribution (frozen, linear domain)
    alpha,  # scalar or (K,) — HSLDA passes the vector α·β (HSLDA.py:358)
    beta_fallback: Optional[float] = None,
    mask: Optional[jax.Array] = None,  # (D, K) admissible-topic mask
) -> Tuple[jax.Array, jax.Array]:
    """One fold-in Gibbs sweep for held-out docs with φ **frozen**.

    Posterior (reference LabeledLDA.py:185-194): p(z=k) ∝ (n_dk + α)·φ[v, k].
    With ``beta_fallback`` set, rows whose posterior is identically zero are
    recomputed as (n_dk + α)·(φ[v] + β) — CascadeLDA's degenerate-φ recovery
    (CascadeLDA.py:224-229).  Same linear-domain inverse-CDF draw as
    :func:`train_sweep`.
    """
    D, U = tok_v.shape
    K = n_dk.shape[1]
    tri = jnp.triu(jnp.ones((K, K), jnp.float32))
    alpha = jnp.asarray(alpha, jnp.float32)
    uniforms = jax.random.uniform(key, (U, D), dtype=jnp.float32)
    fF = tok_f.astype(jnp.float32)
    n_dk = n_dk.astype(jnp.float32)

    def step(n_dk, xs):
        v, f, ff, z_old, u = xs
        n_dk = n_dk - ff[:, None] * jax.nn.one_hot(z_old, K, dtype=jnp.float32)

        a_doc = n_dk + alpha  # (D, K)
        pv = phi[v]  # (D, K)
        w = a_doc * pv
        if mask is not None:
            w = w * mask
        if beta_fallback is not None:
            w_fb = a_doc * (pv + beta_fallback)
            if mask is not None:
                w_fb = w_fb * mask
            dead = jnp.sum(w, axis=1, keepdims=True) <= 0.0
            w = jnp.where(dead, w_fb, w)
        c = jnp.dot(w, tri, preferred_element_type=jnp.float32)
        r = u * c[:, -1]
        z_new = jnp.sum(c < r[:, None], axis=1).astype(jnp.int32)
        z_new = jnp.where(f > 0, z_new, z_old)

        n_dk = n_dk + ff[:, None] * jax.nn.one_hot(z_new, K, dtype=jnp.float32)
        return n_dk, z_new

    n_dk, z_t = jax.lax.scan(step, n_dk, (tok_v.T, tok_f.T, fF.T, z.T, uniforms))
    return z_t.T.astype(jnp.int32), n_dk


def _fast_pad(D: int) -> int:
    """Row padding for the fast-layout sweep: the Pallas kernel needs BLOCK
    multiples; the XLA fallback only lane-multiples."""
    from .gibbs_pallas import BLOCK, pallas_supported

    m = BLOCK if pallas_supported() else 8
    return ((D + m - 1) // m) * m


def to_fast_layout(z, n_dk, tok_v, tok_f, labs):
    """(D, ·) training operands -> padded, position-major layout.

    The sweep scans over token positions; feeding it (U, Dp)-transposed
    xs (materialised once, ``optimization_barrier`` so XLA cannot re-fuse
    the transpose into every scan-step slice) and keeping z in the same
    layout across sweeps removes the per-sweep transpose/pad traffic —
    measured ~10x per-position on a v5e chip (round-2 probe series;
    conclusions in ARCHITECTURE.md, scripts pruned round 4).
    Padding rows carry f = 0 / labs = 0 and are algebraic no-ops.
    """
    D, U = tok_v.shape
    Dp = _fast_pad(D)
    pad = Dp - D

    def pad_rows(x):
        if pad == 0:
            return x
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))

    bar = jax.lax.optimization_barrier
    tok_v_t = pad_rows(tok_v).T  # (U, Dp)
    tok_f_t = pad_rows(tok_f).T
    fF_t = pad_rows(tok_f.astype(jnp.float32)).T
    labs_p = pad_rows(labs)
    z_t = pad_rows(z).T
    n_dk_p = pad_rows(n_dk.astype(jnp.float32))
    return z_t, n_dk_p, tok_v_t, tok_f_t, fF_t, labs_p


def train_sweep_fast(
    key: jax.Array,
    z_t: jax.Array,  # (U, Dp) int32 — position-major current topics
    n_dk: jax.Array,  # (Dp, K) float32
    n_vk: jax.Array,  # (V, K) float32
    n_k: jax.Array,  # (K,) float32
    tok_v_t: jax.Array,  # (U, Dp) int32
    tok_f_t: jax.Array,  # (U, Dp) int32
    fF_t: jax.Array,  # (U, Dp) float32
    labs: jax.Array,  # (Dp, K) float32
    alpha: float,
    beta: float,
):
    """One collapsed-Gibbs sweep in the fast layout (see to_fast_layout).

    Identical sampler to :func:`train_sweep` (same posterior, same
    decrement → draw → increment order); only the operand layout differs.
    """
    from .gibbs_pallas import fused_draw_update, pallas_supported

    U, Dp = tok_v_t.shape
    K = n_dk.shape[1]
    V = n_vk.shape[0]
    vbeta = jnp.float32(V * beta)
    tri = jnp.triu(jnp.ones((K, K), jnp.float32))
    uniforms = jax.random.uniform(key, (U, Dp), dtype=jnp.float32)

    if pallas_supported():
        def step(carry, xs):
            n_dk, n_vk, n_k = carry
            v, ff, z_old, u = xs
            dec_k = jnp.zeros((K,), jnp.float32).at[z_old].add(ff)
            nk_minus = n_k - dec_k
            n_vk = n_vk.at[v, z_old].add(-ff)
            cv = n_vk[v]
            recip = 1.0 / (nk_minus + vbeta)
            n_dk, z_new, dnk = fused_draw_update(
                u, ff, z_old, labs, n_dk, cv, recip, tri, alpha, beta
            )
            n_vk = n_vk.at[v, z_new].add(ff)
            n_k = n_k + dnk
            return (n_dk, n_vk, n_k), z_new

        (n_dk, n_vk, n_k), z_t = jax.lax.scan(
            step, (n_dk, n_vk, n_k), (tok_v_t, fF_t, z_t, uniforms)
        )
        return z_t, n_dk, n_vk, n_k

    def step(carry, xs):
        n_dk, n_vk, n_k = carry
        v, f, ff, z_old, u = xs
        fo = ff[:, None] * jax.nn.one_hot(z_old, K, dtype=jnp.float32)
        n_dk = n_dk - fo
        n_k = n_k - fo.sum(axis=0)
        n_vk = n_vk.at[v, z_old].add(-ff)

        cv = n_vk[v]
        w = labs * (n_dk + alpha) * (cv + beta) * (1.0 / (n_k + vbeta))
        c = jnp.dot(w, tri, preferred_element_type=jnp.float32)
        r = u * c[:, -1]
        z_new = jnp.sum(c < r[:, None], axis=1).astype(jnp.int32)
        z_new = jnp.where(f > 0, z_new, z_old)

        fn = ff[:, None] * jax.nn.one_hot(z_new, K, dtype=jnp.float32)
        n_dk = n_dk + fn
        n_k = n_k + fn.sum(axis=0)
        n_vk = n_vk.at[v, z_new].add(ff)
        return (n_dk, n_vk, n_k), z_new

    (n_dk, n_vk, n_k), z_t = jax.lax.scan(
        step, (n_dk, n_vk, n_k), (tok_v_t, tok_f_t, fF_t, z_t, uniforms)
    )
    return z_t, n_dk, n_vk, n_k


class CompactLDACounts(NamedTuple):
    """Gibbs state over the **compact topic support** of each document.

    Labeled LDA's posterior is zero outside a document's admissible labels
    (root ∪ its JEL codes — typically ~4 of ~400 topics, reference
    LabeledLDA.py:113-117), so per-document work lives on a tiny (D, A)
    slot axis instead of the full (D, K) lane axis:

    * ``z``    (D, U) int32 — *compact slot* index of each type's topic,
    * ``n_dk`` (D, A) float32 — compact doc-topic counts,
    * ``n_vk`` (V, K) / ``n_k`` (K,) — dense global tables (needed for φ).

    ``lab_ids (D, A)`` maps slot → global topic id (ascending per row, pad
    slots carry id 0 with ``lab_valid = 0``).  With ascending ids the
    inverse-CDF draw lands on the *same global topic* as the dense
    :func:`train_sweep` given the same uniform — the compact sweep is the
    identical sampler, just with the zero lanes removed.
    """

    z: jax.Array
    n_dk: jax.Array
    n_vk: jax.Array
    n_k: jax.Array


def init_counts_compact(
    key: jax.Array,
    tok_v: jax.Array,  # (D, U) int32
    tok_f: jax.Array,  # (D, U) int32
    lab_ids: jax.Array,  # (D, A) int32, ascending, pads = 0
    lab_valid: jax.Array,  # (D, A) float 1/0
    V: int,
    K: int,
) -> CompactLDACounts:
    """Compact analogue of :func:`init_counts`: z ~ uniform over the doc's
    admissible labels (LabeledLDA.py:85-92)."""
    D, U = tok_v.shape
    A = lab_ids.shape[1]
    c_valid = jnp.cumsum(lab_valid, axis=1)  # (D, A)
    total = c_valid[:, -1]
    uniforms = jax.random.uniform(key, (U, D), dtype=jnp.float32)
    fF = tok_f.astype(jnp.float32)

    def step(carry, xs):
        n_dk, n_vk, n_k = carry
        v, ff, u = xs
        zc = jnp.sum(c_valid < (u * total)[:, None], axis=1).astype(jnp.int32)
        zg = jnp.take_along_axis(lab_ids, zc[:, None], axis=1)[:, 0]
        n_dk = n_dk + ff[:, None] * jax.nn.one_hot(zc, A, dtype=jnp.float32)
        n_vk = n_vk.at[v, zg].add(ff)
        n_k = n_k.at[zg].add(ff)
        return (n_dk, n_vk, n_k), zc

    carry0 = (
        jnp.zeros((D, A), jnp.float32),
        jnp.zeros((V, K), jnp.float32),
        jnp.zeros((K,), jnp.float32),
    )
    (n_dk, n_vk, n_k), z_t = jax.lax.scan(step, carry0, (tok_v.T, fF.T, uniforms))
    return CompactLDACounts(z=z_t.T.astype(jnp.int32), n_dk=n_dk, n_vk=n_vk, n_k=n_k)


def train_sweep_compact(
    key: jax.Array,
    counts: CompactLDACounts,
    tok_v: jax.Array,
    tok_f: jax.Array,
    lab_ids: jax.Array,
    lab_valid: jax.Array,
    alpha: float,
    beta: float,
    vbeta: float = None,
) -> CompactLDACounts:
    """One collapsed-Gibbs sweep on the compact support (exact sampler).

    Same posterior, visiting order and inverse-CDF draw as the dense
    :func:`train_sweep` (reference math LabeledLDA.py:113-117) — but all
    per-document tensors are (D, A) with A = max labels/doc instead of
    (D, K), the topic-word gather is per *element* instead of per row, and
    the MXU cumsum is an (A, A) matmul instead of (K, K).  For the abstracts
    corpus (A=24 vs K=512 padded) this removes ~95% of the sweep's FLOPs
    and HBM traffic.
    """
    D, U = tok_v.shape
    A = lab_ids.shape[1]
    K = counts.n_vk.shape[1]
    V = counts.n_vk.shape[0]
    vbeta = jnp.float32(V * beta if vbeta is None else vbeta)
    tri = jnp.triu(jnp.ones((A, A), jnp.float32))
    uniforms = jax.random.uniform(key, (U, D), dtype=jnp.float32)
    fF = tok_f.astype(jnp.float32)
    flat_ids = lab_ids.astype(jnp.int32)  # (D, A) global column per slot

    def step(carry, xs):
        n_dk, n_vk, n_k = carry
        v, f, ff, zc_old, u = xs  # (D,) each
        zg_old = jnp.take_along_axis(flat_ids, zc_old[:, None], axis=1)[:, 0]
        n_dk = n_dk - ff[:, None] * jax.nn.one_hot(zc_old, A, dtype=jnp.float32)
        n_vk = n_vk.at[v, zg_old].add(-ff)
        n_k = n_k.at[zg_old].add(-ff)

        flat = v[:, None] * K + flat_ids  # (D, A) flat index into n_vk
        cv = n_vk.reshape(-1)[flat]
        nk_g = n_k[flat_ids]  # (D, A)
        w = lab_valid * (n_dk + alpha) * (cv + beta) * (1.0 / (nk_g + vbeta))
        c = jnp.dot(w, tri, preferred_element_type=jnp.float32)
        r = u * c[:, -1]
        zc_new = jnp.sum(c < r[:, None], axis=1).astype(jnp.int32)
        zc_new = jnp.where(f > 0, zc_new, zc_old)
        zg_new = jnp.take_along_axis(flat_ids, zc_new[:, None], axis=1)[:, 0]

        n_dk = n_dk + ff[:, None] * jax.nn.one_hot(zc_new, A, dtype=jnp.float32)
        n_vk = n_vk.at[v, zg_new].add(ff)
        n_k = n_k.at[zg_new].add(ff)
        return (n_dk, n_vk, n_k), zc_new

    (n_dk, n_vk, n_k), z_t = jax.lax.scan(
        step,
        (counts.n_dk.astype(jnp.float32), counts.n_vk, counts.n_k),
        (tok_v.T, tok_f.T, fF.T, counts.z.T, uniforms),
    )
    return CompactLDACounts(z=z_t.T.astype(jnp.int32), n_dk=n_dk, n_vk=n_vk, n_k=n_k)


def densify_ndk(n_dk_c: jax.Array, lab_ids: jax.Array, K: int) -> jax.Array:
    """Scatter compact (D, A) doc-topic counts into dense (D, K)."""
    D = n_dk_c.shape[0]
    rows = jnp.broadcast_to(jnp.arange(D, dtype=jnp.int32)[:, None], lab_ids.shape)
    return jnp.zeros((D, K), jnp.float32).at[rows, lab_ids].add(n_dk_c)


def theta_from_compact(
    n_dk_c: jax.Array, lab_ids: jax.Array, lab_valid: jax.Array, alpha: float, K: int
) -> jax.Array:
    """Dense (D, K) label-masked θ from compact counts (LabeledLDA.py:236-239)."""
    num = n_dk_c + lab_valid * alpha
    den = num.sum(axis=1, keepdims=True)
    return densify_ndk(num / jnp.maximum(den, 1e-38), lab_ids, K)


class BucketLDAState(NamedTuple):
    """Gibbs state over length-bucketed documents (data/buckets.py).

    ``z``/``n_dk`` are per-bucket tuples (each bucket has its own padded
    width U_g); the topic-word table and totals are global.  A bucketed
    sweep is *exact* Gibbs — buckets are swept sequentially, which is just
    a particular document visiting order.
    """

    z: Tuple[jax.Array, ...]
    n_dk: Tuple[jax.Array, ...]
    n_vk: jax.Array
    n_k: jax.Array


def init_bucket_counts(key, toks_v, toks_f, labs_t, V: int) -> BucketLDAState:
    """Per-bucket :func:`init_counts` with a shared topic-word table."""
    K = labs_t[0].shape[1]
    n_vk = jnp.zeros((V, K), jnp.float32)
    n_k = jnp.zeros((K,), jnp.float32)
    zs, ndks = [], []
    for g, (tv, tf, lb) in enumerate(zip(toks_v, toks_f, labs_t)):
        c = init_counts(jax.random.fold_in(key, g), tv, tf, lb, V)
        zs.append(c.z)
        ndks.append(c.n_dk)
        n_vk = n_vk + c.n_vk
        n_k = n_k + c.n_k
    return BucketLDAState(z=tuple(zs), n_dk=tuple(ndks), n_vk=n_vk, n_k=n_k)


def train_sweep_buckets(
    key, state: BucketLDAState, toks_v, toks_f, labs_t, alpha: float, beta: float
) -> BucketLDAState:
    """One full sweep over all buckets (sequential buckets, exact counts)."""
    n_vk, n_k = state.n_vk, state.n_k
    zs, ndks = [], []
    for g, (tv, tf, lb) in enumerate(zip(toks_v, toks_f, labs_t)):
        c = train_sweep(
            jax.random.fold_in(key, g),
            LDACounts(z=state.z[g], n_dk=state.n_dk[g], n_vk=n_vk, n_k=n_k),
            tv, tf, lb, alpha, beta,
        )
        n_vk, n_k = c.n_vk, c.n_k
        zs.append(c.z)
        ndks.append(c.n_dk)
    return BucketLDAState(z=tuple(zs), n_dk=tuple(ndks), n_vk=n_vk, n_k=n_k)


class CompactBucketState(NamedTuple):
    """Compact-support Gibbs state over length-bucketed documents."""

    z: Tuple[jax.Array, ...]  # per bucket (D_g, U_g) compact slot index
    n_dk: Tuple[jax.Array, ...]  # per bucket (D_g, A)
    n_vk: jax.Array  # (V, K) dense
    n_k: jax.Array  # (K,)


def init_bucket_counts_compact(
    key, toks_v, toks_f, lab_ids_t, lab_valid_t, V: int, K: int
) -> CompactBucketState:
    """Per-bucket :func:`init_counts_compact` with shared global tables."""
    n_vk = jnp.zeros((V, K), jnp.float32)
    n_k = jnp.zeros((K,), jnp.float32)
    zs, ndks = [], []
    for g, (tv, tf, li, lv) in enumerate(zip(toks_v, toks_f, lab_ids_t, lab_valid_t)):
        c = init_counts_compact(jax.random.fold_in(key, g), tv, tf, li, lv, V, K)
        zs.append(c.z)
        ndks.append(c.n_dk)
        n_vk = n_vk + c.n_vk
        n_k = n_k + c.n_k
    return CompactBucketState(z=tuple(zs), n_dk=tuple(ndks), n_vk=n_vk, n_k=n_k)


def train_sweep_buckets_compact(
    key, state: CompactBucketState, toks_v, toks_f, lab_ids_t, lab_valid_t,
    alpha: float, beta: float,
) -> CompactBucketState:
    """One full compact sweep over all buckets (sequential buckets, exact)."""
    n_vk, n_k = state.n_vk, state.n_k
    zs, ndks = [], []
    for g, (tv, tf, li, lv) in enumerate(zip(toks_v, toks_f, lab_ids_t, lab_valid_t)):
        c = train_sweep_compact(
            jax.random.fold_in(key, g),
            CompactLDACounts(z=state.z[g], n_dk=state.n_dk[g], n_vk=n_vk, n_k=n_k),
            tv, tf, li, lv, alpha, beta,
        )
        n_vk, n_k = c.n_vk, c.n_k
        zs.append(c.z)
        ndks.append(c.n_dk)
    return CompactBucketState(z=tuple(zs), n_dk=tuple(ndks), n_vk=n_vk, n_k=n_k)


def cascade_test_loop(
    key: jax.Array,
    tok_v: jax.Array,  # (R, U) int32 — one row per (doc, tree-node) task
    tok_f: jax.Array,  # (R, U) int32
    phi_vk: jax.Array,  # (V, Kglob) float32 — trained global topic-word table
    lab_ids: jax.Array,  # (R, Kt) int32 — task-local topic -> global topic id
    lab_mask: jax.Array,  # (R, Kt) float — 1 valid local topic, 0 padding
    it: int,
    thinning: int,
    alpha: float,
    beta: float,
) -> jax.Array:
    """Batched CascadeLDA node-level fold-in inference (CascadeLDA.py:186-247).

    Each row is one (document, tree-node) task whose local topic axis is an
    indexed slice of the global φ table (slot 0 = the node's local root).
    Reproduces the reference semantics exactly:

    * init (``prep4test``): z ~ Categorical over ``(φ[k,v]+β)/Σ_k`` with the
      local root's probability forced to ``1/ld`` (ld = # unique types),
    * sweeps (``cascade_test``): p(z=k) ∝ (n_dk+α)·φ[k,v], with degenerate
      all-zero rows recovered as (n_dk+α)·(φ[k,v]+β) (the reference's
      FloatingPointError branch, CascadeLDA.py:224-229),
    * thinned running average of the normalised local counts.

    Returns ``avg (R, Kt)`` — the per-task θ̂ over local topics.
    """
    R, U = tok_v.shape
    Kt = lab_ids.shape[1]
    mask_logits = mask_to_logits(lab_mask)
    ld = jnp.maximum((tok_f > 0).sum(axis=1), 1).astype(jnp.float32)  # (R,)
    k_init, k_sweeps = jax.random.split(key)

    def local_phi(v):  # (R,) token ids -> (R, Kt) φ gathered per task
        rows = phi_vk[v]  # (R, Kglob)
        return jnp.take_along_axis(rows, lab_ids, axis=1)

    # ---- init (prep4test)
    init_keys = jax.random.split(k_init, U)

    def init_step(n_dk, xs):
        v, f, k = xs
        p = local_phi(v) + beta
        p = p / jnp.maximum((p * lab_mask).sum(axis=1, keepdims=True), 1e-38)
        p = p.at[:, 0].set(1.0 / ld)
        logits = jnp.log(jnp.maximum(p, 1e-38)) + mask_logits
        z = gumbel_argmax(k, logits, axis=1)
        n_dk = n_dk + f[:, None] * _one_hot_i32(z, Kt)
        return n_dk, z

    n_dk, z_t = jax.lax.scan(
        init_step, jnp.zeros((R, Kt), jnp.int32), (tok_v.T, tok_f.T, init_keys)
    )
    z = z_t.T

    # ---- it sweeps with thinned averaging
    save = (jnp.arange(it, dtype=jnp.int32) + 1) % thinning == 0
    sweep_keys = jax.random.split(k_sweeps, it)

    def sweep(carry, xs):
        z, n_dk, avg, s = carry
        key_i, save_i = xs
        pos_keys = jax.random.split(key_i, U)

        def step(n_dk, xs):
            v, f, z_old, k = xs
            n_dk = n_dk - f[:, None] * _one_hot_i32(z_old, Kt)
            lp_doc = jnp.log(n_dk.astype(jnp.float32) + alpha)
            lphi = jnp.log(jnp.maximum(local_phi(v), 0.0))  # -inf where φ==0
            logp = lp_doc + lphi + mask_logits
            dead = ~jnp.any(jnp.isfinite(logp), axis=1, keepdims=True)
            logp_fb = lp_doc + jnp.log(local_phi(v) + beta) + mask_logits
            logp = jnp.where(dead, logp_fb, logp)
            z_new = gumbel_argmax(k, logp, axis=1)
            z_new = jnp.where(f > 0, z_new, z_old)
            n_dk = n_dk + f[:, None] * _one_hot_i32(z_new, Kt)
            return n_dk, z_new

        n_dk, z_t = jax.lax.scan(
            step, n_dk, (tok_v.T, tok_f.T, z.T, pos_keys)
        )
        z = z_t.T

        def on_save(_):
            tot = n_dk.sum(axis=1, keepdims=True).astype(jnp.float32)
            cur = n_dk.astype(jnp.float32) / jnp.maximum(tot, 1.0)
            s2 = s + 1
            f32 = s2.astype(jnp.float32)
            new = (f32 - 1.0) / f32 * avg + cur / f32
            return jnp.where(f32 <= 1.0, cur, new), s2

        avg, s = jax.lax.cond(save_i, on_save, lambda _: (avg, s), None)
        return (z, n_dk, avg, s), None

    carry0 = (z, n_dk, jnp.zeros((R, Kt), jnp.float32), jnp.int32(0))
    (z, n_dk, avg, _), _ = jax.lax.scan(sweep, carry0, (sweep_keys, save))
    return avg


def log_likelihood(
    theta: jax.Array,  # (D, K)
    phi_vk: jax.Array,  # (V, K)
    tok_v: jax.Array,
    tok_f: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Σ_{d,v} f · log ⟨θ_d, φ_v⟩ and the total token count.

    Used for training perplexity exp(−ll/N) (reference LabeledLDA.py:256-265).
    """

    def step(acc, xs):
        v, f = xs
        inner = jnp.sum(theta * phi_vk[v], axis=1)  # (D,)
        safe = jnp.where(f > 0, jnp.log(jnp.maximum(inner, 1e-38)), 0.0)
        return acc + jnp.sum(f * safe), None

    acc, _ = jax.lax.scan(step, jnp.float32(0.0), (tok_v.T, tok_f.T))
    return acc, tok_f.sum()
