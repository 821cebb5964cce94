"""Whole-sweep fused collapsed-Gibbs kernel (one ``pallas_call`` per sweep).

Round 2 established that the position-major XLA sweep (ops/gibbs.py) is
bound by per-scan-step overhead, and that a per-position Pallas kernel
cannot win because every XLA→Mosaic boundary crossing restages VMEM state.
This module removes the boundary from the loop entirely — the TPU-native
design the north star asks for:

**Algorithm (merge-block Gibbs).**  The reference sweep
(LabeledLDA.py:101-125) resamples one (doc, token-type) slot at a time
against *live* counts.  Here a block of ``M`` sweeps runs against a
topic-word table ``n_vk``/``n_k`` **frozen at block start** (each slot's own
start-of-block contribution is excluded exactly, so a document never sees
its own token double-counted), while the doc-topic counts ``n_dk`` stay
exactly live throughout.  Block end: one batched scatter commits all count
deltas and re-freezes.  This is the AD-LDA family of samplers (the same
approximation parallel/sharded.py makes *across* data shards, applied to
the time axis): within-document dependencies — the ones that drive mixing
in labeled LDA — are exact; cross-document coupling through φ lags at most
``M`` sweeps.  ``M = 1`` corresponds to textbook single-merge-per-sweep
AD-LDA on one worker.  Quality at thesis scale is re-validated in
PARITY.md (fused rows).

**Why this maps to the TPU.**  Labeled LDA's posterior is zero outside a
document's admissible labels (root ∪ its JEL codes; LabeledLDA.py:113-117),
so all per-document state lives on the compact ``A``-slot axis (A = max
labels/doc, ~24) in an ``(A sublanes, D lanes)`` layout — no wasted lanes.
Freezing the table for ``M`` sweeps means the per-slot topic-word counts
can be **gathered once per block** (XLA row gather + lane pick) and the
count deltas **scattered once per block** (only the first/last z of each
slot matter — intermediate flips cancel) — the irreducible random-access
table traffic is amortised ``M``-fold, and everything between runs inside
one Pallas kernel: grid ``(M, U)``; ``n_dk`` and the z matrix live in VMEM
scratch for the whole block; the categorical draw is the exact
linear-domain inverse-CDF (cumsum as an ``(A, A)`` MXU matmul, one uniform
per slot — the reference's multinomial semantics without its
renormalisation hacks, LabeledLDA.py:170-171).

An XLA twin (:func:`fused_block_xla`) implements the identical algorithm
with the same op order and is bitwise-equal to the kernel given the same
uniforms (tests/test_fused_parity.py); it is the portable path on CPU.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

# Bumped whenever the fused sampler's floating-point op ORDER changes (even
# value-preserving refactors like pre-biasing n_k by V*beta re-round
# differently at large counts).  Checkpoints written by a fused-sweep run
# carry this stamp; utils/checkpoint.restore_model warns when resuming a
# chain recorded under a different formula — the draws will no longer be
# bit-identical to the uninterrupted run of the recording version.
SAMPLER_FORMULA_VERSION = 2

__all__ = [
    "SAMPLER_FORMULA_VERSION",
    "FusedLDAState",
    "FusedBucketState",
    "fused_pallas_supported",
    "select_merge_block",
    "init_fused",
    "init_fused_buckets",
    "fused_train_block",
    "fused_train_block_buckets",
    "gather_cv",
    "theta_from_fused",
    "densify_ndk_fused",
]


class FusedLDAState(NamedTuple):
    """Gibbs state in the fused layout (position-major, compact topics).

    ``z (U, D)`` — compact label-slot index of each type position,
    ``n_dk (A, D)`` — compact doc-topic counts (A sublanes, D lanes),
    ``n_vk (V, K)`` / ``n_k (K,)`` — dense global tables.
    """

    z: jax.Array
    n_dk: jax.Array
    n_vk: jax.Array
    n_k: jax.Array


def select_merge_block(merge_every: int, thinning: int, budget: int) -> int:
    """Merge-block size M for a training run.

    Largest divisor of ``thinning`` ≤ ``merge_every`` — so thinned saves
    always land on freshly committed counts — additionally capped at
    ``budget // 8`` for tiny total budgets: freezing the table for half of
    a 4-sweep run costs real AUC (measured ~−0.03 at the reference's (4; 4)
    config, PARITY.md), while at thesis scale the cap is inactive.  Both
    the single-chip model and the distributed trainer MUST use this one
    function: chunk-invariant (bit-identical) resume requires the same M
    for the chunked and the uninterrupted run, which is why ``budget`` is
    the *total planned* sweeps, not the current call's.
    """
    cap = min(int(merge_every), max(1, int(budget) // 8))
    return max((m for m in range(1, cap + 1) if int(thinning) % m == 0),
               default=1)


def fused_pallas_supported() -> bool:
    """Fused whole-sweep kernel runs on accelerator backends by default
    (``LDA_NO_PALLAS=1`` forces the bitwise-equal XLA twin)."""
    if os.environ.get("LDA_NO_PALLAS"):
        return False
    return jax.default_backend() not in ("cpu",)


# --------------------------------------------------------------------------
# staged table access (XLA): gather once per block, scatter once per block
# --------------------------------------------------------------------------


def gather_cv(n_vk: jax.Array, tok_v_t: jax.Array, lab_ids: jax.Array,
              chunk: int = 16, identity_slots: bool = False,
              max_transient_bytes: int = 2 << 30,
              table_i16: bool = False) -> jax.Array:
    """(U, A, D) per-slot topic-word counts ``n_vk[v_ud, lab_ids[d, a]]``.

    **Doc-major** row gather + an MXU one-hot contraction for the lane
    pick; one invocation per merge block (the table is frozen inside a
    block, so slots can be gathered in bulk).  Two round-5 profile findings
    shape this:

    * the row gather dominates the whole merge block (18 ms of a 28 ms
      M=25 block at corpus shapes, TRACE_r05.json) and is LOCALITY bound:
      bow type lists are v-ascending per document, so gathering along the
      doc-major axis (consecutive indices ascending) runs ~2× faster than
      the position-major transpose (6.8 ms vs 13.1 ms measured for the raw
      gather, 9.2 ms vs 13.9 ms for gather+pick);
    * the contraction replaces a ``take_along_axis`` element gather — TPU
      element gathers serialise (20 ms/block measured vs 6 ms matmul form)
      — and is EXACT: each output row is ``x·1 + Σ x'·0``, bitwise equal
      to the picked element (HIGHEST precision: the default truncates the
      f32 counts to bf16 in the MXU; bf16x3 reconstructs them bitwise).

    The whole-U gather materialises a transient ``(D, U, K)`` f32 view
    (~1 GiB at corpus shapes); when that would exceed
    ``max_transient_bytes`` the gather falls back to the chunked scan over
    U (same picks, bounded memory).

    ``identity_slots=True`` — the dense-K case (all topics admissible,
    LocalLDA): the caller guarantees ``lab_ids[d, a] == a`` for every valid
    slot, so the lane pick degenerates to a slice + transpose of the row
    gather, skipping the (A, K) contraction entirely.  Bitwise-equal to the
    one-hot path on valid slots; pad slots (valid = 0) may hold different
    — but equally unused — finite values (their posterior weight is exactly
    ``0 * finite = 0`` either way, so draws and count updates are
    bit-identical).

    ``table_i16=True`` — gather through an int16 view of the table: halves
    the gather's HBM traffic (9.2 → 7.7 ms measured at corpus shapes,
    converted back to f32 inside the einsum's operand load).  EXACT — and
    only legal — when every table entry fits int16; each ``n_vk[v, k]`` is
    a non-negative integer bounded by word ``v``'s total corpus frequency
    (row sums are invariant), so the CALLER must gate this on the host-side
    bound ``max_v Σ_d f_dv < 32768`` (models compute it at init; verified
    bitwise-equal on chip against the f32 path).
    """
    U, D = tok_v_t.shape
    A = lab_ids.shape[1]
    K = n_vk.shape[1]
    if table_i16:
        n_vk = n_vk.astype(jnp.int16)
    hp = dict(precision=jax.lax.Precision.HIGHEST,
              preferred_element_type=jnp.float32)
    if U * D * K * 4 <= max_transient_bytes:
        rows = n_vk[tok_v_t.T]  # (D, U, K) — doc-major: ascending v rows
        if table_i16:
            rows = rows.astype(jnp.float32)
        if identity_slots:
            return rows[:, :, :A].transpose(1, 2, 0)  # (U, A, D)
        oh_li = jax.nn.one_hot(lab_ids, K, dtype=jnp.float32)  # (D, A, K)
        return jnp.einsum("duk,dak->uad", rows, oh_li, **hp)

    ch = chunk
    while U % ch:
        ch //= 2
    if not identity_slots:
        oh_li = jax.nn.one_hot(lab_ids, K, dtype=jnp.float32)  # (D, A, K)
    tok_v = tok_v_t.T  # (D, U) doc-major

    def step(_, us):  # us: (ch,) position indices
        rows = n_vk[tok_v[:, us]]  # (D, ch, K)
        if table_i16:
            rows = rows.astype(jnp.float32)
        if identity_slots:
            cv = rows[:, :, :A].transpose(1, 2, 0)  # (ch, A, D)
        else:
            cv = jnp.einsum("dck,dak->cad", rows, oh_li, **hp)  # (ch, A, D)
        return None, cv

    _, cv = jax.lax.scan(
        step, None, jnp.arange(U, dtype=jnp.int32).reshape(U // ch, ch))
    return cv.reshape(U, A, D)


def _slot_to_global(lab_ids: jax.Array, z: jax.Array) -> jax.Array:
    """(U, D) global topic ids from compact slot indices — an unrolled
    select-sum over the A slots instead of ``take_along_axis`` (TPU element
    gathers serialise: 5.7 ms vs 1.6 ms per block at corpus shapes)."""
    A = lab_ids.shape[1]
    out = jnp.zeros(z.shape, jnp.int32)
    for a in range(A):
        out = jnp.where(z == a, lab_ids[:, a][None, :], out)
    return out


def _scatter_deltas(n_vk, tok_v_t, tok_f_t, lab_ids, z0, z1):
    """Commit a block's count deltas: only first/last z per slot matter."""
    zg0 = _slot_to_global(lab_ids, z0)  # (U, D) global ids
    zg1 = _slot_to_global(lab_ids, z1)
    vf = tok_v_t.reshape(-1)
    ff = tok_f_t.reshape(-1)
    n_vk = n_vk.at[vf, zg0.reshape(-1)].add(-ff)
    n_vk = n_vk.at[vf, zg1.reshape(-1)].add(ff)
    return n_vk, n_vk.sum(axis=0)


# --------------------------------------------------------------------------
# the whole-block kernel (grid (M, U); z and n_dk resident in VMEM)
# --------------------------------------------------------------------------


def _pick_ub(U: int) -> int:
    """Positions per grid step: the largest power of two ≤ 8 dividing U.

    Per-grid-step overhead (~15 µs of windowing/bookkeeping on a v5e)
    dominates the per-position compute (~3 µs on (A, D) tiles), so the
    kernel processes ``UB`` positions per step with the position loop
    unrolled inside the body — measured ~2.5× at UB=8 over UB=1."""
    ub = 8
    while U % ub:
        ub //= 2
    return max(ub, 1)


@functools.lru_cache(maxsize=None)
def _build_block_kernel(M: int, U: int, A: int, D: int,
                        alpha: float, beta: float):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    UB = _pick_ub(U)
    n_ub = U // UB

    def kernel(cv_ref, f_ref, u_ref, z0_ref, nkg_ref, valid_ref, ndk0_ref,
               tril_ref, zout_ref, ndk_ref, z_scr):
        m = pl.program_id(0)
        ub = pl.program_id(1)

        @pl.when(jnp.logical_and(m == 0, ub == 0))
        def _():
            ndk_ref[:] = ndk0_ref[:]

        @pl.when(m == 0)
        def _():
            z_scr[pl.ds(ub * UB, UB), :] = z0_ref[:, 0, :]

        a_ids = jax.lax.broadcasted_iota(jnp.int32, (A, D), 0)
        ndk = ndk_ref[:]
        # position loop unrolled inside the step — identical op order per
        # position as the original (M, U) grid, so the XLA twin stays
        # bitwise-equal WITHIN this formula version.  Round-5 ADVICE: the
        # pre-biased nkg ((n_k+Vβ)−f) can differ by an ULP from round-3's
        # ((n_k−f)+Vβ), so cross-version resume parity is NOT claimed —
        # checkpoints carry SAMPLER_FORMULA_VERSION and restore warns on
        # mismatch (utils/checkpoint.py).
        for j in range(UB):
            f = f_ref[pl.ds(j, 1), 0, :]  # (1, D)
            z_start = z0_ref[pl.ds(j, 1), 0, :]  # (1, D) — block-start z
            z_old = z_scr[pl.ds(ub * UB + j, 1), :]  # (1, D) — current z

            # own-token exclusion against the FROZEN table uses z_start;
            # the live n_dk decrement uses the current z
            oh_start = jnp.where(a_ids == z_start, f, 0.0)
            oh_old = jnp.where(a_ids == z_old, f, 0.0)

            ndk_m = ndk - oh_old
            cv_eff = cv_ref[pl.ds(j, 1), :, :][0] - oh_start
            nk_eff = nkg_ref[:] - oh_start
            # nkg arrives pre-biased by V*beta (a traced value — baking it
            # into the kernel would recompile per corpus split)
            w = valid_ref[:] * (ndk_m + alpha) * (cv_eff + beta) * (
                1.0 / nk_eff)
            c = jnp.dot(tril_ref[:], w, preferred_element_type=jnp.float32)
            r = u_ref[pl.ds(j, 1), 0, :] * c[A - 1 : A, :]
            z_new = jnp.sum((c < r).astype(jnp.int32), axis=0, keepdims=True)
            z_new = jnp.where(f > 0, z_new, z_old)

            oh_new = jnp.where(a_ids == z_new, f, 0.0)
            ndk = ndk_m + oh_new
            z_scr[pl.ds(ub * UB + j, 1), :] = z_new

            @pl.when(m == M - 1)
            def _():
                zout_ref[pl.ds(j, 1), 0, :] = z_new

        ndk_ref[:] = ndk

    grid = (M, n_ub)
    in_specs = [
            pl.BlockSpec((UB, A, D), lambda m, ub: (ub, 0, 0),
                         memory_space=pltpu.VMEM),  # cv (U, A, D)
            pl.BlockSpec((UB, 1, D), lambda m, ub: (ub, 0, 0),
                         memory_space=pltpu.VMEM),  # f (U, 1, D)
            pl.BlockSpec((UB, 1, D), lambda m, ub: (m * n_ub + ub, 0, 0),
                         memory_space=pltpu.VMEM),  # uniforms (M*U, 1, D)
            pl.BlockSpec((UB, 1, D), lambda m, ub: (ub, 0, 0),
                         memory_space=pltpu.VMEM),  # z0 (U, 1, D)
            pl.BlockSpec((A, D), lambda m, ub: (0, 0),
                         memory_space=pltpu.VMEM),  # nkg
            pl.BlockSpec((A, D), lambda m, ub: (0, 0),
                         memory_space=pltpu.VMEM),  # valid
            pl.BlockSpec((A, D), lambda m, ub: (0, 0),
                         memory_space=pltpu.VMEM),  # ndk0
            pl.BlockSpec((A, A), lambda m, ub: (0, 0),
                         memory_space=pltpu.VMEM),  # tril
    ]
    out_specs = (
        pl.BlockSpec((UB, 1, D), lambda m, ub: (ub, 0, 0),
                     memory_space=pltpu.VMEM),  # z_out (U, 1, D)
        pl.BlockSpec((A, D), lambda m, ub: (0, 0),
                     memory_space=pltpu.VMEM),  # n_dk out
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((U, 1, D), jnp.int32),
            jax.ShapeDtypeStruct((A, D), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((U, D), jnp.int32)],
    )


def fused_block_xla(cv_all, tok_f_t, uniforms, z0, nkg, valid, ndk0, tril,
                    alpha: float, beta: float, M: int):
    """XLA twin of the whole-block kernel — identical op order, bitwise-equal
    given the same uniforms.  ``uniforms (M, U, D)``; ``nkg`` pre-biased by
    V*beta exactly as the kernel input is."""
    U, D = z0.shape
    A = ndk0.shape[0]
    a_ids = jax.lax.broadcasted_iota(jnp.int32, (A, D), 0)

    def sweep(carry, u_m):
        z, ndk = carry  # (U, D), (A, D)

        def step(ndk, xs):
            cv, f, uu, z_start, z_old = xs
            f = f[None, :]
            z_start = z_start[None, :]
            z_old = z_old[None, :]
            oh_start = jnp.where(a_ids == z_start, f, 0.0)
            oh_old = jnp.where(a_ids == z_old, f, 0.0)
            ndk_m = ndk - oh_old
            cv_eff = cv - oh_start
            nk_eff = nkg - oh_start
            w = valid * (ndk_m + alpha) * (cv_eff + beta) * (
                1.0 / nk_eff)
            c = jnp.dot(tril, w, preferred_element_type=jnp.float32)
            r = uu[None, :] * c[A - 1 : A, :]
            z_new = jnp.sum((c < r).astype(jnp.int32), axis=0, keepdims=True)
            z_new = jnp.where(f > 0, z_new, z_old)
            oh_new = jnp.where(a_ids == z_new, f, 0.0)
            return ndk_m + oh_new, z_new[0]

        ndk, z_new = jax.lax.scan(step, ndk, (cv_all, tok_f_t, u_m, z0, z))
        return (z_new, ndk), None

    (z, ndk), _ = jax.lax.scan(sweep, (z0, ndk0), uniforms)
    return z, ndk


def fused_train_block(
    key: jax.Array,
    state: FusedLDAState,
    tok_v_t: jax.Array,  # (U, D) int32, position-major
    tok_f_t: jax.Array,  # (U, D) float32
    lab_ids: jax.Array,  # (D, A) int32
    lab_valid_t: jax.Array,  # (A, D) float32
    alpha: float,
    beta: float,
    M: int,
    vbeta: float | None = None,
    identity_slots: bool = False,
    table_i16: bool = False,
) -> FusedLDAState:
    """``M`` Gibbs sweeps against the block-start table + one delta commit.

    ``vbeta`` — the posterior denominator's smoothing constant ``V*beta``
    (LabeledLDA.py:116).  Defaults to the table's own row count, which is
    exact for unpadded tables; callers whose table carries *padded* vocab
    rows (parallel/vocab_sharded.py pads V to a multiple of the shard
    count) MUST pass the true ``V*beta`` or the denominator silently
    diverges from every other sampler path.

    ``identity_slots`` — dense-K mode (see :func:`gather_cv`): the compact
    slot axis IS the topic axis (``lab_ids[d, a] == a`` on valid slots),
    which is how LocalLDA (all K topics admissible, LocalLDA.py:60-84)
    rides this kernel without a per-slot table gather.

    ``table_i16`` — halve the block gather's HBM traffic via an int16 table
    view (see :func:`gather_cv`); the CALLER must guarantee every table
    entry stays < 32768 (true iff the corpus' max term frequency does —
    models compute the bound at init).
    """
    U, D = tok_v_t.shape
    A = lab_ids.shape[1]
    V, K = state.n_vk.shape
    if vbeta is None:
        vbeta = float(V * beta)
    vbeta = jnp.asarray(vbeta, jnp.float32)  # traced: no per-split recompile
    tril = jnp.tril(jnp.ones((A, A), jnp.float32))

    cv_all = gather_cv(state.n_vk, tok_v_t, lab_ids,
                       identity_slots=identity_slots, table_i16=table_i16)
    # (A, D) frozen block-start totals, pre-biased by V*beta — the kernel
    # and its XLA twin divide by (nkg - own_token) directly.  The slot pick
    # n_k[lab_ids] is an MXU one-hot contraction, not an element gather
    # (TPU element gathers serialise — 1.9 ms measured vs sub-ms for the
    # matmul form, round-5 block bisect); identical exactness argument as
    # gather_cv: each output is x·1 + Σ x'·0, bitwise the picked element,
    # and the (D, A, K) one-hot is shared with gather_cv's lane pick.
    if identity_slots:
        nkg = jnp.broadcast_to(state.n_k[:A, None], (A, D)) + vbeta
    else:
        oh_li = jax.nn.one_hot(lab_ids, K, dtype=jnp.float32)
        nkg = jnp.einsum("dak,k->ad", oh_li, state.n_k,
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32) + vbeta
    uniforms = jax.random.uniform(key, (M, U, D), dtype=jnp.float32)

    if fused_pallas_supported():
        call = _build_block_kernel(M, U, A, D, float(alpha), float(beta))
        z_out, ndk = call(
            cv_all,
            tok_f_t.reshape(U, 1, D),
            uniforms.reshape(M * U, 1, D),
            state.z.reshape(U, 1, D),
            nkg,
            lab_valid_t,
            state.n_dk,
            tril,
        )
        z1 = z_out.reshape(U, D)
    else:
        z1, ndk = fused_block_xla(
            cv_all, tok_f_t, uniforms, state.z, nkg, lab_valid_t,
            state.n_dk, tril, alpha, beta, M,
        )

    n_vk, n_k = _scatter_deltas(
        state.n_vk, tok_v_t, tok_f_t, lab_ids, state.z, z1
    )
    return FusedLDAState(z=z1, n_dk=ndk, n_vk=n_vk, n_k=n_k)


# --------------------------------------------------------------------------
# init / estimators
# --------------------------------------------------------------------------


def init_fused(
    key: jax.Array,
    tok_v: jax.Array,  # (D, U) int32 doc-major
    tok_f: jax.Array,  # (D, U) int32
    lab_ids: jax.Array,  # (D, A)
    lab_valid: jax.Array,  # (D, A)
    V: int,
    K: int,
) -> FusedLDAState:
    """z ~ uniform over each doc's admissible labels (LabeledLDA.py:85-92),
    relayouted to the fused (position-major / (A, D)) frame."""
    from .gibbs import init_counts_compact

    c = init_counts_compact(key, tok_v, tok_f, lab_ids, lab_valid, V, K)
    return FusedLDAState(
        z=c.z.T,  # (U, D)
        n_dk=c.n_dk.T,  # (A, D)
        n_vk=c.n_vk,
        n_k=c.n_k,
    )


class FusedBucketState(NamedTuple):
    """Fused-layout Gibbs state over length-bucketed documents (shared
    global tables, per-bucket position-major z / compact n_dk)."""

    z: Tuple[jax.Array, ...]  # per bucket (U_g, D_g)
    n_dk: Tuple[jax.Array, ...]  # per bucket (A, D_g)
    n_vk: jax.Array  # (V, K)
    n_k: jax.Array  # (K,)


def init_fused_buckets(
    key, toks_v, toks_f, lab_ids_t, lab_valid_t, V: int, K: int
) -> FusedBucketState:
    """Per-bucket :func:`init_fused` with shared global tables."""
    n_vk = jnp.zeros((V, K), jnp.float32)
    n_k = jnp.zeros((K,), jnp.float32)
    zs, ndks = [], []
    for g, (tv, tf, li, lv) in enumerate(zip(toks_v, toks_f, lab_ids_t, lab_valid_t)):
        c = init_fused(jax.random.fold_in(key, g), tv, tf, li, lv, V, K)
        zs.append(c.z)
        ndks.append(c.n_dk)
        n_vk = n_vk + c.n_vk
        n_k = n_k + c.n_k
    return FusedBucketState(z=tuple(zs), n_dk=tuple(ndks), n_vk=n_vk, n_k=n_k)


def fused_train_block_buckets(
    key,
    state: FusedBucketState,
    toks_v_t,  # per bucket (U_g, D_g) position-major
    toks_f_t,  # per bucket (U_g, D_g) float32
    lab_ids_t,  # per bucket (D_g, A)
    lab_valid_tt,  # per bucket (A, D_g)
    alpha: float,
    beta: float,
    M: int,
    identity_slots: bool = False,
    table_i16: bool = False,
) -> FusedBucketState:
    """One ``M``-sweep merge block over all buckets.

    Buckets run sequentially; each bucket's delta commit lands before the
    next bucket gathers, so cross-bucket coupling is as fresh as in the
    exact bucketed sweep — only the within-block table freeze is new.
    """
    n_vk, n_k = state.n_vk, state.n_k
    zs, ndks = [], []
    for g, (tv, tf, li, lv) in enumerate(
        zip(toks_v_t, toks_f_t, lab_ids_t, lab_valid_tt)
    ):
        st = FusedLDAState(z=state.z[g], n_dk=state.n_dk[g], n_vk=n_vk, n_k=n_k)
        st = fused_train_block(
            jax.random.fold_in(key, g), st, tv, tf, li, lv, alpha, beta, M,
            identity_slots=identity_slots, table_i16=table_i16,
        )
        n_vk, n_k = st.n_vk, st.n_k
        zs.append(st.z)
        ndks.append(st.n_dk)
    return FusedBucketState(z=tuple(zs), n_dk=tuple(ndks), n_vk=n_vk, n_k=n_k)


def densify_ndk_fused(n_dk_t: jax.Array, lab_ids: jax.Array, K: int) -> jax.Array:
    """(A, D) compact counts -> dense (D, K)."""
    from .gibbs import densify_ndk

    return densify_ndk(n_dk_t.T, lab_ids, K)


def theta_from_fused(
    n_dk_t: jax.Array, lab_ids: jax.Array, lab_valid: jax.Array,
    alpha: float, K: int,
) -> jax.Array:
    """Dense (D, K) label-masked θ (LabeledLDA.py:236-239)."""
    from .gibbs import theta_from_compact

    return theta_from_compact(n_dk_t.T, lab_ids, lab_valid, alpha, K)
