"""Labeled LDA (Ramage '09) — TPU-native implementation.

API mirrors the reference class (LabeledLDA.py:49-265) so a reference user
finds the same surface: ``LabeledLDA(docs, labs, labelset, dicti, alpha,
beta)``, ``run_training(iters, thinning)``, ``run_test(newdocs, it,
thinning)``, ``get_phi/get_theta``, ``topwords_per_topic``, ``perplexity``,
``get_pred(s)`` — but training/test sweeps are compiled JAX scans over dense
count tensors (see ops/gibbs.py) instead of per-token Python loops.
Documents are length-bucketed (data/buckets.py, ``n_buckets=4`` default) to
cut padding compute — exact Gibbs, just a document visiting order.  Round 2
kept one bucket (the sweep was bound by per-scan-step overhead, so
fewer/larger steps won); the round-5 fused kernel is volume-bound, and the
abstracts (U=128 padded vs mean 45 types) fill only ~35% of the single-
bucket grid — 4 buckets cut the padded area 2.4× and measure 384–401M
tokens/s vs 243–250M at one bucket (A/B at the bench config).  The
thinned-average/RNG structure is unchanged; bucket layout is part of the
draw stream, so checkpoints record and validate ``n_buckets``.

Numerically deliberate deviations from the reference (documented per
SURVEY.md §2 "bugs to not replicate"):
* categorical draws are exact inverse-CDF samples — no
  ``prob /= 1.0000000005`` renormalisation loops (LabeledLDA.py:170-171),
* test-doc z-init falls back to uniform per *slot* rather than per document
  (LabeledLDA.py:163-167 fails the whole doc if any φ column is all-zero).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.buckets import BucketedDocs, bucket_encode
from ..data.encode import binarize_labels, build_labelmap, compact_labels
from ..ops.gibbs import (
    BucketLDAState,
    CompactBucketState,
    foldin_sweep,
    init_bucket_counts,
    init_bucket_counts_compact,
    log_likelihood,
    theta_from_compact,
    to_fast_layout,
    train_sweep_buckets_compact,
    train_sweep_fast,
)
from ..ops.gibbs_fused import (
    FusedBucketState,
    fused_train_block_buckets,
    init_fused_buckets,
    select_merge_block,
    theta_from_fused,
)
from .state import (
    phi_from_counts,
    running_average,
    theta_from_counts,
)

__all__ = ["LabeledLDA"]


# --------------------------------------------------------------------------
# jitted training / test drivers (pure functions of arrays + static config)
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("iters", "thinning", "alpha", "beta", "perplexity"))
def _train_loop(
    key,
    state: BucketLDAState,
    toks_v,  # tuple of (D_g, U_g)
    toks_f,
    labs_t,  # tuple of (D_g, K)
    topic_mask,
    avg0,  # (ph_hat0 (V, K), th_hat0 tuple, s0 ()) — running-average carry-in
    iters: int,
    thinning: int,
    alpha: float,
    beta: float,
    perplexity: bool,
):
    """``iters`` Gibbs sweeps with thinned φ/θ averaging (LabeledLDA.py:127-153).

    Structured as an outer scan over save blocks of ``thinning`` sweeps so
    the (V, K)/(D, K) running-average state is only touched once per block —
    a per-iteration ``lax.cond`` would drag those arrays through every sweep
    (~2.5× slower measured on chip).  Trailing ``iters % thinning`` sweeps
    run without a save, matching the reference's multiples-only rule.
    ``avg0`` carries the running average across calls so checkpointed /
    chunked training continues the same thinned mean.

    All sweeps run in the position-major **fast layout** (padding +
    transposes hoisted out of the loop, ops/gibbs.to_fast_layout); the
    state converts back to the public (D, U)/(D, K) layout on exit only.
    """
    V, K = state.n_vk.shape
    G = len(state.z)
    Ds = tuple(int(lb.shape[0]) for lb in labs_t)
    n_blocks = iters // thinning
    rem = iters - n_blocks * thinning
    keys = jax.random.split(key, iters + 1)

    fast = [
        to_fast_layout(state.z[g], state.n_dk[g], toks_v[g], toks_f[g], labs_t[g])
        for g in range(G)
    ]
    z_t0 = tuple(f[0] for f in fast)
    ndk0 = tuple(f[1] for f in fast)
    tvs = tuple(f[2] for f in fast)
    tfs = tuple(f[3] for f in fast)
    ffs = tuple(f[4] for f in fast)
    labps = tuple(f[5] for f in fast)

    def one_sweep(carry, k):
        z_t, ndk, n_vk, n_k = carry
        zs, nds = [], []
        for g in range(G):
            zg, ng, n_vk, n_k = train_sweep_fast(
                jax.random.fold_in(k, g), z_t[g], ndk[g], n_vk, n_k,
                tvs[g], tfs[g], ffs[g], labps[g], alpha, beta,
            )
            zs.append(zg)
            nds.append(ng)
        return (tuple(zs), tuple(nds), n_vk, n_k), None

    def cur_estimates(ndk, n_vk, n_k):
        cur_ph = phi_from_counts(n_vk, n_k, beta, topic_mask)
        cur_th = tuple(
            theta_from_counts(ndk[g][: Ds[g]], labs_t[g], alpha)
            for g in range(G)
        )
        return cur_ph, cur_th

    def block(carry, block_keys):
        sweep_c, ph_hat, th_hat, s = carry
        sweep_c, _ = jax.lax.scan(one_sweep, sweep_c, block_keys)
        _, ndk, n_vk, n_k = sweep_c
        cur_ph, cur_th = cur_estimates(ndk, n_vk, n_k)
        s = s + 1
        ph_hat = running_average(ph_hat, cur_ph, s)
        th_hat = tuple(
            running_average(t, c, s) for t, c in zip(th_hat, cur_th)
        )
        if perplexity:
            ll = jnp.float32(0.0)
            n = jnp.float32(0.0)
            for g, (tv, tf) in enumerate(zip(toks_v, toks_f)):
                llg, ng = log_likelihood(cur_th[g], cur_ph, tv, tf)
                ll = ll + llg
                n = n + ng.astype(jnp.float32)
            perp = jnp.exp(-ll / jnp.maximum(n, 1.0))
        else:
            perp = jnp.float32(0.0)
        return (sweep_c, ph_hat, th_hat, s), perp

    ph0, th0, s0 = avg0
    carry0 = ((z_t0, ndk0, state.n_vk, state.n_k), ph0, th0, s0)
    ((z_t, ndk, n_vk, n_k), ph_hat, th_hat, s), perps = jax.lax.scan(
        block, carry0, keys[: n_blocks * thinning].reshape(n_blocks, thinning, 2)
    )
    if rem:
        (z_t, ndk, n_vk, n_k), _ = jax.lax.scan(
            one_sweep, (z_t, ndk, n_vk, n_k), keys[n_blocks * thinning : iters]
        )
    state = BucketLDAState(
        z=tuple(z_t[g].T[: Ds[g]].astype(jnp.int32) for g in range(G)),
        n_dk=tuple(ndk[g][: Ds[g]] for g in range(G)),
        n_vk=n_vk,
        n_k=n_k,
    )
    return state, ph_hat, th_hat, s, perps


@partial(jax.jit, static_argnames=("iters", "thinning", "alpha", "beta", "perplexity"))
def _train_loop_compact(
    key,
    state: CompactBucketState,
    toks_v,
    toks_f,
    lab_ids_t,  # tuple of (D_g, A) int32
    lab_valid_t,  # tuple of (D_g, A) float32
    topic_mask,
    avg0,
    iters: int,
    thinning: int,
    alpha: float,
    beta: float,
    perplexity: bool,
):
    """Compact-support variant of :func:`_train_loop` — identical sampler
    (see ops/gibbs.CompactLDACounts), (D, A) per-document work."""
    V, K = state.n_vk.shape
    n_blocks = iters // thinning
    rem = iters - n_blocks * thinning
    keys = jax.random.split(key, iters + 1)

    def one_sweep(state, k):
        return (
            train_sweep_buckets_compact(
                k, state, toks_v, toks_f, lab_ids_t, lab_valid_t, alpha, beta
            ),
            None,
        )

    def cur_estimates(state):
        cur_ph = phi_from_counts(state.n_vk, state.n_k, beta, topic_mask)
        cur_th = tuple(
            theta_from_compact(ndk, li, lv, alpha, K)
            for ndk, li, lv in zip(state.n_dk, lab_ids_t, lab_valid_t)
        )
        return cur_ph, cur_th

    def block(carry, block_keys):
        state, ph_hat, th_hat, s = carry
        state, _ = jax.lax.scan(one_sweep, state, block_keys)
        cur_ph, cur_th = cur_estimates(state)
        s = s + 1
        ph_hat = running_average(ph_hat, cur_ph, s)
        th_hat = tuple(
            running_average(t, c, s) for t, c in zip(th_hat, cur_th)
        )
        if perplexity:
            ll = jnp.float32(0.0)
            n = jnp.float32(0.0)
            for g, (tv, tf) in enumerate(zip(toks_v, toks_f)):
                llg, ng = log_likelihood(cur_th[g], cur_ph, tv, tf)
                ll = ll + llg
                n = n + ng.astype(jnp.float32)
            perp = jnp.exp(-ll / jnp.maximum(n, 1.0))
        else:
            perp = jnp.float32(0.0)
        return (state, ph_hat, th_hat, s), perp

    ph0, th0, s0 = avg0
    carry0 = (state, ph0, th0, s0)
    (state, ph_hat, th_hat, s), perps = jax.lax.scan(
        block, carry0, keys[: n_blocks * thinning].reshape(n_blocks, thinning, 2)
    )
    if rem:
        state, _ = jax.lax.scan(one_sweep, state, keys[n_blocks * thinning : iters])
    return state, ph_hat, th_hat, s, perps


@partial(jax.jit, static_argnames=("iters", "thinning", "alpha", "beta",
                                   "perplexity", "merge", "identity_slots",
                                   "table_i16"))
def _train_loop_fused(
    key,
    state: FusedBucketState,
    toks_v,  # tuple of (D_g, U_g) doc-major (for perplexity)
    toks_f,
    toks_v_t,  # tuple of (U_g, D_g) position-major
    toks_f_t,  # tuple of (U_g, D_g) float32
    lab_ids_t,  # tuple of (D_g, A) int32
    lab_valid_tt,  # tuple of (A, D_g) float32
    topic_mask,
    avg0,
    iters: int,
    thinning: int,
    alpha: float,
    beta: float,
    perplexity: bool,
    merge: int,
    identity_slots: bool = False,
    table_i16: bool = False,
):
    """Fused-kernel variant of :func:`_train_loop` (ops/gibbs_fused.py).

    Sweeps run in merge blocks of ``merge`` (a divisor of ``thinning``)
    against a block-frozen topic-word table — one whole-block Pallas kernel
    per bucket per block.  Thinned φ/θ saves happen at exact ``thinning``
    multiples, always on freshly committed counts.  ``identity_slots`` —
    dense-K mode (LocalLDA: slot a = topic a, no per-slot table gather;
    see ops/gibbs_fused.gather_cv).
    """
    if thinning % merge:
        raise ValueError(f"merge={merge} must divide thinning={thinning} "
                         "(use select_merge_block)")
    V, K = state.n_vk.shape
    G = len(state.z)
    n_save_blocks = iters // thinning
    blocks_per_save = thinning // merge
    rem = iters - n_save_blocks * thinning
    n_rem_blocks = (rem + merge - 1) // merge
    total_blocks = n_save_blocks * blocks_per_save + n_rem_blocks
    keys = jax.random.split(key, max(total_blocks, 1))

    def one_block(state, k):
        return (
            fused_train_block_buckets(
                k, state, toks_v_t, toks_f_t, lab_ids_t, lab_valid_tt,
                alpha, beta, merge, identity_slots=identity_slots,
                table_i16=table_i16,
            ),
            None,
        )

    def cur_estimates(state):
        cur_ph = phi_from_counts(state.n_vk, state.n_k, beta, topic_mask)
        cur_th = tuple(
            theta_from_fused(ndk, li, lv.T, alpha, K)
            for ndk, li, lv in zip(state.n_dk, lab_ids_t, lab_valid_tt)
        )
        return cur_ph, cur_th

    def save_block(carry, block_keys):
        state, ph_hat, th_hat, s = carry
        state, _ = jax.lax.scan(one_block, state, block_keys)
        cur_ph, cur_th = cur_estimates(state)
        s = s + 1
        ph_hat = running_average(ph_hat, cur_ph, s)
        th_hat = tuple(
            running_average(t, c, s) for t, c in zip(th_hat, cur_th)
        )
        if perplexity:
            ll = jnp.float32(0.0)
            n = jnp.float32(0.0)
            for g, (tv, tf) in enumerate(zip(toks_v, toks_f)):
                llg, ng = log_likelihood(cur_th[g], cur_ph, tv, tf)
                ll = ll + llg
                n = n + ng.astype(jnp.float32)
            perp = jnp.exp(-ll / jnp.maximum(n, 1.0))
        else:
            perp = jnp.float32(0.0)
        return (state, ph_hat, th_hat, s), perp

    ph0, th0, s0 = avg0
    carry0 = (state, ph0, th0, s0)
    if n_save_blocks:
        (state, ph_hat, th_hat, s), perps = jax.lax.scan(
            save_block, carry0,
            keys[: n_save_blocks * blocks_per_save].reshape(
                n_save_blocks, blocks_per_save, 2),
        )
    else:
        (state, ph_hat, th_hat, s), perps = carry0, jnp.zeros((0,), jnp.float32)
    # trailing iters % thinning sweeps run unsaved (reference multiples-only
    # rule, LabeledLDA.py:131-145); final partial block keeps merge | sweeps
    off = n_save_blocks * blocks_per_save
    left = rem
    for j in range(n_rem_blocks):
        m_j = min(merge, left)
        state = fused_train_block_buckets(
            keys[off + j], state, toks_v_t, toks_f_t, lab_ids_t,
            lab_valid_tt, alpha, beta, m_j, identity_slots=identity_slots,
            table_i16=table_i16,
        )
        left -= m_j
    return state, ph_hat, th_hat, s, perps


@partial(jax.jit, static_argnames=("it", "thinning", "alpha"))
def _test_loop(key, tok_v, tok_f, phi, topic_mask, it: int, thinning: int, alpha: float):
    """Fold-in inference for held-out docs (LabeledLDA.py:155-212), all docs in
    parallel: z-init from φ columns, then ``it`` frozen-φ sweeps with thinned
    averaging of the normalised doc-topic counts.  As in the reference, the
    average is only updated at multiples of ``thinning`` but *all* ``it``
    sweeps run — trailing ``it % thinning`` sweeps execute unsaved
    (LabeledLDA.py:199-211)."""
    D, U = tok_v.shape
    K = phi.shape[1]
    k_init, k_sweeps = jax.random.split(key)

    # --- init (prep4test): z ~ categorical(φ[:, v]), uniform slot fallback
    uniforms = jax.random.uniform(k_init, (U, D), dtype=jnp.float32)
    fF = tok_f.astype(jnp.float32)

    def init_step(n_dk, xs):
        v, ff, u = xs
        w = phi[v]  # (D, K)
        dead = jnp.sum(w, axis=1, keepdims=True) <= 0.0
        w = jnp.where(dead, topic_mask[None, :], w)
        c = jnp.cumsum(w, axis=1)
        z = jnp.sum(c < (u * c[:, -1])[:, None], axis=1).astype(jnp.int32)
        n_dk = n_dk + ff[:, None] * jax.nn.one_hot(z, K, dtype=jnp.float32)
        return n_dk, z

    n_dk, z_t = jax.lax.scan(
        init_step, jnp.zeros((D, K), jnp.float32), (tok_v.T, fF.T, uniforms)
    )
    z = z_t.T

    # --- it sweeps with thinned averaging (reference run_test); block
    # structure as in _train_loop so the average is touched once per block
    n_blocks = it // thinning
    keys = jax.random.split(k_sweeps, it + 1)

    def one_sweep(carry, k):
        z, n_dk = carry
        z, n_dk = foldin_sweep(k, z, n_dk, tok_v, tok_f, phi, alpha)
        return (z, n_dk), None

    def block(carry, block_keys):
        z, n_dk, avg, s = carry
        (z, n_dk), _ = jax.lax.scan(one_sweep, (z, n_dk), block_keys)
        tot = n_dk.sum(axis=1, keepdims=True)
        cur = n_dk / jnp.maximum(tot, 1.0)
        s = s + 1
        avg = running_average(avg, cur, s)
        return (z, n_dk, avg, s), None

    carry0 = (z, n_dk, jnp.zeros((D, K), jnp.float32), jnp.int32(0))
    (z, n_dk, avg, _), _ = jax.lax.scan(
        block, carry0, keys[: n_blocks * thinning].reshape(n_blocks, thinning, 2)
    )
    rem = it - n_blocks * thinning
    if rem:
        (z, n_dk), _ = jax.lax.scan(
            one_sweep, (z, n_dk), keys[n_blocks * thinning : it]
        )
    # z is returned so the trailing sweeps are real work (not DCE'd) and the
    # final chain state is observable; the θ̂ estimate is ``avg`` alone.
    return avg, z


# --------------------------------------------------------------------------


def _table_fits_i16(buckets) -> bool:
    """True iff every reachable topic-word count fits int16 — each
    ``n_vk[v, k]`` is bounded by word v's total corpus frequency (the row
    sum is invariant), a host-known constant.  Gates the half-traffic
    int16 block gather (ops/gibbs_fused.gather_cv(table_i16=))."""
    total = None
    for tv, tf in zip(buckets.tok_v, buckets.tok_f):
        v = np.asarray(tv).reshape(-1)
        f = np.asarray(tf).reshape(-1).astype(np.int64)
        m = int(v.max()) + 1 if v.size else 1
        acc = np.bincount(v, weights=f, minlength=m)
        if total is None:
            total = acc
        elif len(acc) > len(total):
            acc[: len(total)] += total
            total = acc
        else:
            total[: len(acc)] += acc
    return bool(total is not None and total.max() < 32768)


@jax.jit
def _ph_guards(ph):
    """Device-side runtime guards (module-level jit: one compile, reused)."""
    return (
        jnp.any(ph < 0),
        jnp.any(jnp.isnan(ph)),
        jnp.any(ph.sum(axis=1) == 0),
    )


class LabeledLDA:
    """Labeled LDA with collapsed-Gibbs training on TPU."""

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
        n_buckets: int = 4,
        sweep: str = "auto",
        merge_every: int = 25,
    ):
        self.alpha = float(alpha)
        self.beta = float(beta)
        self.dicti = dicti
        self.labelmap = build_labelmap(labelset)
        self.K = len(self.labelmap)

        self.vocab = dicti.values()
        self.w_to_v = dicti.token2id
        self.v_to_w = dicti.id2token
        self.V = len(dicti)
        self.D = len(docs)

        bows = [dicti.doc2bow(doc) for doc in docs]
        lab_mask = binarize_labels(labs, self.labelmap)

        # pad the topic axis to the TPU lane width; padded topics are masked off
        self.Kp = ((self.K + k_pad - 1) // k_pad) * k_pad
        lab_mask = np.pad(lab_mask, ((0, 0), (0, self.Kp - self.K)))
        self.topic_mask = jnp.asarray(
            (np.arange(self.Kp) < self.K).astype(np.float32)
        )

        # length-bucketed training layout (exact; see data/buckets.py)
        self.buckets: BucketedDocs = bucket_encode(bows, n_buckets=n_buckets)
        self.toks_v = tuple(jnp.asarray(x) for x in self.buckets.tok_v)
        self.toks_f = tuple(jnp.asarray(x) for x in self.buckets.tok_f)
        self.n_tokens = int(sum(int(x.sum()) for x in self.buckets.tok_f))

        # sweep kernel:
        # * "fused" (default) — whole-sweep Pallas kernel over the compact
        #   label support with merge-block (AD-LDA-on-the-time-axis) table
        #   freezing, ops/gibbs_fused.py.  Throughput scales nearly
        #   linearly with the merge block M (the amortised table
        #   gather/scatter dominates): 31M tok/s at M=5, 56M at M=10,
        #   109M at M=25 on a v5e chip; thesis-scale AUC is unchanged
        #   through M=25 (PARITY.md round-4 merge rows), and tiny budgets
        #   cap M at budget//8 (select_merge_block) so the README (4;4)
        #   config stays reference-exact.
        # * "dense" — exact per-position sampler, (D, K) lanes
        #   (ops/gibbs.train_sweep; round-2 default, 6.9 M tokens/s).
        # * "compact" — exact per-position sampler on (D, A) slots; slow on
        #   TPU (element gathers serialise) but index-friendly elsewhere.
        lab_ids, lab_valid = compact_labels(lab_mask)
        self.A = lab_ids.shape[1]
        if sweep == "auto":
            sweep = "fused"
        self.sweep = sweep
        self.merge_every = max(int(merge_every), 1)

        self._key = jax.random.PRNGKey(seed)
        self._key, k0 = jax.random.split(self._key)
        if sweep == "fused":
            self.lab_ids_t = tuple(
                jnp.asarray(lab_ids[ix]) for ix in self.buckets.doc_idx
            )
            self.lab_valid_t = tuple(
                jnp.asarray(lab_valid[ix]) for ix in self.buckets.doc_idx
            )
            self._lab_valid_tt = tuple(lv.T for lv in self.lab_valid_t)
            self._toks_v_t = tuple(tv.T for tv in self.toks_v)
            self._toks_f_t = tuple(
                tf.T.astype(jnp.float32) for tf in self.toks_f
            )
            self.counts = init_fused_buckets(
                k0, self.toks_v, self.toks_f, self.lab_ids_t, self.lab_valid_t,
                self.V, self.Kp,
            )
            self._table_i16 = _table_fits_i16(self.buckets)
        elif sweep == "compact":
            self.lab_ids_t = tuple(
                jnp.asarray(lab_ids[ix]) for ix in self.buckets.doc_idx
            )
            self.lab_valid_t = tuple(
                jnp.asarray(lab_valid[ix]) for ix in self.buckets.doc_idx
            )
            self.counts = init_bucket_counts_compact(
                k0, self.toks_v, self.toks_f, self.lab_ids_t, self.lab_valid_t,
                self.V, self.Kp,
            )
        else:
            self.labs_t = tuple(
                jnp.asarray(lab_mask[ix]) for ix in self.buckets.doc_idx
            )
            self.counts = init_bucket_counts(
                k0, self.toks_v, self.toks_f, self.labs_t, self.V
            )

        self.ph_hat = jnp.zeros((self.V, self.Kp), jnp.float32)  # (V, K) layout
        self._th_hat_t: Optional[Tuple[jnp.ndarray, ...]] = None  # device, per bucket
        self._th_hat_np: Optional[np.ndarray] = np.zeros((self.D, self.Kp), np.float32)
        self._avg_s = 0  # number of thinned saves folded into ph_hat/th_hat
        self.cur_perplx: List[float] = []

    # ---------------------------------------------------------------- train

    def _th_hat_tuple(self) -> Tuple[jnp.ndarray, ...]:
        """Per-bucket device θ̂ tuple (rebuilt from the host array if needed)."""
        if self._th_hat_t is not None:
            return self._th_hat_t
        th = self._th_hat_np
        return tuple(jnp.asarray(th[ix]) for ix in self.buckets.doc_idx)

    def _check_merge_block(self, merge: int) -> None:
        """Resume guard (shared helper, parallel/_util.py): the fused merge
        block M is budget-dependent, so a resumed run that recomputes a
        different M than the checkpointed run would silently draw a
        different chain — raise instead."""
        from ..parallel._util import check_merge_block

        check_merge_block(self, merge)

    def run_training(
        self,
        iters: int,
        thinning: int,
        perplexity: bool = True,
        continue_avg: bool = False,
        total_iters: int = None,
    ) -> None:
        """``iters`` Gibbs sweeps (reference run_training, LabeledLDA.py:127-153).

        ``continue_avg=True`` carries the thinned φ̂/θ̂ running means across
        calls (for checkpointed / chunked training); the default restarts
        them each call, as the reference does.  ``total_iters`` (chunked
        runs): the full planned sweep count, so the fused path's merge
        block matches the uninterrupted run's.
        """
        self._key, k = jax.random.split(self._key)
        if continue_avg and self._avg_s > 0:
            avg0 = (self.ph_hat, self._th_hat_tuple(), jnp.int32(self._avg_s))
        else:
            avg0 = (
                jnp.zeros((self.V, self.Kp), jnp.float32),
                tuple(
                    jnp.zeros((len(ix), self.Kp), jnp.float32)
                    for ix in self.buckets.doc_idx
                ),
                jnp.int32(0),
            )
        if self.sweep == "fused":
            budget = int(total_iters) if total_iters else int(iters)
            merge = select_merge_block(self.merge_every, int(thinning), budget)
            self._check_merge_block(merge)
            self.counts, self.ph_hat, th_hat_t, s, perps = _train_loop_fused(
                k,
                self.counts,
                self.toks_v,
                self.toks_f,
                self._toks_v_t,
                self._toks_f_t,
                self.lab_ids_t,
                self._lab_valid_tt,
                self.topic_mask,
                avg0,
                iters=int(iters),
                thinning=int(thinning),
                alpha=self.alpha,
                beta=self.beta,
                perplexity=perplexity,
                merge=int(merge),
                table_i16=getattr(self, "_table_i16", False),
            )
        elif self.sweep == "compact":
            self.counts, self.ph_hat, th_hat_t, s, perps = _train_loop_compact(
                k,
                self.counts,
                self.toks_v,
                self.toks_f,
                self.lab_ids_t,
                self.lab_valid_t,
                self.topic_mask,
                avg0,
                iters=int(iters),
                thinning=int(thinning),
                alpha=self.alpha,
                beta=self.beta,
                perplexity=perplexity,
            )
        else:
            self.counts, self.ph_hat, th_hat_t, s, perps = _train_loop(
                k,
                self.counts,
                self.toks_v,
                self.toks_f,
                self.labs_t,
                self.topic_mask,
                avg0,
                iters=int(iters),
                thinning=int(thinning),
                alpha=self.alpha,
                beta=self.beta,
                perplexity=perplexity,
            )
        self._avg_s = int(s)
        # θ̂ stays on device; host reassembly is deferred to first .th_hat access
        # (the (D, Kp) transfer is pure overhead inside the training loop)
        self._th_hat_t = th_hat_t
        self._th_hat_np = None
        if perplexity:
            perps = np.asarray(perps)
            self.cur_perplx.extend(perps[perps > 0].tolist())
        self._check_ph_hat()

    @property
    def th_hat(self) -> np.ndarray:
        """(D, Kp) thinned θ̂ in original document order (host array)."""
        if self._th_hat_np is None:
            self._th_hat_np = self.buckets.scatter_rows(
                [np.asarray(t) for t in self._th_hat_t]
            )
        return self._th_hat_np

    @th_hat.setter
    def th_hat(self, value) -> None:  # checkpoint restore path
        self._th_hat_np = np.asarray(value)
        self._th_hat_t = None

    def _check_ph_hat(self) -> None:
        """The reference's runtime guards (LabeledLDA.py:146-153), evaluated
        on device — only three booleans cross to the host."""
        neg, nan, dead = _ph_guards(self.ph_hat[:, : self.K])
        if bool(neg):
            raise ValueError("A negative value occurred in ph_hat")
        if bool(nan):
            raise ValueError("A nan has creeped into ph_hat")
        if bool(dead):
            raise ValueError("A word in dictionary has no z-value")

    # ----------------------------------------------------------------- test

    def _encode_test(self, newdocs) -> Tuple[jnp.ndarray, jnp.ndarray]:
        from ..data.encode import encode_bow_types

        bows = [self.dicti.doc2bow(doc) for doc in newdocs]
        tok_v, tok_f = encode_bow_types(bows)
        return jnp.asarray(tok_v), jnp.asarray(tok_f)

    def run_test(self, newdocs, it: int, thinning: int) -> np.ndarray:
        """Fold-in θ̂ for held-out documents; returns (n, K) including root."""
        tok_v, tok_f = self._encode_test(newdocs)
        self._key, k = jax.random.split(self._key)
        avg, _ = _test_loop(
            k,
            tok_v,
            tok_f,
            self.ph_hat,
            self.topic_mask,
            it=int(it),
            thinning=int(thinning),
            alpha=self.alpha,
        )
        return np.asarray(avg[:, : self.K])

    # ------------------------------------------------------------ estimators

    def get_phi(self) -> np.ndarray:
        """(K, V) smoothed φ — reference orientation (LabeledLDA.py:231-234)."""
        phi = phi_from_counts(self.counts.n_vk, self.counts.n_k, self.beta, self.topic_mask)
        return np.asarray(phi[:, : self.K].T)

    def get_theta(self) -> np.ndarray:
        """(D, K) label-masked θ (LabeledLDA.py:236-239)."""
        if self.sweep == "fused":
            per_bucket = [
                np.asarray(theta_from_fused(ndk, li, lv, self.alpha, self.Kp))
                for ndk, li, lv in zip(
                    self.counts.n_dk, self.lab_ids_t, self.lab_valid_t
                )
            ]
        elif self.sweep == "compact":
            per_bucket = [
                np.asarray(theta_from_compact(ndk, li, lv, self.alpha, self.Kp))
                for ndk, li, lv in zip(
                    self.counts.n_dk, self.lab_ids_t, self.lab_valid_t
                )
            ]
        else:
            per_bucket = [
                np.asarray(theta_from_counts(ndk, lb, self.alpha))
                for ndk, lb in zip(self.counts.n_dk, self.labs_t)
            ]
        return self.buckets.scatter_rows(per_bucket)[:, : self.K]

    # ------------------------------------------------------------ diagnostics

    def get_pred(self, single_th: np.ndarray, n: int = 5):
        labels = np.array(list(self.labelmap.keys()))
        top = np.argsort(-single_th)[:n]
        return list(zip(labels[top], single_th[top]))

    def get_preds(self, all_th: np.ndarray, n: int = 5):
        return [self.get_pred(all_th[d], n) for d in range(all_th.shape[0])]

    def topwords_per_topic(self, topwords: int = 10):
        ph = self.get_phi()
        labels = list(self.labelmap.keys())
        out = []
        for k in range(self.K):
            idx = np.argsort(-ph[k])[:topwords]
            out.append([labels[k]] + [self.v_to_w[int(v)] for v in idx])
        return out

    def perplexity(self) -> float:
        phi = phi_from_counts(self.counts.n_vk, self.counts.n_k, self.beta, self.topic_mask)
        ll = 0.0
        n = 0
        for g in range(self.buckets.n_buckets):
            if self.sweep == "fused":
                th = theta_from_fused(
                    self.counts.n_dk[g], self.lab_ids_t[g], self.lab_valid_t[g],
                    self.alpha, self.Kp,
                )
            elif self.sweep == "compact":
                th = theta_from_compact(
                    self.counts.n_dk[g], self.lab_ids_t[g], self.lab_valid_t[g],
                    self.alpha, self.Kp,
                )
            else:
                th = theta_from_counts(self.counts.n_dk[g], self.labs_t[g], self.alpha)
            llg, ng = log_likelihood(th, phi, self.toks_v[g], self.toks_f[g])
            ll += float(llg)
            n += int(ng)
        return float(np.exp(-ll / max(n, 1)))
