"""Vocab-axis sharding of the topic-word table (SURVEY.md §5 scaling axes).

Every other distributed mode in this framework replicates the ``(V, K)``
topic-word table per chain (parallel/sharded.py) — fine at abstracts scale,
a ceiling for large V·K.  This module shards the table's **vocabulary axis
across the ``data`` mesh axis**, so per-device persistent state is
``V/S × K``: documents AND table rows are both sharded over the same axis.

It builds on the fused merge-block sampler (ops/gibbs_fused.py), whose
freeze-gather/commit structure is exactly what a sharded table needs:

* block start — ``all_gather`` the table once (tiled over V), gather each
  local shard's per-slot counts from the transient full view, then drop it;
* ``M`` fused sweeps run purely shard-locally (one Pallas kernel per shard,
  doc-topic state exact);
* block end — per-shard count deltas are ``psum_scatter``'d back over the
  vocabulary axis, each shard keeping only the slice it owns; ``n_k`` is a
  small replicated ``psum``.

Communication per merge block is one table broadcast + one reduce-scatter —
amortised over ``M`` sweeps, riding ICI.  The transient full view bounds a
*single* device's working set; persistent state (what checkpoints and grows
with V·K) is sharded S-fold.  A fully streamed gather (slice-at-a-time
broadcast) is the natural refinement if even the transient view must shrink.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ._util import pad_axis_to as _pad_to
from ..models.state import running_average
from ..ops.gibbs_fused import (
    FusedLDAState,
    fused_train_block,
    theta_from_fused,
)

__all__ = ["VocabShardedState", "VocabShardedTrainState",
           "VocabChainsTrainState",
           "shard_vocab_corpus", "init_vocab_sharded",
           "init_vocab_sharded_train", "make_vocab_sharded_block",
           "make_vocab_sharded_train_loop", "full_table",
           "init_vocab_chains", "make_vocab_chains_train_loop"]


class VocabShardedState(NamedTuple):
    """Fused-layout state with the table's V axis sharded over ``data``.

    ``z (U, D)`` / ``n_dk (A, D)`` — doc axis sharded over ``data``;
    ``n_vk (V, K)`` — **vocab axis sharded** over ``data``;
    ``n_k (K,)`` — replicated.
    """

    z: jax.Array
    n_dk: jax.Array
    n_vk: jax.Array
    n_k: jax.Array


def shard_vocab_corpus(mesh: Mesh, tok_v_t, tok_f_t, lab_ids, lab_valid_t):
    """Pad the doc axis to the data-mesh size; device_put doc-sharded."""
    S = mesh.shape["data"]
    tok_v_t = np.asarray(tok_v_t)
    D = tok_v_t.shape[1]
    Dp = ((D + S - 1) // S) * S
    doc_last = NamedSharding(mesh, P(None, "data"))
    return (
        jax.device_put(_pad_to(tok_v_t, Dp, 1), doc_last),
        jax.device_put(_pad_to(np.asarray(tok_f_t), Dp, 1), doc_last),
        jax.device_put(_pad_to(np.asarray(lab_ids), Dp, 0),
                       NamedSharding(mesh, P("data", None))),
        jax.device_put(_pad_to(np.asarray(lab_valid_t), Dp, 1), doc_last),
    )


def init_vocab_sharded(
    key, mesh: Mesh, tok_v, tok_f, lab_ids_np, lab_valid_np, V: int, K: int
) -> VocabShardedState:
    """Host init (tiny corpora: init once, then shard the state arrays)."""
    from ..ops.gibbs_fused import init_fused

    S = mesh.shape["data"]
    Vp = ((V + S - 1) // S) * S
    st = init_fused(key, jnp.asarray(tok_v), jnp.asarray(tok_f),
                    jnp.asarray(lab_ids_np), jnp.asarray(lab_valid_np), V, K)
    D = tok_v.shape[0]
    Dp = ((D + S - 1) // S) * S
    return VocabShardedState(
        z=jax.device_put(_pad_to(np.asarray(st.z), Dp, 1),
                         NamedSharding(mesh, P(None, "data"))),
        n_dk=jax.device_put(_pad_to(np.asarray(st.n_dk), Dp, 1),
                            NamedSharding(mesh, P(None, "data"))),
        n_vk=jax.device_put(_pad_to(np.asarray(st.n_vk), Vp, 0),
                            NamedSharding(mesh, P("data", None))),
        n_k=jax.device_put(np.asarray(st.n_k), NamedSharding(mesh, P())),
    )


def _build_vblock(mesh: Mesh, alpha: float, beta: float, M: int, V: int,
                  table_i16: bool = False):
    """The UNJITTED shard_map'd merge block (see make_vocab_sharded_block)."""
    vbeta = float(V) * float(beta)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(
            P(),  # key
            P(None, "data"),  # z (U, D)
            P(None, "data"),  # n_dk (A, D)
            P("data", None),  # n_vk (V, K) — vocab-sharded
            P(),  # n_k
            P(None, "data"),  # tok_v_t
            P(None, "data"),  # tok_f_t
            P("data", None),  # lab_ids (D, A)
            P(None, "data"),  # lab_valid_t (A, D)
        ),
        out_specs=(P(None, "data"), P(None, "data"), P("data", None), P()),
        check_vma=False,
    )
    def _block(key, z, n_dk, n_vk_local, n_k, tok_v_t, tok_f_t, lab_ids,
               lab_valid_t):
        di = jax.lax.axis_index("data")
        k_local = jax.random.fold_in(key, di)

        # block start: transient full table view (persistent state stays V/S)
        n_vk_full = jax.lax.all_gather(n_vk_local, "data", axis=0, tiled=True)

        st = FusedLDAState(z=z, n_dk=n_dk, n_vk=n_vk_full, n_k=n_k)
        st = fused_train_block(
            k_local, st, tok_v_t, tok_f_t, lab_ids, lab_valid_t,
            alpha, beta, M, vbeta=vbeta, table_i16=table_i16,
        )
        # block end: route each shard's deltas to the rows' owner shards
        delta = st.n_vk - n_vk_full  # (V, K) local deltas, sparse in rows
        n_vk_local = n_vk_local + jax.lax.psum_scatter(
            delta, "data", scatter_dimension=0, tiled=True
        )
        n_k = n_k + jax.lax.psum(delta.sum(axis=0), "data")
        return st.z, st.n_dk, n_vk_local, n_k

    return _block


def make_vocab_sharded_block(mesh: Mesh, alpha: float, beta: float, M: int,
                             V: int = None, table_i16: bool = False):
    """Jitted merge block: all_gather table → M local fused sweeps →
    psum_scatter the vocab-axis deltas back to their owner shards.

    ``V`` — the TRUE (unpadded) vocabulary size.  The sharded table pads its
    vocab axis to ``Vp = ceil(V/S)*S``; the sampler's denominator smoothing
    constant must still be ``V*beta`` (LabeledLDA.py:116), so it is threaded
    through explicitly rather than derived from the padded table shape.
    Required — draw-for-draw parity with the unsharded fused sampler
    (tests/test_vocab_sharded.py::test_matches_unsharded_fused) breaks
    whenever ``V % S != 0`` otherwise.
    """
    if V is None:
        raise TypeError(
            "make_vocab_sharded_block requires the true vocab size V: the "
            "sharded table is padded, and V*beta must use the unpadded V")
    _block = _build_vblock(mesh, alpha, beta, M, V, table_i16=table_i16)

    def block(key, state: VocabShardedState, tok_v_t, tok_f_t, lab_ids,
              lab_valid_t) -> VocabShardedState:
        return VocabShardedState(
            *_block(key, *state, tok_v_t, tok_f_t, lab_ids, lab_valid_t)
        )

    return jax.jit(block)


class VocabShardedTrainState(NamedTuple):
    """:class:`VocabShardedState` + the thinned posterior running means —
    everything a training run checkpoints, with NO replicated V-axis array:
    ``ph_hat (Vp, K)`` is vocab-sharded exactly like the table, ``th_hat
    (Dp, K)`` doc-sharded, so per-device persistent memory stays ~V·K/S."""

    z: jax.Array  # (U, D) doc-sharded
    n_dk: jax.Array  # (A, D) doc-sharded
    n_vk: jax.Array  # (Vp, K) vocab-sharded
    n_k: jax.Array  # (K,) replicated
    ph_hat: jax.Array  # (Vp, K) vocab-sharded thinned mean
    th_hat: jax.Array  # (Dp, K) doc-sharded thinned mean
    s: jax.Array  # () int32 save counter


def init_vocab_sharded_train(
    key, mesh: Mesh, tok_v, tok_f, lab_ids_np, lab_valid_np, V: int, K: int
) -> VocabShardedTrainState:
    """:func:`init_vocab_sharded` + zeroed sharded running means."""
    base = init_vocab_sharded(key, mesh, tok_v, tok_f, lab_ids_np,
                              lab_valid_np, V, K)
    Vp = base.n_vk.shape[0]
    Dp = base.z.shape[1]
    return VocabShardedTrainState(
        z=base.z, n_dk=base.n_dk, n_vk=base.n_vk, n_k=base.n_k,
        ph_hat=jax.device_put(np.zeros((Vp, K), np.float32),
                              NamedSharding(mesh, P("data", None))),
        th_hat=jax.device_put(np.zeros((Dp, K), np.float32),
                              NamedSharding(mesh, P("data", None))),
        s=jnp.int32(0),
    )


def make_vocab_sharded_train_loop(
    mesh: Mesh, alpha: float, beta: float, V: int, K: int, topic_mask,
    corpus, table_i16: bool = False,
):
    """Whole-run jitted vocab-sharded trainer: ``lax.scan`` over save blocks
    of merge blocks with thinned φ̂/θ̂ running means updated on save
    boundaries (reference rule, LabeledLDA.py:131-145) — one dispatch per
    ``run_training`` call, the same structure as
    fused_sharded.make_fused_train_loop, with every V-sized array sharded.

    The save-time estimators are shard-local: φ̂ rows are owned by the
    shard that owns the table rows ((n_vk+β)/(n_k+V·β), n_k replicated, the
    true V·β — no gather), θ̂ by the shard that owns the documents.

    Returns ``loop(key, state, start, iters, thinning, M)``; block keys are
    ``fold_in(key, start + sweep_offset)`` — chunk-invariant resume."""
    tvt, tft, li, lvt = corpus
    vbeta = float(V) * float(beta)

    @partial(jax.jit, static_argnames=("iters", "thinning", "M"))
    def loop(key, state: VocabShardedTrainState, start, iters: int,
             thinning: int, M: int):
        if thinning % M:
            raise ValueError(f"M={M} must divide thinning={thinning} "
                             "(use select_merge_block)")
        _block = _build_vblock(mesh, alpha, beta, M, V,
                               table_i16=table_i16)
        n_save = iters // thinning
        bps = thinning // M
        rem = iters - n_save * thinning
        n_rem = (rem + M - 1) // M
        offs = start + jnp.arange(max(n_save * bps + n_rem, 1),
                                  dtype=jnp.int32) * M

        def one_block(carry, off):
            z, n_dk, n_vk, n_k = carry
            k = jax.random.fold_in(key, off)
            return tuple(_block(k, z, n_dk, n_vk, n_k, tvt, tft, li, lvt)), None

        def save_block(carry, block_offs):
            (z, n_dk, n_vk, n_k), ph_hat, th_hat, s = carry
            (z, n_dk, n_vk, n_k), _ = jax.lax.scan(
                one_block, (z, n_dk, n_vk, n_k), block_offs)
            cur_ph = (n_vk + beta) / (n_k + vbeta)  # rows stay shard-local
            if topic_mask is not None:
                cur_ph = cur_ph * topic_mask
            cur_th = theta_from_fused(n_dk, li, lvt.T, alpha, K)
            s = s + 1
            ph_hat = running_average(ph_hat, cur_ph, s)
            th_hat = running_average(th_hat, cur_th, s)
            return ((z, n_dk, n_vk, n_k), ph_hat, th_hat, s), None

        carry = ((state.z, state.n_dk, state.n_vk, state.n_k),
                 state.ph_hat, state.th_hat, state.s)
        if n_save:
            carry, _ = jax.lax.scan(
                save_block, carry,
                offs[: n_save * bps].reshape(n_save, bps))
        (z, n_dk, n_vk, n_k), ph_hat, th_hat, s = carry
        left = rem
        for j in range(n_rem):
            m_j = min(M, left)
            blk = _build_vblock(mesh, alpha, beta, m_j, V,
                                table_i16=table_i16)
            k = jax.random.fold_in(key, offs[n_save * bps + j])
            z, n_dk, n_vk, n_k = blk(k, z, n_dk, n_vk, n_k, tvt, tft, li, lvt)
            left -= m_j
        return VocabShardedTrainState(z=z, n_dk=n_dk, n_vk=n_vk, n_k=n_k,
                                      ph_hat=ph_hat, th_hat=th_hat, s=s)

    return loop


def full_table(state: VocabShardedState) -> jax.Array:
    """(V, K) gathered table (for estimators / saves)."""
    return jnp.asarray(state.n_vk)


# --------------------------------------------------------------------------
# chains × vocab composition (round-5 VERDICT item 4)
# --------------------------------------------------------------------------
#
# The single-chain functions above shard ONE table's V axis over ``data``.
# Here the two multi-device modes compose: independent chains over the
# ``chains`` mesh axis (parallel/fused_sharded.py), each chain's table
# vocab-sharded over ``data`` — per-device persistent table state is
# C_local × V/S × K instead of C_local × V × K.  Per merge block each chain
# all_gathers its own table transiently (rides ICI within a data row),
# runs M local fused sweeps per (chain, shard), and psum_scatters its
# deltas back to the owner shards — the same collective pattern as the
# single-chain mode, vmapped-by-unroll over local chains exactly like
# fused_sharded._chains_body (counts are integer-valued, so psum_scatter
# and psum produce bit-identical tables and the chains×vocab run draws the
# SAME chains as the chains×replicated run on the same mesh —
# tests/test_vocab_sharded.py::test_chains_vocab_matches_replicated).


class VocabChainsTrainState(NamedTuple):
    """Per-chain fused state with every V-sized array vocab-sharded.

    ``z (C, U, Dp)`` / ``n_dk (C, A, Dp)`` — doc axis over ``data``;
    ``n_vk / ph_hat (C, Vp, K)`` — **V axis over ``data``**, chains over
    ``chains``; ``n_k (C, K)`` replicated per chain; ``th_hat (C, Dp, K)``
    doc-sharded; ``s ()`` save counter."""

    z: jax.Array
    n_dk: jax.Array
    n_vk: jax.Array
    n_k: jax.Array
    ph_hat: jax.Array
    th_hat: jax.Array
    s: jax.Array


def _chains_vspecs():
    return dict(
        z=P("chains", None, "data"),
        n_dk=P("chains", None, "data"),
        n_vk=P("chains", "data", None),
        n_k=P("chains", None),
        ph_hat=P("chains", "data", None),
        th_hat=P("chains", "data", None),
    )


def init_vocab_chains(
    key, mesh: Mesh, corpus, V: int, K: int, n_chains: int,
) -> VocabChainsTrainState:
    """Per-(chain, shard) label-prior z init with vocab-sharded tables.

    Draw-identical to fused_sharded.init_fused_sharded (same key scheme);
    only the table merge differs: psum_scatter over ``data`` instead of
    psum, so each shard keeps its V/S slice.
    """
    from ..ops.gibbs import init_counts_compact

    tvt, tft, li, lvt = corpus
    local = n_chains // mesh.shape["chains"]
    S = mesh.shape["data"]
    Vp = ((V + S - 1) // S) * S
    sp = _chains_vspecs()

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(None, "data"), P(None, "data"), P("data", None),
                  P(None, "data")),
        out_specs=(sp["z"], sp["n_dk"], sp["n_vk"], sp["n_k"]),
        check_vma=False,
    )
    def _init(key, tvt, tft, li, lvt):
        ci = jax.lax.axis_index("chains")
        di = jax.lax.axis_index("data")

        def one_chain(j):
            k = jax.random.fold_in(jax.random.fold_in(key, ci * 1009 + j), di)
            c = init_counts_compact(
                k, tvt.T, tft.T.astype(jnp.int32), li, lvt.T, V, K,
            )
            n_vk = jnp.pad(c.n_vk, ((0, Vp - V), (0, 0)))
            return c.z.T, c.n_dk.T, n_vk, c.n_k

        z, n_dk, n_vk, n_k = jax.vmap(one_chain)(jnp.arange(local))
        n_vk = jax.lax.psum_scatter(n_vk, "data", scatter_dimension=1,
                                    tiled=True)
        n_k = jax.lax.psum(n_k, "data")
        return z, n_dk, n_vk, n_k

    z, n_dk, n_vk, n_k = jax.jit(_init)(key, tvt, tft, li, lvt)
    C = n_chains
    Dp = z.shape[2]
    mk = lambda shape, spec: jax.device_put(  # noqa: E731
        np.zeros(shape, np.float32), NamedSharding(mesh, spec))
    return VocabChainsTrainState(
        z=z, n_dk=n_dk, n_vk=n_vk, n_k=n_k,
        ph_hat=mk((C, Vp, K), sp["ph_hat"]),
        th_hat=mk((C, Dp, K), sp["th_hat"]),
        s=jnp.int32(0),
    )


def _build_vblock_chains(mesh: Mesh, alpha: float, beta: float, M: int,
                         V: int, n_chains: int, table_i16: bool = False):
    """The UNJITTED shard_map'd merge block over (chains, vocab-sharded)."""
    local = n_chains // mesh.shape["chains"]
    vbeta = float(V) * float(beta)
    sp = _chains_vspecs()

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), sp["z"], sp["n_dk"], sp["n_vk"], sp["n_k"],
                  P(None, "data"), P(None, "data"), P("data", None),
                  P(None, "data")),
        out_specs=(sp["z"], sp["n_dk"], sp["n_vk"], sp["n_k"]),
        check_vma=False,
    )
    def _block(key, z, n_dk, n_vk_local, n_k, tvt, tft, li, lvt):
        ci = jax.lax.axis_index("chains")
        di = jax.lax.axis_index("data")
        # block start: each chain's transient full table view
        n_vk_full = jax.lax.all_gather(n_vk_local, "data", axis=1, tiled=True)
        zs, ndks, dvks, dks = [], [], [], []
        for j in range(local):
            k = jax.random.fold_in(jax.random.fold_in(key, ci * 1009 + j), di)
            st = FusedLDAState(z=z[j], n_dk=n_dk[j], n_vk=n_vk_full[j],
                               n_k=n_k[j])
            st2 = fused_train_block(k, st, tvt, tft, li, lvt, alpha, beta, M,
                                    vbeta=vbeta, table_i16=table_i16)
            zs.append(st2.z)
            ndks.append(st2.n_dk)
            dvks.append(st2.n_vk - n_vk_full[j])
            dks.append(st2.n_k - n_k[j])
        # block end: AD-LDA merge over data + re-shard in one collective
        d_vk = jax.lax.psum_scatter(jnp.stack(dvks), "data",
                                    scatter_dimension=1, tiled=True)
        d_k = jax.lax.psum(jnp.stack(dks), "data")
        return (jnp.stack(zs), jnp.stack(ndks), n_vk_local + d_vk, n_k + d_k)

    return _block


def make_vocab_chains_train_loop(
    mesh: Mesh, n_chains: int, alpha: float, beta: float, V: int, K: int,
    topic_mask, corpus, table_i16: bool = False,
):
    """Whole-run jitted chains×vocab trainer — the chains analogue of
    :func:`make_vocab_sharded_train_loop` (same scan/save structure, same
    chunk-invariant ``fold_in(key, start + sweep_offset)`` block keys as
    fused_sharded.make_fused_train_loop, so resume is bit-identical).

    Save-time estimators stay shard-local per chain: φ̂ rows are owned by
    the shard owning the table rows, θ̂ by the shard owning the documents.
    """
    tvt, tft, li, lvt = corpus
    vbeta = float(V) * float(beta)
    sp = _chains_vspecs()

    @partial(jax.jit, static_argnames=("iters", "thinning", "M"))
    def loop(key, state: VocabChainsTrainState, start, iters: int,
             thinning: int, M: int):
        if thinning % M:
            raise ValueError(f"M={M} must divide thinning={thinning} "
                             "(use select_merge_block)")
        _block = _build_vblock_chains(mesh, alpha, beta, M, V, n_chains,
                                      table_i16=table_i16)
        n_save = iters // thinning
        bps = thinning // M
        rem = iters - n_save * thinning
        n_rem = (rem + M - 1) // M
        offs = start + jnp.arange(max(n_save * bps + n_rem, 1),
                                  dtype=jnp.int32) * M

        def one_block(carry, off):
            z, n_dk, n_vk, n_k = carry
            k = jax.random.fold_in(key, off)
            return tuple(_block(k, z, n_dk, n_vk, n_k, tvt, tft, li, lvt)), None

        def save_block(carry, block_offs):
            (z, n_dk, n_vk, n_k), ph_hat, th_hat, s = carry
            (z, n_dk, n_vk, n_k), _ = jax.lax.scan(
                one_block, (z, n_dk, n_vk, n_k), block_offs)
            cur_ph = (n_vk + beta) / (n_k[:, None, :] + vbeta)
            if topic_mask is not None:
                cur_ph = cur_ph * topic_mask
            cur_ph = jax.lax.with_sharding_constraint(
                cur_ph, NamedSharding(mesh, sp["ph_hat"]))
            cur_th = jax.vmap(
                lambda nd: theta_from_fused(nd, li, lvt.T, alpha, K))(n_dk)
            s = s + 1
            ph_hat = running_average(ph_hat, cur_ph, s)
            th_hat = running_average(th_hat, cur_th, s)
            return ((z, n_dk, n_vk, n_k), ph_hat, th_hat, s), None

        carry = ((state.z, state.n_dk, state.n_vk, state.n_k),
                 state.ph_hat, state.th_hat, state.s)
        if n_save:
            carry, _ = jax.lax.scan(
                save_block, carry, offs[: n_save * bps].reshape(n_save, bps))
        (z, n_dk, n_vk, n_k), ph_hat, th_hat, s = carry
        left = rem
        for j in range(n_rem):
            m_j = min(M, left)
            blk = _build_vblock_chains(mesh, alpha, beta, m_j, V, n_chains,
                                       table_i16=table_i16)
            k = jax.random.fold_in(key, offs[n_save * bps + j])
            z, n_dk, n_vk, n_k = blk(k, z, n_dk, n_vk, n_k, tvt, tft, li, lvt)
            left -= m_j
        return VocabChainsTrainState(z=z, n_dk=n_dk, n_vk=n_vk, n_k=n_k,
                                     ph_hat=ph_hat, th_hat=th_hat, s=s)

    return loop
