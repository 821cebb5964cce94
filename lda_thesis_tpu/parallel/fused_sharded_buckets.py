"""Length-bucketed fused merge-block sampler over the ``(chains, data)`` mesh.

Round 5 made 4-way length bucketing the single-chip default (the abstracts
fill only ~35% of the single-bucket (U=128, D) grid; with the kernel
volume-bound the padded slots are pure waste — PARITY.md).  This module
brings the same layout to the chains trainer: per bucket ``g`` the state is
``z_g (C, U_g, D_g)`` / ``n_dk_g (C, A, D_g)`` with each bucket's doc axis
sharded over ``data``; the per-chain table replicas ``n_vk (C, V, K)`` are
unchanged.  Per merge block each (chain, shard) runs the single-chip
bucketed block (ops/gibbs_fused.fused_train_block_buckets — buckets commit
to the LOCAL replica sequentially, exactly as on one chip) and the block's
total deltas are ``psum``-merged over ``data`` once (AD-LDA, the same
approximation as the unbucketed trainer).

Opt-in (``DistributedLabeledLDA(n_buckets=...)``): the unbucketed layout
in parallel/fused_sharded.py stays the default and its checkpoints stay
valid; the bucket layout is part of the draw stream, so the two are
different chains of the same sampler family.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ._util import pad_axis_to as _pad_docs
from ..models.state import phi_from_counts, running_average
from ..ops.gibbs import init_counts_compact
from ..ops.gibbs_fused import (
    FusedBucketState,
    fused_train_block_buckets,
    theta_from_fused,
)

__all__ = ["BucketedShardedState", "shard_bucketed_corpus",
           "init_bucketed_sharded", "make_bucketed_train_loop"]


class BucketedShardedState(NamedTuple):
    """Per-bucket sharded fused state + thinned means.

    ``z`` / ``n_dk`` / ``th_hat`` are per-bucket tuples (each bucket's doc
    axis sharded over ``data``); ``n_vk`` / ``n_k`` / ``ph_hat`` are the
    per-chain replicas exactly as in FusedShardedState."""

    z: Tuple[jax.Array, ...]  # per bucket (C, U_g, D_g)
    n_dk: Tuple[jax.Array, ...]  # per bucket (C, A, D_g)
    n_vk: jax.Array  # (C, V, K)
    n_k: jax.Array  # (C, K)
    ph_hat: jax.Array  # (C, V, K)
    th_hat: Tuple[jax.Array, ...]  # per bucket (C, D_g, K)
    s: jax.Array  # ()


def shard_bucketed_corpus(mesh: Mesh, buckets, lab_ids, lab_valid):
    """Per-bucket fused corpus layout, each bucket's doc axis padded to the
    data-mesh size and sharded.

    ``buckets`` — a data/buckets.BucketedDocs; ``lab_ids``/``lab_valid`` —
    full (D, A) host arrays indexed by the buckets' ``doc_idx``.
    Returns per-bucket tuples ``(tvt (U_g, D_gp), tft, li (D_gp, A),
    lvt (A, D_gp))``.
    """
    S = mesh.shape["data"]
    last = NamedSharding(mesh, P(None, "data"))
    first = NamedSharding(mesh, P("data", None))
    tvt, tft, li, lvt = [], [], [], []
    for tv, tf, ix in zip(buckets.tok_v, buckets.tok_f, buckets.doc_idx):
        D_g = tv.shape[0]
        Dp = ((D_g + S - 1) // S) * S
        tvt.append(jax.device_put(_pad_docs(np.asarray(tv), Dp, 0).T, last))
        tft.append(jax.device_put(
            _pad_docs(np.asarray(tf, np.float32), Dp, 0).T, last))
        li.append(jax.device_put(
            _pad_docs(np.asarray(lab_ids)[ix], Dp, 0), first))
        lvt.append(jax.device_put(
            _pad_docs(np.asarray(lab_valid)[ix], Dp, 0).T, last))
    return tuple(tvt), tuple(tft), tuple(li), tuple(lvt)


def init_bucketed_sharded(
    key, mesh: Mesh, corpus, V: int, K: int, n_chains: int,
) -> BucketedShardedState:
    """Per-(chain, shard, bucket) label-prior z init with psum-merged
    per-chain table replicas (same key scheme as init_fused_sharded, with
    the bucket index folded in like the single-chip init)."""
    tvt, tft, li, lvt = corpus
    local = n_chains // mesh.shape["chains"]
    G = len(tvt)
    z_specs = tuple(P("chains", None, "data") for _ in range(G))

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(),
                  tuple(P(None, "data") for _ in range(G)),
                  tuple(P(None, "data") for _ in range(G)),
                  tuple(P("data", None) for _ in range(G)),
                  tuple(P(None, "data") for _ in range(G))),
        out_specs=(z_specs, z_specs, P("chains", None, None),
                   P("chains", None)),
        check_vma=False,
    )
    def _init(key, tvt, tft, li, lvt):
        ci = jax.lax.axis_index("chains")
        di = jax.lax.axis_index("data")

        def one_chain(j):
            kc = jax.random.fold_in(jax.random.fold_in(key, ci * 1009 + j), di)
            zs, ndks = [], []
            n_vk = jnp.zeros((V, K), jnp.float32)
            n_k = jnp.zeros((K,), jnp.float32)
            for g in range(G):
                c = init_counts_compact(
                    jax.random.fold_in(kc, g), tvt[g].T,
                    tft[g].T.astype(jnp.int32), li[g], lvt[g].T, V, K,
                )
                zs.append(c.z.T)
                ndks.append(c.n_dk.T)
                n_vk = n_vk + c.n_vk
                n_k = n_k + c.n_k
            return tuple(zs), tuple(ndks), n_vk, n_k

        z, n_dk, n_vk, n_k = jax.vmap(one_chain)(jnp.arange(local))
        n_vk = jax.lax.psum(n_vk, "data")
        n_k = jax.lax.psum(n_k, "data")
        return z, n_dk, n_vk, n_k

    z, n_dk, n_vk, n_k = jax.jit(_init)(key, tvt, tft, li, lvt)
    C = n_chains
    return BucketedShardedState(
        z=z, n_dk=n_dk, n_vk=n_vk, n_k=n_k,
        ph_hat=jnp.zeros((C, V, K), jnp.float32),
        th_hat=tuple(jnp.zeros((C, t.shape[1], K), jnp.float32)
                     for t in tvt),
        s=jnp.int32(0),
    )


def make_bucketed_train_loop(
    mesh: Mesh,
    n_chains: int,
    alpha: float,
    beta: float,
    topic_mask,
    corpus,
    table_i16: bool = False,
):
    """Whole-run jitted bucketed chains trainer — the bucketed analogue of
    fused_sharded.make_fused_train_loop (same scan/save structure, same
    chunk-invariant ``fold_in(key, start + sweep_offset)`` block keys, same
    per-(chain, shard) key scheme; the bucket fold happens inside
    ops/gibbs_fused.fused_train_block_buckets exactly as on one chip)."""
    from functools import partial as _partial

    single_device = mesh.shape["chains"] == 1 and mesh.shape["data"] == 1
    tvt, tft, li, lvt = corpus
    local = n_chains // mesh.shape["chains"]
    G = len(tvt)
    z_specs = tuple(P("chains", None, "data") for _ in range(G))

    def _chains_body(key, z, n_dk, n_vk, n_k, c_tvt, c_tft, c_li, c_lvt,
                     M, ci, di, psum):
        zs = [[] for _ in range(G)]
        ndks = [[] for _ in range(G)]
        dvks, dks = [], []
        for j in range(local):
            k = jax.random.fold_in(jax.random.fold_in(key, ci * 1009 + j), di)
            st = FusedBucketState(
                z=tuple(z[g][j] for g in range(G)),
                n_dk=tuple(n_dk[g][j] for g in range(G)),
                n_vk=n_vk[j], n_k=n_k[j],
            )
            st2 = fused_train_block_buckets(
                k, st, c_tvt, c_tft, c_li, c_lvt, alpha, beta, M,
                table_i16=table_i16,
            )
            for g in range(G):
                zs[g].append(st2.z[g])
                ndks[g].append(st2.n_dk[g])
            dvks.append(st2.n_vk - n_vk[j])
            dks.append(st2.n_k - n_k[j])
        d_vk = psum(jnp.stack(dvks))
        d_k = psum(jnp.stack(dks))
        return (tuple(jnp.stack(zs[g]) for g in range(G)),
                tuple(jnp.stack(ndks[g]) for g in range(G)),
                n_vk + d_vk, n_k + d_k)

    def block_fn(key, z, n_dk, n_vk, n_k, M):
        if single_device:
            return _chains_body(key, z, n_dk, n_vk, n_k, tvt, tft, li, lvt,
                                M, jnp.int32(0), jnp.int32(0), lambda x: x)

        @partial(
            shard_map, mesh=mesh,
            in_specs=(P(), z_specs, z_specs, P("chains", None, None),
                      P("chains", None),
                      tuple(P(None, "data") for _ in range(G)),
                      tuple(P(None, "data") for _ in range(G)),
                      tuple(P("data", None) for _ in range(G)),
                      tuple(P(None, "data") for _ in range(G))),
            out_specs=(z_specs, z_specs, P("chains", None, None),
                       P("chains", None)),
            check_vma=False,
        )
        def _sm(key, z, n_dk, n_vk, n_k, s_tvt, s_tft, s_li, s_lvt):
            return _chains_body(
                key, z, n_dk, n_vk, n_k, s_tvt, s_tft, s_li, s_lvt, M,
                jax.lax.axis_index("chains"), jax.lax.axis_index("data"),
                lambda x: jax.lax.psum(x, "data"),
            )

        return _sm(key, z, n_dk, n_vk, n_k, tvt, tft, li, lvt)

    @_partial(jax.jit, static_argnames=("iters", "thinning", "M"))
    def loop(key, state: BucketedShardedState, start, iters: int,
             thinning: int, M: int):
        if thinning % M:
            raise ValueError(f"M={M} must divide thinning={thinning} "
                             "(use select_merge_block)")
        n_save = iters // thinning
        bps = thinning // M
        rem = iters - n_save * thinning
        n_rem = (rem + M - 1) // M
        offs = start + jnp.arange(max(n_save * bps + n_rem, 1),
                                  dtype=jnp.int32) * M
        K = state.n_vk.shape[2]

        def one_block(carry, off):
            z, n_dk, n_vk, n_k = carry
            k = jax.random.fold_in(key, off)
            return block_fn(k, z, n_dk, n_vk, n_k, M), None

        def save_block(carry, block_offs):
            (z, n_dk, n_vk, n_k), ph_hat, th_hat, s = carry
            (z, n_dk, n_vk, n_k), _ = jax.lax.scan(
                one_block, (z, n_dk, n_vk, n_k), block_offs)
            cur_ph = jax.vmap(
                lambda nv, nk: phi_from_counts(nv, nk, beta, topic_mask)
            )(n_vk, n_k)
            cur_th = tuple(
                jax.vmap(lambda nd, g=g: theta_from_fused(
                    nd, li[g], lvt[g].T, alpha, K))(n_dk[g])
                for g in range(G)
            )
            s = s + 1
            ph_hat = running_average(ph_hat, cur_ph, s)
            th_hat = tuple(running_average(t, c, s)
                           for t, c in zip(th_hat, cur_th))
            return ((z, n_dk, n_vk, n_k), ph_hat, th_hat, s), None

        carry = ((state.z, state.n_dk, state.n_vk, state.n_k),
                 state.ph_hat, state.th_hat, state.s)
        if n_save:
            carry, _ = jax.lax.scan(
                save_block, carry,
                offs[: n_save * bps].reshape(n_save, bps))
        (z, n_dk, n_vk, n_k), ph_hat, th_hat, s = carry
        boff = n_save * bps
        left = rem
        for j in range(n_rem):
            m_j = min(M, left)
            k = jax.random.fold_in(key, offs[boff + j])
            z, n_dk, n_vk, n_k = block_fn(k, z, n_dk, n_vk, n_k, m_j)
            left -= m_j
        return BucketedShardedState(z=z, n_dk=n_dk, n_vk=n_vk, n_k=n_k,
                                    ph_hat=ph_hat, th_hat=th_hat, s=s)

    return loop
