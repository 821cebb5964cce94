"""Fused merge-block sampler over the ``(chains, data)`` mesh.

Round 3 made the fused whole-sweep kernel (ops/gibbs_fused.py) the
single-chip default; this module gives the distributed trainer the same
path.  Semantics compose naturally: the fused sampler freezes the
topic-word table for ``M`` sweeps on the *time* axis, AD-LDA freezes it
across shards on the *space* axis — a merge block here is both at once:

* per (chain, data-shard): ``M`` fused sweeps against the chain's
  block-start table replica (one Pallas kernel call per local chain —
  unrolled, not vmapped, so Mosaic sees plain 2-D blocks);
* block end: per-shard deltas ``psum``-merged over ``data`` (only each
  slot's first/last z matter), thinned φ̂/θ̂ running means updated on save
  boundaries exactly as the dense step does (reference rule,
  LabeledLDA.py:131-145).

Layouts are the fused ones: ``z (C, U, D)`` / ``n_dk (C, A, D)`` with the
doc axis sharded over ``data``; ``n_vk (C, V, K)`` replicated per chain.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.gibbs import init_counts_compact
from ._util import pad_axis_to as _pad_docs
from ..ops.gibbs_fused import FusedLDAState, fused_train_block, theta_from_fused
from ..models.state import phi_from_counts, running_average

__all__ = ["FusedShardedState", "shard_fused_corpus", "init_fused_sharded",
           "make_fused_train_loop"]


class FusedShardedState(NamedTuple):
    z: jax.Array  # (C, U, D) int32
    n_dk: jax.Array  # (C, A, D) float32
    n_vk: jax.Array  # (C, V, K) float32
    n_k: jax.Array  # (C, K) float32
    ph_hat: jax.Array  # (C, V, K) thinned running mean
    th_hat: jax.Array  # (C, D, K)
    s: jax.Array  # () int32 save counter


def shard_fused_corpus(mesh: Mesh, tok_v, tok_f, lab_ids, lab_valid):
    """Doc-axis padding to the data-mesh size + device_put in fused layout.

    Returns ``(tok_v_t (U, D), tok_f_t (U, D) f32, lab_ids (D, A),
    lab_valid_t (A, D))``, doc axis sharded over ``data``.
    """
    S = mesh.shape["data"]
    tok_v = np.asarray(tok_v)
    D = tok_v.shape[0]
    Dp = ((D + S - 1) // S) * S
    last = NamedSharding(mesh, P(None, "data"))
    first = NamedSharding(mesh, P("data", None))
    return (
        jax.device_put(_pad_docs(tok_v, Dp, 0).T, last),
        jax.device_put(_pad_docs(np.asarray(tok_f, np.float32), Dp, 0).T, last),
        jax.device_put(_pad_docs(np.asarray(lab_ids), Dp, 0), first),
        jax.device_put(_pad_docs(np.asarray(lab_valid), Dp, 0).T, last),
    )


def init_fused_sharded(
    key, mesh: Mesh, tok_v_t, tok_f_t, lab_ids, lab_valid_t, V: int, K: int,
    n_chains: int,
) -> FusedShardedState:
    """Per-(chain, shard) label-prior z init (LabeledLDA.py:85-92) with the
    per-chain table replicas psum-merged over the data axis."""
    local = n_chains // mesh.shape["chains"]
    U, D = tok_v_t.shape
    A = lab_ids.shape[1]

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(None, "data"), P(None, "data"), P("data", None),
                  P(None, "data")),
        out_specs=(P("chains", None, "data"), P("chains", None, "data"),
                   P("chains", None, None), P("chains", None)),
        check_vma=False,
    )
    def _init(key, tok_v_t, tok_f_t, lab_ids, lab_valid_t):
        ci = jax.lax.axis_index("chains")
        di = jax.lax.axis_index("data")

        def one_chain(j):
            k = jax.random.fold_in(jax.random.fold_in(key, ci * 1009 + j), di)
            c = init_counts_compact(
                k, tok_v_t.T, tok_f_t.T.astype(jnp.int32), lab_ids,
                lab_valid_t.T, V, K,
            )
            return c.z.T, c.n_dk.T, c.n_vk, c.n_k

        z, n_dk, n_vk, n_k = jax.vmap(one_chain)(jnp.arange(local))
        n_vk = jax.lax.psum(n_vk, "data")
        n_k = jax.lax.psum(n_k, "data")
        return z, n_dk, n_vk, n_k

    z, n_dk, n_vk, n_k = jax.jit(_init)(key, tok_v_t, tok_f_t, lab_ids,
                                        lab_valid_t)
    C = n_chains
    return FusedShardedState(
        z=z, n_dk=n_dk, n_vk=n_vk, n_k=n_k,
        ph_hat=jnp.zeros((C, V, K), jnp.float32),
        th_hat=jnp.zeros((C, D, K), jnp.float32),
        s=jnp.int32(0),
    )


def make_fused_train_loop(
    mesh: Mesh,
    n_chains: int,
    alpha: float,
    beta: float,
    merge_every: int,
    topic_mask,
    corpus,
    table_i16: bool = False,
):
    """Whole-run jitted training loop: scan over save blocks of merge
    blocks — ONE dispatch per ``run_training`` call.

    The per-block Python loop costs ~0.4 s/dispatch on the tunnelled
    backend regardless of program content (argument re-shipping); a single
    jit containing the full scan runs at kernel speed (the same structure
    the single-chip model layer uses, models/labeled_lda._train_loop_fused).
    Returns ``loop(key, state, iters, thinning)`` with static iters/thinning.
    """
    from functools import partial as _partial

    single_device = mesh.shape["chains"] == 1 and mesh.shape["data"] == 1
    tvt, tft, li, lvt = corpus
    local = n_chains // mesh.shape["chains"]

    def _chains_body(key, z, n_dk, n_vk, n_k, c_tvt, c_tft, c_li, c_lvt,
                     M, ci, di, psum):
        zs, ndks, dvks, dks = [], [], [], []
        for j in range(local):
            k = jax.random.fold_in(jax.random.fold_in(key, ci * 1009 + j), di)
            st = FusedLDAState(z=z[j], n_dk=n_dk[j], n_vk=n_vk[j], n_k=n_k[j])
            st2 = fused_train_block(k, st, c_tvt, c_tft, c_li, c_lvt,
                                    alpha, beta, M, table_i16=table_i16)
            zs.append(st2.z)
            ndks.append(st2.n_dk)
            dvks.append(st2.n_vk - n_vk[j])
            dks.append(st2.n_k - n_k[j])
        d_vk = psum(jnp.stack(dvks))
        d_k = psum(jnp.stack(dks))
        return jnp.stack(zs), jnp.stack(ndks), n_vk + d_vk, n_k + d_k

    def block_fn(key, z, n_dk, n_vk, n_k, M):
        # inlined UNJITTED body: a nested jit/pjit call boundary here costs
        # ~0.5 s per block on the tunnelled backend (round-3 probe: the same
        # program runs 50x faster with the body inlined into the outer jit)
        if single_device:
            return _chains_body(key, z, n_dk, n_vk, n_k, tvt, tft, li, lvt,
                                M, jnp.int32(0), jnp.int32(0), lambda x: x)

        @partial(
            shard_map, mesh=mesh,
            in_specs=(P(), P("chains", None, "data"),
                      P("chains", None, "data"), P("chains", None, None),
                      P("chains", None), P(None, "data"), P(None, "data"),
                      P("data", None), P(None, "data")),
            out_specs=(P("chains", None, "data"), P("chains", None, "data"),
                       P("chains", None, None), P("chains", None)),
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
    def loop(key, state: FusedShardedState, start, iters: int,
             thinning: int, M: int):
        """``start`` = global sweeps already done — block keys are
        ``fold_in(key, start + sweep_offset)`` so a chunked/resumed run
        draws the identical stream as an uninterrupted one."""
        if thinning % M:
            raise ValueError(f"M={M} must divide thinning={thinning} "
                             "(use select_merge_block)")
        n_save_blocks = iters // thinning
        blocks_per_save = thinning // M
        rem = iters - n_save_blocks * thinning
        n_rem_blocks = (rem + M - 1) // M
        offs = start + jnp.arange(
            max(n_save_blocks * blocks_per_save + n_rem_blocks, 1),
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
            cur_th = jax.vmap(
                lambda nd: theta_from_fused(nd, li, lvt.T, alpha, K)
            )(n_dk)
            s = s + 1
            ph_hat = running_average(ph_hat, cur_ph, s)
            th_hat = running_average(th_hat, cur_th, s)
            return ((z, n_dk, n_vk, n_k), ph_hat, th_hat, s), None

        carry = ((state.z, state.n_dk, state.n_vk, state.n_k),
                 state.ph_hat, state.th_hat, state.s)
        if n_save_blocks:
            carry, _ = jax.lax.scan(
                save_block, carry,
                offs[: n_save_blocks * blocks_per_save].reshape(
                    n_save_blocks, blocks_per_save))
        (z, n_dk, n_vk, n_k), ph_hat, th_hat, s = carry
        boff = n_save_blocks * blocks_per_save
        left = rem
        for j in range(n_rem_blocks):
            m_j = min(M, left)
            k = jax.random.fold_in(key, offs[boff + j])
            z, n_dk, n_vk, n_k = block_fn(k, z, n_dk, n_vk, n_k, m_j)
            left -= m_j
        return FusedShardedState(z=z, n_dk=n_dk, n_vk=n_vk, n_k=n_k,
                                 ph_hat=ph_hat, th_hat=th_hat, s=s)

    return loop
