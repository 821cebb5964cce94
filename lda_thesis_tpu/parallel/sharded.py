"""SPMD collapsed Gibbs over a ``(chains, data)`` device mesh.

TPU-native replacement for the reference's single-threaded sweep
(LabeledLDA.py:101-153).  Layout:

* ``z (C, D, U)`` / ``n_dk (C, D, K)`` — sharded ``P("chains", "data")``
* ``n_vk (C, V, K)`` / ``n_k (C, K)``  — sharded ``P("chains")``; every data
  shard holds a full replica of its chain's topic-word table
* ``tok_v/tok_f (D, U)``, ``labs (D, K)`` — sharded ``P("data")`` and
  replicated across chains

One training step = each (chain, data) shard runs a *local* exact Gibbs
sweep against its replica of ``n_vk``, then the per-shard deltas are merged
with ``psum`` over the ``data`` axis (AD-LDA).  Within a sweep, shards see
counts that are stale with respect to other shards — the standard
approximate parallel collapsed Gibbs scheme; the merge restores the exact
global count tensor, and ``n_k`` is re-derived from the merged table so the
state stays self-consistent (Σ_v n_vk[·,v,k] == n_k[·,k] always).

Chains never communicate during sampling: the ``chains`` axis is pure SPMD
replication with decorrelated RNG streams (global chain index folded into
the key), pooled only at estimation time (:func:`pooled_phi`).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models.state import phi_from_counts, running_average, theta_from_counts
from ..ops.gibbs import LDACounts, init_counts, train_sweep

__all__ = [
    "ShardedLDAState",
    "make_mesh",
    "shard_corpus",
    "make_sharded_train_step",
    "init_sharded_state",
    "pooled_phi",
]


class ShardedLDAState(NamedTuple):
    """Multi-chain Gibbs state with a leading chains axis."""

    z: jax.Array  # (C, D, U) int32
    n_dk: jax.Array  # (C, D, K) int32
    n_vk: jax.Array  # (C, V, K) int32
    n_k: jax.Array  # (C, K) int32
    ph_hat: jax.Array  # (C, V, K) float32 thinned running mean
    th_hat: jax.Array  # (C, D, K) float32
    s: jax.Array  # () int32 — number of saves folded into the means


def make_mesh(
    n_data: Optional[int] = None, n_chains: int = 1, devices=None
) -> Mesh:
    """Build a ``(chains, data)`` mesh over the available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = devices.size // n_chains
    if n_chains * n_data != devices.size:
        raise ValueError(
            f"mesh {n_chains}x{n_data} != {devices.size} devices"
        )
    return Mesh(devices.reshape(n_chains, n_data), ("chains", "data"))


def _pad_docs(x: np.ndarray, n_data: int) -> np.ndarray:
    """Pad the doc axis to a multiple of the data-mesh size with no-op rows."""
    D = x.shape[0]
    target = ((D + n_data - 1) // n_data) * n_data
    if target == D:
        return x
    pad = np.zeros((target - D,) + x.shape[1:], dtype=x.dtype)
    if x.ndim == 2 and x.shape[1] > 0 and x.dtype in (np.float32, np.float64):
        pad[:, 0] = 1  # label masks keep root admissible so sampling is well-defined
    return np.concatenate([x, pad], axis=0)


def shard_corpus(mesh: Mesh, tok_v, tok_f, labs):
    """Pad the doc axis to the data-mesh size and device_put with P("data")."""
    n_data = mesh.shape["data"]
    tok_v = _pad_docs(np.asarray(tok_v), n_data)
    tok_f = _pad_docs(np.asarray(tok_f), n_data)
    labs = _pad_docs(np.asarray(labs), n_data)
    sh2 = NamedSharding(mesh, P("data", None))
    return (
        jax.device_put(tok_v, sh2),
        jax.device_put(tok_f, sh2),
        jax.device_put(labs, sh2),
    )


def init_sharded_state(
    key: jax.Array,
    mesh: Mesh,
    tok_v: jax.Array,  # (D, U) already padded/sharded
    tok_f: jax.Array,
    labs: jax.Array,
    V: int,
    n_chains: int,
) -> ShardedLDAState:
    """Per-chain, per-shard count initialisation (reference LabeledLDA.py:69-92)."""
    D, U = tok_v.shape
    K = labs.shape[1]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P("data", None), P("data", None), P("data", None)),
        out_specs=(
            P("chains", "data", None),
            P("chains", "data", None),
            P("chains", None, None),
            P("chains", None),
        ),
        check_vma=False,
    )
    def _init(key, tok_v, tok_f, labs):
        ci = jax.lax.axis_index("chains")
        di = jax.lax.axis_index("data")

        def one_chain(j):
            k = jax.random.fold_in(jax.random.fold_in(key, ci * 1009 + j), di)
            c = init_counts(k, tok_v, tok_f, labs, V)
            return c.z, c.n_dk, c.n_vk, c.n_k

        z, n_dk, n_vk, n_k = jax.vmap(one_chain)(
            jnp.arange(n_chains // mesh.shape["chains"])
        )
        # merge the per-shard topic-word tables into the global replica
        n_vk = jax.lax.psum(n_vk, "data")
        n_k = jax.lax.psum(n_k, "data")
        return z, n_dk, n_vk, n_k

    z, n_dk, n_vk, n_k = jax.jit(_init)(key, tok_v, tok_f, labs)
    C = n_chains
    return ShardedLDAState(
        z=z,
        n_dk=n_dk,
        n_vk=n_vk,
        n_k=n_k,
        ph_hat=jnp.zeros((C, V, K), jnp.float32),
        th_hat=jnp.zeros((C, D, K), jnp.float32),
        s=jnp.int32(0),
    )


def make_sharded_train_step(
    mesh: Mesh,
    n_chains: int,
    alpha: float,
    beta: float,
    topic_mask=None,
):
    """Build the jitted full training step: sweep → psum merge → thinned means.

    Returns ``step(key, state, tok_v, tok_f, labs, save) -> state`` where
    ``save`` is a traced bool selecting whether this sweep folds φ/θ into the
    running averages (the reference's thinning rule, LabeledLDA.py:131-145).
    """
    local_chains = n_chains // mesh.shape["chains"]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(),  # key
            P("chains", "data", None),  # z
            P("chains", "data", None),  # n_dk
            P("chains", None, None),  # n_vk
            P("chains", None),  # n_k
            P("data", None),  # tok_v
            P("data", None),  # tok_f
            P("data", None),  # labs
        ),
        out_specs=(
            P("chains", "data", None),
            P("chains", "data", None),
            P("chains", None, None),
            P("chains", None),
        ),
        check_vma=False,
    )
    def _sweep(key, z, n_dk, n_vk, n_k, tok_v, tok_f, labs):
        ci = jax.lax.axis_index("chains")
        di = jax.lax.axis_index("data")

        def one_chain(j, z, n_dk, n_vk, n_k):
            k = jax.random.fold_in(jax.random.fold_in(key, ci * 1009 + j), di)
            c = train_sweep(
                k,
                LDACounts(z=z, n_dk=n_dk, n_vk=n_vk, n_k=n_k),
                tok_v,
                tok_f,
                labs,
                alpha,
                beta,
            )
            return c.z, c.n_dk, c.n_vk - n_vk, c.n_k - n_k

        z, n_dk, d_vk, d_k = jax.vmap(
            one_chain, in_axes=(0, 0, 0, 0, 0)
        )(jnp.arange(local_chains), z, n_dk, n_vk, n_k)
        # AD-LDA merge: commit every shard's deltas to the chain-global table
        n_vk = n_vk + jax.lax.psum(d_vk, "data")
        n_k = n_k + jax.lax.psum(d_k, "data")
        return z, n_dk, n_vk, n_k

    def step(key, state: ShardedLDAState, tok_v, tok_f, labs, save) -> ShardedLDAState:
        z, n_dk, n_vk, n_k = _sweep(
            key, state.z, state.n_dk, state.n_vk, state.n_k, tok_v, tok_f, labs
        )

        def on_save(_):
            cur_ph = jax.vmap(lambda v, k: phi_from_counts(v, k, beta, topic_mask))(
                n_vk, n_k
            )
            cur_th = jax.vmap(lambda d: theta_from_counts(d, labs, alpha))(n_dk)
            s2 = state.s + 1
            return (
                running_average(state.ph_hat, cur_ph, s2),
                running_average(state.th_hat, cur_th, s2),
                s2,
            )

        ph_hat, th_hat, s = jax.lax.cond(
            save, on_save, lambda _: (state.ph_hat, state.th_hat, state.s), None
        )
        return ShardedLDAState(
            z=z, n_dk=n_dk, n_vk=n_vk, n_k=n_k, ph_hat=ph_hat, th_hat=th_hat, s=s
        )

    return jax.jit(step)


def pooled_phi(state: ShardedLDAState) -> jax.Array:
    """(V, K) chain-pooled thinned φ estimate (mean over the chains axis)."""
    return state.ph_hat.mean(axis=0)
