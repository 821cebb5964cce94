"""Pallas TPU kernel for the fused Gibbs draw + count update.

The XLA sweep (ops/gibbs.py train_sweep) materialises ~6 (D, K) ephemerals
per position step: two one-hots, the posterior weights, the cumulative sum,
the comparison mask, and the updated n_dk — HBM round-trips that dominate
the step.  This kernel fuses the whole per-position update into one pass
over the (D, K) operands:

    read  n_dk, cv = n_vk[v], labs          (3 × (B,K) per block)
    w   = labs · (n_dk − f·1[z_old] + α) · (cv + β) · recip(n_k⁻ + Vβ)
    c   = w @ triu(1)                        (MXU inclusive cumsum)
    z'  = Σ (c < u·c[:,-1])                  (exact inverse-CDF draw)
    n_dk ← n_dk + f·(1[z'] − 1[z_old])       (aliased in-place output)
    Δn_k = Σ_rows f·(1[z'] − 1[z_old])       (per-block partial, summed by XLA)

Random row gather/scatter of the topic-word table stays in XLA (Mosaic has
no vectorised gather — established by the round-2 probe series
(conclusions folded into ARCHITECTURE.md, scripts pruned round 4); the full table
also exceeds the 16 MB VMEM budget at f32).  Grid is over document blocks;
operands are blocked to (B, K) so VMEM holds a handful of tiles regardless
of D.  Semantics match the XLA path exactly given the same uniforms (same
decrement-before-draw order, same inverse-CDF search).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

__all__ = ["fused_draw_update", "pallas_supported", "BLOCK"]

BLOCK = 512  # document rows per grid step


@functools.lru_cache(maxsize=None)
def _build(D: int, K: int, alpha: float, beta: float):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert D % BLOCK == 0, (D, BLOCK)
    G = D // BLOCK

    def kernel(u_ref, f_ref, zold_ref, labs_ref, ndk_ref, cv_ref, recip_ref,
               tri_ref, ndk_out, znew_ref, dnk_ref):
        B, Kk = labs_ref.shape
        f = f_ref[:]  # (B, 1) f32
        z_old = zold_ref[:]  # (B, 1) i32
        lanes = jax.lax.broadcasted_iota(jnp.int32, (B, Kk), 1)
        oh_old = jnp.where(lanes == z_old, f, 0.0)

        n_dk = ndk_ref[:] - oh_old
        w = labs_ref[:] * (n_dk + alpha) * (cv_ref[:] + beta) * recip_ref[:]
        c = jnp.dot(w, tri_ref[:], preferred_element_type=jnp.float32)
        r = u_ref[:] * c[:, Kk - 1 : Kk]
        z_new = jnp.sum((c < r).astype(jnp.int32), axis=1, keepdims=True)
        z_new = jnp.where(f > 0, z_new, z_old).astype(jnp.int32)

        oh_new = jnp.where(lanes == z_new, f, 0.0)
        ndk_out[:] = n_dk + oh_new
        znew_ref[:] = z_new
        # Δn_k in row 0 of an 8-row block (TPU sublane-divisibility rule)
        delta = jnp.sum(oh_new - oh_old, axis=0, keepdims=True)
        dnk_ref[:] = jnp.concatenate([delta, jnp.zeros((7, Kk), jnp.float32)], axis=0)

    grid_spec = pl.GridSpec(
        grid=(G,),
        in_specs=[
            pl.BlockSpec((BLOCK, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, K), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, K), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, K), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BLOCK, K), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, K), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ),
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((D, K), jnp.float32),  # n_dk
            jax.ShapeDtypeStruct((D, 1), jnp.int32),  # z_new
            jax.ShapeDtypeStruct((G * 8, K), jnp.float32),  # per-block Δn_k
        ),
        input_output_aliases={4: 0},  # n_dk updated in place
    )


def pallas_supported() -> bool:
    """Whether the sweeps should take the fused-Pallas branch.

    **Opt-in** (``LDA_PALLAS=1``) rather than default: on the available
    v5e chip every ``pallas_call`` whose operands exceed trivial size pays
    a flat ~0.8 ms staging cost per invocation — crossing the XLA→Mosaic
    boundary re-materialises VMEM-resident scan state through HBM — so the
    pure-XLA fast-layout sweep is measurably faster end-to-end (6.74M vs
    6.27M tokens/s/chip; the round-2 probes isolated the boundary
    cost and showed the kernel itself is
    traffic-bound, not compute-bound).  The kernel stays bitwise-equal to
    the XLA path (tests/test_pallas_parity.py, accelerator-only), so
    flipping the flag is safe where the boundary is cheap.
    ``LDA_NO_PALLAS`` still forces it off (overrides ``LDA_PALLAS``).
    """
    if os.environ.get("LDA_NO_PALLAS"):
        return False
    if not os.environ.get("LDA_PALLAS"):
        return False
    return jax.default_backend() not in ("cpu",)


def fused_draw_update(u, ff, z_old, labs, n_dk, cv, recip_nk, tri,
                      alpha: float, beta: float):
    """Fused per-position draw; returns (n_dk', z_new, Δn_k).

    The doc axis of every (D, ...) operand must be a BLOCK multiple (the
    sweep pads once outside its scan).
    """
    D, K = n_dk.shape
    call = _build(D, K, float(alpha), float(beta))
    n_dk2, z_new, dnk = call(
        u.reshape(D, 1),
        ff.reshape(D, 1),
        z_old.reshape(D, 1),
        labs,
        n_dk,
        cv,
        recip_nk.reshape(1, K),
        tri,
    )
    return n_dk2, z_new[:, 0], dnk.sum(axis=0)
