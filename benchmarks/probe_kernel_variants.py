"""Isolate the fused-draw kernel's cost: what does each piece of the
per-position pallas_call cost, and which draw implementation is fastest?

Variants (same operands, scan over U dummy positions):
  matmul   — current kernel: c = w @ triu (MXU inclusive cumsum)
  cumsum   — c = jnp.cumsum(w, axis=1) (VPU log-shift cumsum)
  bf16mm   — matmul with w cast to bf16 (probe only: draw not exact)
  nodraw   — skip posterior+draw entirely (memory-traffic floor)
  gumbel   — log-space Gumbel argmax draw (no cumsum at all)

Run: python benchmarks/probe_kernel_variants.py [--block 512]
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D, U, K = 4608, 32, 512
ALPHA, BETA = 0.1, 0.01


def build(variant: str, block: int):
    G = D // block

    def kernel(u_ref, f_ref, zold_ref, labs_ref, ndk_ref, cv_ref, recip_ref,
               tri_ref, ndk_out, znew_ref, dnk_ref):
        B, Kk = labs_ref.shape
        f = f_ref[:]
        z_old = zold_ref[:]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (B, Kk), 1)
        oh_old = jnp.where(lanes == z_old, f, 0.0)
        n_dk = ndk_ref[:] - oh_old

        if variant == "nodraw":
            z_new = z_old
        else:
            w = labs_ref[:] * (n_dk + ALPHA) * (cv_ref[:] + BETA) * recip_ref[:]
            if variant == "matmul":
                c = jnp.dot(w, tri_ref[:], preferred_element_type=jnp.float32)
                r = u_ref[:] * c[:, Kk - 1 : Kk]
                z_new = jnp.sum((c < r).astype(jnp.int32), axis=1, keepdims=True)
            elif variant == "bf16mm":
                c = jnp.dot(w.astype(jnp.bfloat16), tri_ref[:].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                r = u_ref[:] * c[:, Kk - 1 : Kk]
                z_new = jnp.sum((c < r).astype(jnp.int32), axis=1, keepdims=True)
            elif variant == "cumsum":
                # manual log-step inclusive scan (Mosaic has no cumsum)
                c = w
                sh = 1
                while sh < Kk:
                    c = c + jnp.concatenate(
                        [jnp.zeros((B, sh), c.dtype), c[:, :-sh]], axis=1)
                    sh *= 2
                r = u_ref[:] * c[:, Kk - 1 : Kk]
                z_new = jnp.sum((c < r).astype(jnp.int32), axis=1, keepdims=True)
            elif variant == "gumbel":
                # u_ref reused as the gumbel offset seed (probe only)
                g = -jnp.log(-jnp.log(u_ref[:] + 1e-9) + 1e-9)
                logw = jnp.log(jnp.maximum(w, 1e-38)) + g
                z_new = jnp.argmax(logw, axis=1).reshape(B, 1).astype(jnp.int32)
            z_new = jnp.where(f > 0, z_new, z_old).astype(jnp.int32)

        oh_new = jnp.where(lanes == z_new, f, 0.0)
        ndk_out[:] = n_dk + oh_new
        znew_ref[:] = z_new
        delta = jnp.sum(oh_new - oh_old, axis=0, keepdims=True)
        dnk_ref[:] = jnp.concatenate([delta, jnp.zeros((7, Kk), jnp.float32)], axis=0)

    grid_spec = pl.GridSpec(
        grid=(G,),
        in_specs=[
            pl.BlockSpec((block, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, K), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, K), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, K), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block, K), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, K), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((D, K), jnp.float32),
            jax.ShapeDtypeStruct((D, 1), jnp.int32),
            jax.ShapeDtypeStruct((G * 8, K), jnp.float32),
        ),
        input_output_aliases={4: 0},
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--block", type=int, default=512)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    labs = jnp.asarray(
        (rng.random((D, K)) < 0.02) | (np.arange(K) == 0)[None, :], jnp.float32)
    n_dk0 = jnp.ones((D, K), jnp.float32)
    cv = jnp.ones((D, K), jnp.float32)
    recip = jnp.full((1, K), 1e-3, jnp.float32)
    tri = jnp.triu(jnp.ones((K, K), jnp.float32))
    us = jnp.asarray(rng.random((U, D, 1)), jnp.float32)
    fs = jnp.asarray((rng.random((U, D, 1)) < 0.9).astype(np.float32))
    zs = jnp.asarray(rng.integers(0, K, (U, D, 1)), jnp.int32)

    for variant in ("nodraw", "matmul", "bf16mm", "cumsum", "gumbel"):
        call = build(variant, args.block)

        @jax.jit
        def sweep(n_dk, us, fs, zs, call=call):
            def step(n_dk, xs):
                u, f, z = xs
                n_dk, z_new, dnk = call(u, f, z, labs, n_dk, cv, recip, tri)
                return n_dk, dnk[0, 0]
            n_dk, _ = jax.lax.scan(step, n_dk, (us, fs, zs))
            return n_dk

        out = sweep(n_dk0, us, fs, zs)
        jax.block_until_ready(out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = sweep(n_dk0, us, fs, zs)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"{variant:8s} block={args.block:5d} {dt/U*1e6:8.1f} us/position "
              f"({dt*1e3:.1f} ms / {U} positions)", flush=True)


if __name__ == "__main__":
    main()
