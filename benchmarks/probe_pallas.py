"""Capability probes for the Pallas Gibbs-kernel design on this chip.

Answers three questions that decide the kernel architecture:
 1. does a full (V=8969, K=512) f32 table fit in VMEM as a kernel operand?
 2. does Mosaic lower a vectorized row gather ``table[idx, :]`` in-kernel?
 3. how fast is a serial fori row-loop over dynamic slices?

Run: python benchmarks/probe_pallas.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V, K, D = 8969, 512, 4171


def timeit(fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def probe(name, fn):
    try:
        dt = fn()
        print(f"{name}: OK  {dt*1e3:.2f} ms")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL  {type(e).__name__}: {msg}")


def p1_vmem_full_table():
    table = jnp.ones((V, K), jnp.float32)

    def kernel(t_ref, o_ref):
        o_ref[:] = t_ref[0:8, :] * 2.0

    f = jax.jit(
        lambda t: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, K), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t)
    )
    return timeit(f, table)


def p2_vector_gather():
    table = jnp.ones((V, K), jnp.float32)
    idx = jnp.arange(D, dtype=jnp.int32) % V

    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = t_ref[i_ref[:], :]

    f = jax.jit(
        lambda t, i: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((D, K), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i)
    )
    return timeit(f, table, idx)


def p2b_take_gather():
    table = jnp.ones((V, K), jnp.float32)
    idx = jnp.arange(D, dtype=jnp.int32) % V

    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(t_ref[:], i_ref[:], axis=0)

    f = jax.jit(
        lambda t, i: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((D, K), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i)
    )
    return timeit(f, table, idx)


def p3_serial_row_loop():
    table = jnp.ones((V, K), jnp.float32)
    idx = jnp.arange(2048, dtype=jnp.int32) % V

    def kernel(t_ref, i_ref, o_ref):
        def body(r, _):
            o_ref[pl.ds(r, 1), :] = t_ref[pl.ds(i_ref[r], 1), :]
            return 0

        jax.lax.fori_loop(0, 2048, body, 0)

    f = jax.jit(
        lambda t, i: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((2048, K), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i)
    )
    return timeit(f, table, idx)


def p4_scatter_rmw_loop():
    """Serial read-modify-write of table rows (the n_vk update pattern)."""
    table = jnp.zeros((V, K), jnp.float32)
    idx = jnp.arange(2048, dtype=jnp.int32) % V

    def kernel(i_ref, t_ref):
        def body(r, _):
            row = t_ref[pl.ds(i_ref[r], 1), :]
            t_ref[pl.ds(i_ref[r], 1), :] = row + 1.0
            return 0

        jax.lax.fori_loop(0, 2048, body, 0)

    f = jax.jit(
        lambda t, i: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((V, K), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            input_output_aliases={1: 0},
        )(i, t)
    )
    return timeit(f, table, idx)


if __name__ == "__main__":
    probe("P1 full (V,K) f32 table in VMEM", p1_vmem_full_table)
    probe("P2 vectorized gather t[idx,:]  ", p2_vector_gather)
    probe("P2b jnp.take gather            ", p2b_take_gather)
    probe("P3 serial 2048-row copy loop   ", p3_serial_row_loop)
    probe("P4 serial 2048-row RMW loop    ", p4_scatter_rmw_loop)
