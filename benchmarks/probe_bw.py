"""Measure achievable HBM streaming bandwidth on this chip, three ways:

  xla_add     — lax.scan carrying a (D, K) array, `x + 1.0` per step
                (XLA elementwise read+write, the fusion ideal)
  pallas_copy — same scan, step = pallas grid copy kernel in→out (aliased)
  pallas_3in  — pallas step reading 3 (D, K) inputs + writing 1 (the fused
                Gibbs kernel's traffic pattern, minus compute)

Each reports effective GB/s = bytes-touched / wall.  If xla_add ≫
pallas_*, Mosaic pipelining is the bottleneck; if all are equal and low,
that's the chip/tunnel ceiling.
"""

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

D, K, U = 4608, 512, 32
BLOCK = 512
G = D // BLOCK
BYTES = D * K * 4


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) / U


def report(name, dt, nbytes):
    print(f"{name:12s} {dt*1e6:8.1f} us/step  {nbytes/dt/1e9:7.1f} GB/s effective",
          flush=True)


def main():
    x0 = jnp.ones((D, K), jnp.float32)
    a = jnp.full((D, K), 0.5, jnp.float32)
    b = jnp.full((D, K), 0.25, jnp.float32)

    @jax.jit
    def xla_add(x):
        def step(x, _):
            return x + 1.0, ()
        x, _ = jax.lax.scan(step, x, length=U)
        return x

    report("xla_add", timeit(xla_add, x0), 2 * BYTES)

    def copy_kernel(in_ref, out_ref):
        out_ref[:] = in_ref[:] + 1.0

    copy = pl.pallas_call(
        copy_kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((BLOCK, K), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLOCK, K), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, K), jnp.float32),
        input_output_aliases={0: 0},
    )

    @jax.jit
    def pallas_copy(x):
        def step(x, _):
            return copy(x), ()
        x, _ = jax.lax.scan(step, x, length=U)
        return x

    report("pallas_copy", timeit(pallas_copy, x0), 2 * BYTES)

    def three_kernel(a_ref, b_ref, in_ref, out_ref):
        out_ref[:] = in_ref[:] * a_ref[:] + b_ref[:]

    three = pl.pallas_call(
        three_kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((BLOCK, K), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((BLOCK, K), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, K), jnp.float32),
        input_output_aliases={2: 0},
    )

    @jax.jit
    def pallas_3in(x):
        def step(x, _):
            return three(a, b, x), ()
        x, _ = jax.lax.scan(step, x, length=U)
        return x

    report("pallas_3in", timeit(pallas_3in, x0), 4 * BYTES)

    # no-alias variant: fresh output buffer each step
    three_na = pl.pallas_call(
        three_kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((BLOCK, K), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((BLOCK, K), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, K), jnp.float32),
    )

    @jax.jit
    def pallas_3in_noalias(x):
        def step(x, _):
            return three_na(a, b, x), ()
        x, _ = jax.lax.scan(step, x, length=U)
        return x

    report("3in_noalias", timeit(pallas_3in_noalias, x0), 4 * BYTES)


if __name__ == "__main__":
    main()
