"""Raw HBM streaming bandwidth: xla elementwise over arrays too big for
VMEM, plus invariant-input patterns matching the Gibbs kernel."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

U = 16

def timeit(fn, *args):
    out = fn(*args); jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); out = fn(*args); jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) / U

def report(name, dt, nbytes):
    print(f"{name:16s} {dt*1e6:9.1f} us/step {nbytes/dt/1e9:8.1f} GB/s", flush=True)

def run(D, K, tag):
    BYTES = D * K * 4
    x0 = jnp.ones((D, K), jnp.float32)
    a = jnp.full((D, K), 0.5, jnp.float32)
    b = jnp.full((D, K), 0.25, jnp.float32)

    @jax.jit
    def xla_add(x):
        def step(x, _): return x + 1.0, ()
        return jax.lax.scan(step, x, length=U)[0]
    report(f"xla_add_{tag}", timeit(xla_add, x0), 2 * BYTES)

    @jax.jit
    def xla_3in(x):
        def step(x, _): return x * a + b, ()
        return jax.lax.scan(step, x, length=U)[0]
    report(f"xla_3in_{tag}", timeit(xla_3in, x0), 4 * BYTES)

run(4608, 512, "9M")     # fits VMEM
run(36864, 512, "75M")   # far beyond VMEM
