"""Find the VMEM-residency cliff for scan carries: per-step cost of an
elementwise scan whose whole working set is the carry, vs total carry MB.
Also: invariant-vs-carry A/B at the same total size."""
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

K = 512
for rows in (2304, 4608, 9216, 18432, 27648, 36864):
    mb = rows * K * 4 * 3 / 1e6
    x0 = jnp.ones((rows, K), jnp.float32)
    a0 = jnp.full((rows, K), 0.5, jnp.float32)
    b0 = jnp.full((rows, K), 0.25, jnp.float32)

    @jax.jit
    def carry3(x, a, b):
        def step(c, _):
            x, a, b = c
            return (x * a + b, a, b), ()
        (x, a, b), _ = jax.lax.scan(step, (x, a, b), length=U)
        return x
    dt = timeit(carry3, x0, a0, b0)
    print(f"carry3  rows={rows:6d} total={mb:6.1f}MB  {dt*1e6:9.1f} us/step", flush=True)
