"""Measure raw lax.scan per-step overhead on this chip.

If a trivial scan step costs ~the same as the full Gibbs position step, the
sweep is launch/loop-overhead-bound and the fix is to process multiple
positions per step, not to shrink the per-position compute.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

D, K, V, U = 4608, 512, 8969, 32


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


@jax.jit
def scan_trivial(x):
    def step(c, _):
        return c + 1.0, None
    c, _ = jax.lax.scan(step, x, None, length=U)
    return c


@jax.jit
def scan_dk_add(x):
    def step(c, _):
        return c * 1.000001 + 0.5, None
    c, _ = jax.lax.scan(step, x, None, length=U)
    return c


@jax.jit
def scan_gather_scatter(n_vk, tok_v, f, z):
    def step(c, xs):
        v, ff, zz = xs
        c = c.at[v, zz].add(-ff)
        cv = c[v]
        c = c.at[v, zz].add(ff + 0 * cv.sum())
        return c, None
    c, _ = jax.lax.scan(step, n_vk, (tok_v.T, f.T, z.T))
    return c


@jax.jit
def scan_matmul(w, tri):
    def step(c, _):
        c = jnp.dot(c, tri, preferred_element_type=jnp.float32) * 1e-3
        return c, None
    c, _ = jax.lax.scan(step, w, None, length=U)
    return c


def main():
    rng = np.random.default_rng(0)
    x0 = jnp.float32(0.0)
    xdk = jnp.ones((D, K), jnp.float32)
    n_vk = jnp.ones((V, K), jnp.float32)
    tok_v = jnp.asarray(rng.integers(0, V, (D, U)), jnp.int32)
    f = jnp.asarray(rng.integers(1, 3, (D, U)), jnp.float32)
    z = jnp.asarray(rng.integers(0, K, (D, U)), jnp.int32)
    tri = jnp.triu(jnp.ones((K, K), jnp.float32))

    for name, fn, args in (
        ("trivial scalar", scan_trivial, (x0,)),
        ("(D,K) elementwise", scan_dk_add, (xdk,)),
        ("n_vk scatter+gather+scatter", scan_gather_scatter, (n_vk, tok_v, f, z)),
        ("(D,K)@(K,K) f32 matmul", scan_matmul, (xdk, tri)),
    ):
        dt = timeit(fn, *args)
        print(f"{name:30s} {dt*1e3:8.2f} ms total  {dt/U*1e6:8.1f} us/step")


if __name__ == "__main__":
    main()
