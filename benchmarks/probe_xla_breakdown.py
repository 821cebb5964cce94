"""Per-position cost of the XLA fast-layout sweep + ablations.

Variants: full, no_vk (skip n_vk gather/scatter), nodraw (skip posterior/
draw; memory floor), nohisto (skip dec_k scatter), chunk4 (4 positions per
scan step, unrolled — amortises any per-step overhead)."""
import sys, time
sys.path.insert(0, "/root/repo")
import os
os.environ["LDA_NO_PALLAS"] = "1"
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

D, U, V, K = 4608, 32, 8969, 512
ALPHA, BETA = 0.1, 0.01
VBETA = V * BETA

rng = np.random.default_rng(0)
tok_v = jnp.asarray(rng.integers(0, V, (U, D)), jnp.int32)
tok_f = jnp.asarray((rng.random((U, D)) < 0.35) * rng.integers(1, 4, (U, D)), jnp.int32)
ff = tok_f.astype(jnp.float32)
z0 = jnp.asarray(rng.integers(0, K, (U, D)), jnp.int32)
labs = jnp.asarray((rng.random((D, K)) < 0.02) | (np.arange(K) == 0)[None, :], jnp.float32)
n_dk0 = jnp.ones((D, K), jnp.float32)
n_vk0 = jnp.ones((V, K), jnp.float32)
n_k0 = jnp.full((K,), float(V), jnp.float32)
TRI = jnp.triu(jnp.ones((K, K), jnp.float32))
tokens = float(np.asarray(ff).sum())

def timeit(fn, *args):
    out = fn(*args); jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); out = fn(*args); jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)

def make(variant, chunk=1):
    def body(n_dk, n_vk, n_k, v, f, fF, z_old, u):
        if variant != "nohisto":
            fo = fF[:, None] * jax.nn.one_hot(z_old, K, dtype=jnp.float32)
            n_dk = n_dk - fo
            n_k = n_k - fo.sum(axis=0)
        if variant != "no_vk":
            n_vk = n_vk.at[v, z_old].add(-fF)
            cv = n_vk[v]
        else:
            cv = jnp.ones((D, K), jnp.float32)
        if variant == "nodraw":
            z_new = z_old
        else:
            w = labs * (n_dk + ALPHA) * (cv + BETA) * (1.0 / (n_k + VBETA))
            c = jnp.dot(w, TRI, preferred_element_type=jnp.float32)
            r = u * c[:, -1]
            z_new = jnp.sum(c < r[:, None], axis=1).astype(jnp.int32)
            z_new = jnp.where(f > 0, z_new, z_old)
        if variant != "nohisto":
            fn_ = fF[:, None] * jax.nn.one_hot(z_new, K, dtype=jnp.float32)
            n_dk = n_dk + fn_
            n_k = n_k + fn_.sum(axis=0)
        if variant != "no_vk":
            n_vk = n_vk.at[v, z_new].add(fF)
        return n_dk, n_vk, n_k, z_new

    @jax.jit
    def sweep(key, n_dk, n_vk, n_k):
        uniforms = jax.random.uniform(key, (U, D), dtype=jnp.float32)
        if chunk == 1:
            def step(carry, xs):
                n_dk, n_vk, n_k = carry
                v, f, fF_, z_old, u = xs
                n_dk, n_vk, n_k, z_new = body(n_dk, n_vk, n_k, v, f, fF_, z_old, u)
                return (n_dk, n_vk, n_k), z_new
            (n_dk, n_vk, n_k), z = jax.lax.scan(
                step, (n_dk, n_vk, n_k), (tok_v, tok_f, ff, z0, uniforms))
        else:
            def step(carry, xs):
                n_dk, n_vk, n_k = carry
                vs, fs, fFs, zs, us = xs
                outs = []
                for i in range(chunk):
                    n_dk, n_vk, n_k, z_new = body(
                        n_dk, n_vk, n_k, vs[i], fs[i], fFs[i], zs[i], us[i])
                    outs.append(z_new)
                return (n_dk, n_vk, n_k), jnp.stack(outs)
            resh = lambda x: x.reshape(U // chunk, chunk, D)
            (n_dk, n_vk, n_k), z = jax.lax.scan(
                step, (n_dk, n_vk, n_k),
                (resh(tok_v), resh(tok_f), resh(ff), resh(z0), resh(uniforms)))
        return n_dk, n_vk, n_k, z
    return sweep

key = jax.random.PRNGKey(0)
for variant in ("full", "no_vk", "nodraw", "nohisto"):
    dt = timeit(make(variant), key, n_dk0, n_vk0, n_k0)
    print(f"{variant:8s} {dt/U*1e6:8.1f} us/pos  {tokens/dt/1e6:6.2f} M tok/s", flush=True)
dt = timeit(make("full", chunk=4), key, n_dk0, n_vk0, n_k0)
print(f"chunk4   {dt/U*1e6:8.1f} us/pos  {tokens/dt/1e6:6.2f} M tok/s", flush=True)
