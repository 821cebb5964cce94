"""A/B: train_sweep_fast as-is (labs/tri closed over = loop-invariant HBM
operands) vs labs/tri threaded through the scan carry."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from lda_thesis_tpu.ops.gibbs_pallas import fused_draw_update

D, U, V, K = 4608, 32, 8969, 512
ALPHA, BETA = 0.1, 0.01
VBETA = V * BETA

rng = np.random.default_rng(0)
tok_v = jnp.asarray(rng.integers(0, V, (U, D)), jnp.int32)
ff = jnp.asarray((rng.random((U, D)) < 0.35) * rng.integers(1, 4, (U, D)), jnp.float32)
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

@jax.jit
def sweep_invariant(key, n_dk, n_vk, n_k, z_t):
    uniforms = jax.random.uniform(key, (U, D), dtype=jnp.float32)
    def step(carry, xs):
        n_dk, n_vk, n_k = carry
        v, f, z_old, u = xs
        dec_k = jnp.zeros((K,), jnp.float32).at[z_old].add(f)
        nk_minus = n_k - dec_k
        n_vk = n_vk.at[v, z_old].add(-f)
        cv = n_vk[v]
        recip = 1.0 / (nk_minus + VBETA)
        n_dk, z_new, dnk = fused_draw_update(u, f, z_old, labs, n_dk, cv, recip, TRI, ALPHA, BETA)
        n_vk = n_vk.at[v, z_new].add(f)
        return (n_dk, n_vk, n_k + dnk), z_new
    (n_dk, n_vk, n_k), z_t = jax.lax.scan(step, (n_dk, n_vk, n_k), (tok_v, ff, z0, uniforms))
    return n_dk, n_vk, n_k, z_t

@jax.jit
def sweep_carry(key, n_dk, n_vk, n_k, z_t, labs_c, tri_c):
    uniforms = jax.random.uniform(key, (U, D), dtype=jnp.float32)
    def step(carry, xs):
        n_dk, n_vk, n_k, labs_c, tri_c = carry
        v, f, z_old, u = xs
        dec_k = jnp.zeros((K,), jnp.float32).at[z_old].add(f)
        nk_minus = n_k - dec_k
        n_vk = n_vk.at[v, z_old].add(-f)
        cv = n_vk[v]
        recip = 1.0 / (nk_minus + VBETA)
        n_dk, z_new, dnk = fused_draw_update(u, f, z_old, labs_c, n_dk, cv, recip, tri_c, ALPHA, BETA)
        n_vk = n_vk.at[v, z_new].add(f)
        return (n_dk, n_vk, n_k + dnk, labs_c, tri_c), z_new
    (n_dk, n_vk, n_k, _, _), z_t = jax.lax.scan(
        step, (n_dk, n_vk, n_k, labs_c, tri_c), (tok_v, ff, z0, uniforms))
    return n_dk, n_vk, n_k, z_t

key = jax.random.PRNGKey(0)
dt = timeit(sweep_invariant, key, n_dk0, n_vk0, n_k0, z0)
print(f"invariant {dt/U*1e6:9.1f} us/pos  {tokens/dt/1e6:6.2f} M tok/s", flush=True)
dt = timeit(sweep_carry, key, n_dk0, n_vk0, n_k0, z0, labs, TRI)
print(f"carry     {dt/U*1e6:9.1f} us/pos  {tokens/dt/1e6:6.2f} M tok/s", flush=True)

# equality check
o1 = sweep_invariant(key, n_dk0, n_vk0, n_k0, z0)
o2 = sweep_carry(key, n_dk0, n_vk0, n_k0, z0, labs, TRI)
for a, b in zip(o1, o2):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
print("bitwise equal", flush=True)
