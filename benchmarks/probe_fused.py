"""Prototype probe: whole-sweep fused Gibbs kernel (one pallas_call/sweep).

Round-2 finding (ARCHITECTURE.md): the XLA sweep is bound by per-position
scan-step overhead (~280 us/position at U=128), not by gather/scatter or
draw compute.  This probes the round-3 design that removes the per-position
boundary entirely:

  * AD-sweep semantics: n_vk/n_k are FROZEN at sweep start (own-token
    contribution excluded exactly per slot); per-slot topic-word counts are
    gathered ONCE per sweep; all per-position work runs inside ONE Pallas
    kernel over the compact label support (A slots, reference posterior
    LabeledLDA.py:113-117); sweep-end batched scatter rebuilds n_vk.
  * layout: (A sublanes, D lanes) so the compact axis wastes no lanes.

Measures, on the real corpus shapes (D=4171->4224, U=128, A=24, K=512,
V=8969): gather variants, kernel, scatter, end-to-end sweep rate, and
bitwise equality of the Pallas kernel vs its XLA twin.

Result (v5e chip, 2026-08-21): see bottom-of-file RESULTS comment.
"""

from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

D, U, A, K, V = 4224, 128, 24, 512, 8969
ALPHA, BETA = 0.1, 0.01
VBETA = V * BETA


def make_problem(seed=0):
    rng = np.random.default_rng(seed)
    tok_v = rng.integers(0, V, size=(U, D)).astype(np.int32)  # position-major
    n_types = rng.integers(8, U, size=(D,))
    tok_f = (np.arange(U)[:, None] < n_types[None, :]).astype(np.float32)
    tok_f *= rng.integers(1, 4, size=(U, D)).astype(np.float32)
    n_labs = rng.integers(2, 6, size=(D,))
    lab_ids = np.zeros((D, A), np.int32)
    lab_valid = np.zeros((D, A), np.float32)
    for d in range(D):
        ids = np.sort(rng.choice(K - 120, size=n_labs[d], replace=False))
        lab_ids[d, : len(ids)] = ids
        lab_valid[d, : len(ids)] = 1.0
    z0 = np.zeros((U, D), np.int32)  # compact slots
    for d in range(D):
        z0[:, d] = rng.integers(0, max(n_labs[d], 1), size=U)
    # counts from z0
    n_vk = np.zeros((V, K), np.float32)
    n_dk = np.zeros((A, D), np.float32)
    for u in range(U):
        for d in range(D):
            f = tok_f[u, d]
            if f > 0:
                zc = z0[u, d]
                zg = lab_ids[d, zc]
                n_vk[tok_v[u, d], zg] += f
                n_dk[zc, d] += f
    n_k = n_vk.sum(axis=0)
    return (jnp.asarray(tok_v), jnp.asarray(tok_f), jnp.asarray(lab_ids),
            jnp.asarray(lab_valid), jnp.asarray(z0), jnp.asarray(n_vk),
            jnp.asarray(n_dk), jnp.asarray(n_k))


# ---------------------------------------------------------------- gather


@jax.jit
def gather_scan(n_vk, tok_v_t, lab_ids):
    def step(_, v):
        rows = n_vk[v]  # (D, K)
        cv = jnp.take_along_axis(rows, lab_ids, axis=1)  # (D, A)
        return None, cv.T
    _, cv_all = jax.lax.scan(step, None, tok_v_t)
    return cv_all  # (U, A, D)


@jax.jit
def gather_chunked(n_vk, tok_v_t, lab_ids):
    CH = 16
    def step(_, v):  # v (CH, D)
        rows = n_vk[v]  # (CH, D, K)
        cv = jnp.take_along_axis(rows, lab_ids[None], axis=2)  # (CH, D, A)
        return None, cv.transpose(0, 2, 1)
    _, cv = jax.lax.scan(step, None, tok_v_t.reshape(U // CH, CH, D))
    return cv.reshape(U, A, D)


@jax.jit
def gather_elem(n_vk, tok_v_t, lab_ids):
    flat = tok_v_t[:, None, :] * K + lab_ids.T[None]  # (U, A, D)
    return n_vk.reshape(-1)[flat]


# ---------------------------------------------------------------- kernel


@functools.lru_cache(maxsize=None)
def build_kernel(interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(cv_ref, f_ref, u_ref, z_ref, nkg_ref, valid_ref, ndk0_ref,
               tril_ref, zout_ref, ndk_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            ndk_ref[:] = ndk0_ref[:]

        a_ids = jax.lax.broadcasted_iota(jnp.int32, (A, D), 0)
        f = f_ref[0]  # (1, D)
        z_old = z_ref[0]  # (1, D)
        oh_old = jnp.where(a_ids == z_old, f, 0.0)  # (A, D)

        ndk_m = ndk_ref[:] - oh_old
        cv_eff = cv_ref[0] - oh_old
        nk_eff = nkg_ref[:] - oh_old
        w = valid_ref[:] * (ndk_m + ALPHA) * (cv_eff + BETA) * (
            1.0 / (nk_eff + VBETA))
        c = jnp.dot(tril_ref[:], w, preferred_element_type=jnp.float32)
        r = u_ref[0] * c[A - 1 : A, :]
        z_new = jnp.sum((c < r).astype(jnp.int32), axis=0, keepdims=True)
        z_new = jnp.where(f > 0, z_new, z_old)

        oh_new = jnp.where(a_ids == z_new, f, 0.0)
        ndk_ref[:] = ndk_m + oh_new
        zout_ref[0] = z_new

    grid_spec = pl.GridSpec(
        grid=(U,),
        in_specs=[
            pl.BlockSpec((1, A, D), lambda u: (u, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda u: (u, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda u: (u, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda u: (u, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((A, D), lambda u: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((A, D), lambda u: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((A, D), lambda u: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((A, A), lambda u: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, D), lambda u: (u, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((A, D), lambda u: (0, 0), memory_space=pltpu.VMEM),
        ),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((U, 1, D), jnp.int32),
            jax.ShapeDtypeStruct((A, D), jnp.float32),
        ),
        interpret=interpret,
    )

    def run(cv_all, tok_f, uniforms, z0, nkg, valid, ndk0, tril):
        z_out, ndk = call(cv_all, tok_f.reshape(U, 1, D),
                          uniforms.reshape(U, 1, D), z0.reshape(U, 1, D),
                          nkg, valid, ndk0, tril)
        return z_out.reshape(U, D), ndk

    return run


def xla_twin(cv_all, tok_f, uniforms, z0, nkg, valid, ndk0, tril):
    """Identical algorithm in pure XLA (same op order/orientation)."""
    def step(ndk, xs):
        cv, f, u, z_old = xs  # (A, D), (D,), (D,), (D,)
        f = f[None, :]
        z_old = z_old[None, :]
        a_ids = jax.lax.broadcasted_iota(jnp.int32, (A, D), 0)
        oh_old = jnp.where(a_ids == z_old, f, 0.0)
        ndk_m = ndk - oh_old
        cv_eff = cv - oh_old
        nk_eff = nkg - oh_old
        w = valid * (ndk_m + ALPHA) * (cv_eff + BETA) * (1.0 / (nk_eff + VBETA))
        c = jnp.dot(tril, w, preferred_element_type=jnp.float32)
        r = u * c[A - 1 : A, :]
        z_new = jnp.sum((c < r).astype(jnp.int32), axis=0, keepdims=True)
        z_new = jnp.where(f > 0, z_new, z_old)
        oh_new = jnp.where(a_ids == z_new, f, 0.0)
        return ndk_m + oh_new, z_new[0]

    ndk, z_all = jax.lax.scan(step, ndk0, (cv_all, tok_f, uniforms, z0))
    return z_all, ndk


# ---------------------------------------------------------------- scatter


@jax.jit
def scatter_stage(n_vk, tok_v_t, tok_f, lab_ids, z_old_all, z_new_all):
    zg_old = jnp.take_along_axis(lab_ids, z_old_all.T, axis=1).T  # (U, D)
    zg_new = jnp.take_along_axis(lab_ids, z_new_all.T, axis=1).T
    vf = tok_v_t.reshape(-1)
    ff = tok_f.reshape(-1)
    n_vk = n_vk.at[vf, zg_old.reshape(-1)].add(-ff)
    n_vk = n_vk.at[vf, zg_new.reshape(-1)].add(ff)
    return n_vk, n_vk.sum(axis=0)


# ---------------------------------------------------------------- driver


def timed(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


def main():
    on_tpu = jax.default_backend() != "cpu"
    (tok_v, tok_f, lab_ids, lab_valid, z0, n_vk, n_dk, n_k) = make_problem()
    tokens = float(tok_f.sum())
    print(f"backend={jax.default_backend()} tokens/sweep={tokens:.0f}")

    nkg = n_k[lab_ids].T  # (A, D)
    valid = jnp.asarray(lab_valid.T)
    tril = jnp.tril(jnp.ones((A, A), jnp.float32))
    key = jax.random.PRNGKey(0)
    uniforms = jax.random.uniform(key, (U, D), dtype=jnp.float32)

    for name, g in [("gather_scan", gather_scan),
                    ("gather_chunked", gather_chunked),
                    ("gather_elem", gather_elem)]:
        try:
            dt, cv = timed(g, n_vk, tok_v, lab_ids)
            print(f"{name}: {dt*1e3:.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}")
    cv_all = gather_chunked(n_vk, tok_v, lab_ids)

    twin = jax.jit(xla_twin)
    dt_twin, (z_twin, ndk_twin) = timed(
        twin, cv_all, tok_f, uniforms, z0, nkg, valid, n_dk, tril)
    print(f"xla_twin sweep-core: {dt_twin*1e3:.2f} ms")

    kern = build_kernel(interpret=not on_tpu)
    dt_k, (z_pal, ndk_pal) = timed(
        kern, cv_all[:, None].reshape(U, A, D) if False else cv_all,
        tok_f, uniforms, z0, nkg, valid, n_dk, tril)
    print(f"pallas sweep-core: {dt_k*1e3:.2f} ms")

    same_z = bool((z_pal == z_twin).all())
    same_ndk = bool((ndk_pal == ndk_twin).all())
    print(f"bitwise parity: z={same_z} ndk={same_ndk}")

    dt_s, _ = timed(scatter_stage, n_vk, tok_v, tok_f, lab_ids, z0, z_pal)
    print(f"scatter_stage: {dt_s*1e3:.2f} ms")

    # ---- end-to-end fused sweep (gather + kernel + scatter) in one jit
    @jax.jit
    def full_sweep(key, z, n_dk, n_vk, n_k):
        u = jax.random.uniform(key, (U, D), dtype=jnp.float32)
        cv_all = gather_chunked(n_vk, tok_v, lab_ids)
        nkg_ = n_k[lab_ids].T
        z_new, ndk = kern(cv_all, tok_f, u, z, nkg_, valid, n_dk, tril)
        n_vk2, n_k2 = scatter_stage(n_vk, tok_v, tok_f, lab_ids, z, z_new)
        return z_new, ndk, n_vk2, n_k2

    dt_e2e, out = timed(full_sweep, key, z0, n_dk, n_vk, n_k)
    print(f"full fused sweep: {dt_e2e*1e3:.2f} ms -> "
          f"{tokens/dt_e2e/1e6:.1f} M tokens/s")

    # count invariants after one sweep
    z_new, ndk, n_vk2, n_k2 = out
    total = float(tok_f.sum())
    assert abs(float(n_vk2.sum()) - total) < 1e-3, (float(n_vk2.sum()), total)
    assert abs(float(ndk.sum()) - total) < 1e-3
    assert float(n_vk2.min()) >= 0
    print("invariants ok")


if __name__ == "__main__":
    main()
