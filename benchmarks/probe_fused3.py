"""Fused-sweep pipeline candidates, end-to-end honest timings.

probe_fused2's sub-ms gather numbers were too good to be true (XLA can
short-circuit when a huge intermediate feeds nothing) — here every variant
is forced through a reduction or feeds the real kernel, and the full
sweep (gather -> transpose -> whole-sweep Pallas kernel -> scatter) is
timed as one jit on integer-valued count tables.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from probe_fused import build_kernel  # noqa: E402  (whole-sweep kernel)

D, U, A, K, V = 4224, 128, 24, 512, 8969
ALPHA, BETA = 0.1, 0.01


def timed(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


def main():
    rng = np.random.default_rng(0)
    tok_v_dm = rng.integers(0, V, size=(D, U)).astype(np.int32)
    n_types = rng.integers(8, U, size=(D,))
    f_dm = (np.arange(U)[None, :] < n_types[:, None]).astype(np.float32)
    f_dm *= rng.integers(1, 4, size=(D, U)).astype(np.float32)
    lab_ids = np.zeros((D, A), np.int32)
    lab_valid = np.zeros((D, A), np.float32)
    for d in range(D):
        ids = np.sort(rng.choice(K - 120, size=rng.integers(2, 6), replace=False))
        lab_ids[d, : len(ids)] = ids
        lab_valid[d, : len(ids)] = 1.0
    # integer-valued count table (the real regime: exact f32 integers)
    n_vk_np = rng.integers(0, 3000, size=(V, K)).astype(np.float32)

    tok_v = jnp.asarray(tok_v_dm)
    lab = jnp.asarray(lab_ids)
    nvk = jnp.asarray(n_vk_np)
    fj = jnp.asarray(f_dm)
    tokens = float(f_dm.sum())

    CH = 1056
    pick = jnp.asarray(
        (lab_ids[:, :, None] == np.arange(K)[None, None, :]).astype(np.float32))

    # --------- gather variants, forced through a checksum ------------------
    @jax.jit
    def g_take(nvk, tok_v, lab):
        def step(_, xs):
            v, lb = xs
            rows = nvk[v]
            return None, jnp.take_along_axis(rows, lb[:, None, :], axis=2)
        _, cv = jax.lax.scan(
            step, None,
            (tok_v.reshape(D // CH, CH, U), lab.reshape(D // CH, CH, A)))
        return cv.reshape(D, U, A)

    @jax.jit
    def g_take_sum(nvk, tok_v, lab):
        return g_take(nvk, tok_v, lab).sum()

    dt, s1 = timed(g_take_sum, nvk, tok_v, lab)
    print(f"gather take  +sum : {dt*1e3:7.2f} ms")

    @jax.jit
    def g_mxu(nvk, tok_v, pick):
        def step(_, xs):
            v, pk = xs
            rows = nvk[v]
            cv = jax.lax.dot_general(
                rows, pk, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            return None, cv
        _, cv = jax.lax.scan(
            step, None,
            (tok_v.reshape(D // CH, CH, U), pick.reshape(D // CH, CH, A, K)))
        return cv.reshape(D, U, A)

    @jax.jit
    def g_mxu_sum(nvk, tok_v, pick):
        return g_mxu(nvk, tok_v, pick).sum()

    dt, s2 = timed(g_mxu_sum, nvk, tok_v, pick)
    print(f"gather MXU   +sum : {dt*1e3:7.2f} ms")

    cv_a = g_take(nvk, tok_v, lab)
    cv_b = g_mxu(nvk, tok_v, pick)
    print(f"  exact-equal on integer table: {bool((cv_a == cv_b).all())}")

    # --------- transpose (D, U, A) -> (U, A, D) ----------------------------
    @jax.jit
    def tr_sum(cv):
        return cv.transpose(1, 2, 0).sum()

    dt, _ = timed(tr_sum, cv_a)
    print(f"transpose (D,U,A)->(U,A,D)+sum: {dt*1e3:5.2f} ms")

    # --------- scatters -----------------------------------------------------
    zg_old = rng.integers(0, K - 120, size=(D, U)).astype(np.int32)
    zg_new = rng.integers(0, K - 120, size=(D, U)).astype(np.int32)
    zo, zn = jnp.asarray(zg_old), jnp.asarray(zg_new)

    @jax.jit
    def sc_two(nvk, tok_v, zo, zn, fj):
        vf = tok_v.reshape(-1)
        ff = fj.reshape(-1)
        nvk = nvk.at[vf, zo.reshape(-1)].add(-ff)
        nvk = nvk.at[vf, zn.reshape(-1)].add(ff)
        return nvk.sum()

    dt, _ = timed(sc_two, nvk, tok_v, zo, zn, fj)
    print(f"scatter x2 full frame +sum: {dt*1e3:6.2f} ms")

    @jax.jit
    def sc_one(nvk, tok_v, zo, zn, fj):
        vf = jnp.concatenate([tok_v.reshape(-1)] * 2)
        kf = jnp.concatenate([zo.reshape(-1), zn.reshape(-1)])
        ff = jnp.concatenate([-fj.reshape(-1), fj.reshape(-1)])
        return nvk.at[vf, kf].add(ff).sum()

    dt, _ = timed(sc_one, nvk, tok_v, zo, zn, fj)
    print(f"scatter x1 concat     +sum: {dt*1e3:6.2f} ms")

    # --------- full fused sweep e2e (gather -> kernel -> scatter) ----------
    kern = build_kernel(interpret=jax.default_backend() == "cpu")
    valid = jnp.asarray(lab_valid.T)
    tril = jnp.tril(jnp.ones((A, A), jnp.float32))
    n_k0 = nvk.sum(axis=0)
    z0 = jnp.asarray(
        np.minimum(rng.integers(0, 5, size=(U, D)), 23).astype(np.int32))
    ndk0 = jnp.zeros((A, D), jnp.float32)  # shape-only: timing, not semantics
    tok_f_pm = jnp.asarray(f_dm.T)

    @jax.jit
    def full_sweep(key, z, n_dk, n_vk, n_k):
        u = jax.random.uniform(key, (U, D), dtype=jnp.float32)
        cv_all = g_mxu(n_vk, tok_v, pick).transpose(1, 2, 0)
        nkg_ = n_k[lab].T
        z_new, ndk = kern(cv_all, tok_f_pm, u, z, nkg_, valid, n_dk, tril)
        zgo = jnp.take_along_axis(lab, z.T, axis=1)
        zgn = jnp.take_along_axis(lab, z_new.T, axis=1)
        vf = tok_v.reshape(-1)
        ff = tok_f_pm.T.reshape(-1)
        n_vk = n_vk.at[vf, zgo.reshape(-1)].add(-ff)
        n_vk = n_vk.at[vf, zgn.reshape(-1)].add(ff)
        return z_new, ndk, n_vk, n_vk.sum(axis=0)

    key = jax.random.PRNGKey(0)
    dt, out = timed(full_sweep, key, z0, ndk0, nvk, n_k0)
    print(f"FULL fused sweep (MXU gather): {dt*1e3:6.2f} ms -> "
          f"{tokens/dt/1e6:.1f} M tokens/s")

    @jax.jit
    def full_sweep_take(key, z, n_dk, n_vk, n_k):
        u = jax.random.uniform(key, (U, D), dtype=jnp.float32)
        cv_all = g_take(n_vk, tok_v, lab).transpose(1, 2, 0)
        nkg_ = n_k[lab].T
        z_new, ndk = kern(cv_all, tok_f_pm, u, z, nkg_, valid, n_dk, tril)
        zgo = jnp.take_along_axis(lab, z.T, axis=1)
        zgn = jnp.take_along_axis(lab, z_new.T, axis=1)
        vf = tok_v.reshape(-1)
        ff = tok_f_pm.T.reshape(-1)
        n_vk = n_vk.at[vf, zgo.reshape(-1)].add(-ff)
        n_vk = n_vk.at[vf, zgn.reshape(-1)].add(ff)
        return z_new, ndk, n_vk, n_vk.sum(axis=0)

    dt, out = timed(full_sweep_take, key, z0, ndk0, nvk, n_k0)
    print(f"FULL fused sweep (take gather): {dt*1e3:5.2f} ms -> "
          f"{tokens/dt/1e6:.1f} M tokens/s")


if __name__ == "__main__":
    main()
