"""Decompose the fused-sweep gather/scatter costs (follow-up to probe_fused).

probe_fused measured gather_chunked 33.7 ms / scatter 23.1 ms vs 2.9 ms for
the whole-sweep kernel — the staged table accesses dominate.  This probe
isolates each candidate primitive on the same shapes to pick the winners:

  gather:  pure row gather | row gather + lane take | MXU one-hot pick
           (batched dot_general with a static per-doc pick one-hot)
  scatter: full padded frame | real-slots-only (static sorted slot list)
           | indices_are_sorted hint | int32 counts
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

D, U, A, K, V = 4224, 128, 24, 512, 8969


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
    lab_ids = np.zeros((D, A), np.int32)
    for d in range(D):
        ids = np.sort(rng.choice(K - 120, size=rng.integers(2, 6), replace=False))
        lab_ids[d, : len(ids)] = ids
    n_vk = rng.random((V, K)).astype(np.float32) * 50
    zg = rng.integers(0, K - 120, size=(D, U)).astype(np.int32)

    tok_v = jnp.asarray(tok_v_dm)
    lab = jnp.asarray(lab_ids)
    nvk = jnp.asarray(n_vk)
    zgj = jnp.asarray(zg)
    fj = jnp.asarray(f_dm)

    S = int(f_dm.sum())
    print(f"real slots S={S} of {D*U} padded")

    # ---------------- gather variants (doc-major frame (D, U, ...)) --------
    CH = 1056  # doc chunk

    @jax.jit
    def rowgather_only(nvk, tok_v):
        def step(_, v):  # (CH, U)
            return None, nvk[v]  # (CH, U, K)
        _, rows = jax.lax.scan(step, None, tok_v.reshape(D // CH, CH, U))
        return rows

    dt, rows = timed(rowgather_only, nvk, tok_v)
    print(f"row gather only   : {dt*1e3:7.2f} ms  ({D*U*K*4/dt/1e9:.0f} GB/s)")

    @jax.jit
    def rowgather_take(nvk, tok_v, lab):
        def step(_, xs):
            v, lb = xs  # (CH, U), (CH, A)
            rows = nvk[v]  # (CH, U, K)
            return None, jnp.take_along_axis(rows, lb[:, None, :], axis=2)
        _, cv = jax.lax.scan(
            step, None,
            (tok_v.reshape(D // CH, CH, U), lab.reshape(D // CH, CH, A)))
        return cv

    dt, _ = timed(rowgather_take, nvk, tok_v, lab)
    print(f"row gather + take : {dt*1e3:7.2f} ms")

    # static pick one-hot (D, A, K) f32
    pick = jnp.asarray(
        (lab_ids[:, :, None] == np.arange(K)[None, None, :]).astype(np.float32))

    @jax.jit
    def rowgather_mxupick(nvk, tok_v, pick):
        def step(_, xs):
            v, pk = xs  # (CH, U), (CH, A, K)
            rows = nvk[v]  # (CH, U, K)
            cv = jax.lax.dot_general(
                rows, pk, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (CH, U, A)
            return None, cv
        _, cv = jax.lax.scan(
            step, None,
            (tok_v.reshape(D // CH, CH, U), pick.reshape(D // CH, CH, A, K)))
        return cv

    dt, cv_mxu = timed(rowgather_mxupick, nvk, tok_v, pick)
    print(f"row gather + MXU pick: {dt*1e3:4.2f} ms")

    cv_take = rowgather_take(nvk, tok_v, lab)
    ok = bool(jnp.all(cv_take[..., 0, :] == cv_take[..., 0, :]))
    match = bool(jnp.all(cv_mxu.reshape(D, U, A)
                         == cv_take.reshape(D, U, A)))
    print(f"  mxu pick exact-equal to take: {match} {ok}")

    # int16 table gather
    nvk16 = nvk.astype(jnp.int16)

    @jax.jit
    def rowgather_only16(nvk16, tok_v):
        def step(_, v):
            return None, nvk16[v]
        _, rows = jax.lax.scan(step, None, tok_v.reshape(D // CH, CH, U))
        return rows

    dt, _ = timed(rowgather_only16, nvk16, tok_v)
    print(f"row gather int16  : {dt*1e3:7.2f} ms")

    # ---------------- scatter variants ------------------------------------
    @jax.jit
    def scatter_full(nvk, tok_v, zgj, fj):
        vf = tok_v.reshape(-1)
        return nvk.at[vf, zgj.reshape(-1)].add(fj.reshape(-1))

    dt, _ = timed(scatter_full, nvk, tok_v, zgj, fj)
    print(f"scatter full frame: {dt*1e3:7.2f} ms  ({D*U} updates)")

    # real slots only, statically sorted by word id
    sd, su = np.nonzero(f_dm > 0)
    order = np.argsort(tok_v_dm[sd, su], kind="stable")
    sl_v = jnp.asarray(tok_v_dm[sd, su][order])
    sl_flat = jnp.asarray((sd * U + su)[order].astype(np.int32))

    @jax.jit
    def scatter_real_sorted(nvk, zgj, fj):
        zf = zgj.reshape(-1)[sl_flat]
        ff = fj.reshape(-1)[sl_flat]
        return nvk.at[sl_v, zf].add(ff, indices_are_sorted=True)

    dt, _ = timed(scatter_real_sorted, nvk, zgj, fj)
    print(f"scatter real+sorted: {dt*1e3:6.2f} ms  ({S} updates)")

    @jax.jit
    def scatter_real_unsorted(nvk, zgj, fj):
        zf = zgj.reshape(-1)[sl_flat]
        ff = fj.reshape(-1)[sl_flat]
        return nvk.at[sl_v, zf].add(ff)

    dt, _ = timed(scatter_real_unsorted, nvk, zgj, fj)
    print(f"scatter real       : {dt*1e3:6.2f} ms")

    # element gather cost of the slot z/f values alone
    @jax.jit
    def slotvals(zgj, fj):
        return zgj.reshape(-1)[sl_flat], fj.reshape(-1)[sl_flat]

    dt, _ = timed(slotvals, zgj, fj)
    print(f"  slot z/f element gather: {dt*1e3:5.2f} ms")

    # scatter into a (V*K,) flat table with combined index
    @jax.jit
    def scatter_flat1d(nvk, zgj, fj):
        zf = zgj.reshape(-1)[sl_flat]
        ff = fj.reshape(-1)[sl_flat]
        flat = sl_v * K + zf
        return nvk.reshape(-1).at[flat].add(ff).reshape(V, K)

    dt, _ = timed(scatter_flat1d, nvk, zgj, fj)
    print(f"scatter flat 1d    : {dt*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
