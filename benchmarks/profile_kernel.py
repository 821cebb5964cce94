"""Fused-kernel profile: duty cycle, HBM utilisation, and a raw device trace.

Round-5 VERDICT item 5: the tokens/s headline (bench.py) cannot say WHERE
the merge-block sampler spends its time — this script can.  At the exact
bench configuration (abstracts depth-3, D=4171, V=8969, K=392, M=25) it:

1. times each stage of one merge block in isolation (warm, jitted):
   the whole ``fused_train_block`` (gather -> Pallas kernel -> scatter),
   the bulk table gather (``gather_cv``), the delta scatter
   (``_scatter_deltas``), the uniforms draw, and the Pallas kernel alone;
2. derives the kernel **duty cycle** (kernel time / whole-block time) and
   per-stage HBM traffic estimates -> achieved GB/s vs the chip's peak —
   the MFU-style utilisation number for a memory-bound sampler;
3. captures a raw ``jax.profiler`` trace of a few live blocks (TensorBoard-
   loadable evidence for the stage breakdown).

Writes ONE JSON artifact (default ``TRACE_r05.json`` at the repo root) and
the raw trace directory.  Usage:

    python benchmarks/profile_kernel.py [--out TRACE_r05.json] \
        [--trace-dir /tmp/lda_trace_r05] [--reps 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

DATA = "/root/reference/abstracts_data.csv"

# v5e (TPU v5 lite) public peak HBM bandwidth, GB/s — the denominator for
# the utilisation estimate (jax.devices()[0] reports the platform only)
PEAK_HBM_GB_S = 819.0


def _timeit(fn, reps: int) -> float:
    import jax

    fn()  # warm / compile
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="/root/repo/TRACE_r05.json")
    ap.add_argument("--trace-dir", default="/tmp/lda_trace_r05")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--merge", type=int, default=25)
    args = ap.parse_args()

    from lda_thesis_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from lda_thesis_tpu.data.corpus import load_corpus, split_data
    from lda_thesis_tpu.data.vocab import prune_dict
    from lda_thesis_tpu.models.labeled_lda import LabeledLDA
    from lda_thesis_tpu.ops import gibbs_fused as gf

    corpus = load_corpus(DATA, d=3, mode="truncate")
    train, _ = split_data(corpus, seed=42)
    dicti = prune_dict(train.docs, lower=0, upper=1)
    model = LabeledLDA(train.docs, train.labs, list(train.labelset), dicti,
                       alpha=0.1, beta=0.01, seed=0)
    assert model.sweep == "fused"

    st = gf.FusedLDAState(
        z=model.counts.z[0], n_dk=model.counts.n_dk[0],
        n_vk=model.counts.n_vk, n_k=model.counts.n_k,
    )
    tv_t = model._toks_v_t[0]
    tf_t = model._toks_f_t[0]
    lab_ids = model.lab_ids_t[0]
    lv_t = model._lab_valid_tt[0]
    U, D = tv_t.shape
    A = lab_ids.shape[1]
    V, K = st.n_vk.shape
    M = int(args.merge)
    alpha, beta = model.alpha, model.beta
    vbeta = float(model.V * beta)
    key = jax.random.PRNGKey(0)

    # ---- stage inputs (frozen once, exactly as fused_train_block stages)
    tril = jnp.tril(jnp.ones((A, A), jnp.float32))
    cv_all = gf.gather_cv(st.n_vk, tv_t, lab_ids)
    nkg = st.n_k[lab_ids].T + jnp.float32(vbeta)
    uniforms = jax.random.uniform(key, (M, U, D), dtype=jnp.float32)
    kernel_call = gf._build_block_kernel(M, U, A, D, float(alpha), float(beta))
    z1, _ = kernel_call(cv_all, tf_t.reshape(U, 1, D),
                        uniforms.reshape(M * U, 1, D), st.z.reshape(U, 1, D),
                        nkg, lv_t, st.n_dk, tril)
    z1 = z1.reshape(U, D)

    i16 = bool(getattr(model, "_table_i16", False))
    block = jax.jit(lambda k: gf.fused_train_block(
        k, st, tv_t, tf_t, lab_ids, lv_t, alpha, beta, M, vbeta=vbeta,
        table_i16=i16))
    gather = jax.jit(lambda: gf.gather_cv(st.n_vk, tv_t, lab_ids,
                                          table_i16=i16))
    kern = jax.jit(lambda u: kernel_call(
        cv_all, tf_t.reshape(U, 1, D), u.reshape(M * U, 1, D),
        st.z.reshape(U, 1, D), nkg, lv_t, st.n_dk, tril))
    scatter = jax.jit(lambda: gf._scatter_deltas(
        st.n_vk, tv_t, tf_t, lab_ids, st.z, z1))
    draw = jax.jit(lambda k: jax.random.uniform(k, (M, U, D),
                                                dtype=jnp.float32))

    reps = int(args.reps)
    t_block = _timeit(lambda: block(key), reps)
    t_gather = _timeit(gather, reps)
    t_kernel = _timeit(lambda: kern(uniforms), reps)
    t_scatter = _timeit(scatter, reps)
    t_draw = _timeit(lambda: draw(key), reps)

    # ---- raw trace evidence: a few live blocks under the profiler
    os.makedirs(args.trace_dir, exist_ok=True)
    jax.profiler.start_trace(args.trace_dir)
    out = None
    for i in range(3):
        out = block(jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    trace_files = sorted(
        os.path.relpath(os.path.join(r, f), args.trace_dir)
        for r, _, fs in os.walk(args.trace_dir) for f in fs)

    # ---- HBM traffic model (f32 = 4 B), per M-sweep merge block:
    #   gather: reads U*D table rows of K lanes + writes cv (U, A, D)
    #   kernel: reads cv + f + z0 + M*U*D uniforms, writes z + ndk
    #   scatter: reads z0/z1/v/f, read-modify-writes 2*U*D table entries
    by = {
        "gather": (U * D * K + U * A * D) * 4,
        "kernel": (U * A * D + 3 * U * D + M * U * D + U * D + A * D) * 4,
        "scatter": (4 * U * D + 2 * U * D * 2) * 4,
        "uniform_draw": M * U * D * 4,
    }
    gbs = {k: by[k] / t / 1e9 for k, t in
           [("gather", t_gather), ("kernel", t_kernel),
            ("scatter", t_scatter), ("uniform_draw", t_draw)]}

    tokens = int(model.n_tokens)
    artifact = {
        "config": {"D": D, "U": U, "A": A, "V": V, "K": K, "M": M,
                   "tokens_per_sweep": tokens,
                   "table_i16": i16,
                   "device": str(jax.devices()[0]),
                   "reps": reps},
        "stage_ms_per_block": {
            "whole_block": round(t_block * 1e3, 3),
            "gather_cv": round(t_gather * 1e3, 3),
            "pallas_kernel": round(t_kernel * 1e3, 3),
            "scatter_deltas": round(t_scatter * 1e3, 3),
            "uniform_draw": round(t_draw * 1e3, 3),
            "stage_sum": round(
                (t_gather + t_kernel + t_scatter + t_draw) * 1e3, 3),
        },
        "kernel_duty_cycle": round(t_kernel / t_block, 3),
        "tokens_per_s": round(tokens * M / t_block, 1),
        "hbm_traffic_model_bytes_per_block": by,
        "achieved_gb_per_s": {k: round(v, 1) for k, v in gbs.items()},
        "hbm_utilisation_of_peak": {
            k: round(v / PEAK_HBM_GB_S, 3) for k, v in gbs.items()},
        "peak_hbm_gb_per_s": PEAK_HBM_GB_S,
        "trace_dir": args.trace_dir,
        "trace_files": trace_files,
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact["stage_ms_per_block"]))
    print(f"duty cycle {artifact['kernel_duty_cycle']}, "
          f"tokens/s {artifact['tokens_per_s']:.3e}, wrote {args.out}")


if __name__ == "__main__":
    main()
