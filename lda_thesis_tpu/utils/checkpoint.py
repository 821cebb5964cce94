"""Checkpoint / resume — count-tensor + RNG-key snapshots.

A strict superset of the reference's persistence (SURVEY.md C21: write-only
``pickle.dump`` of the whole model object behind the ``-p`` flag,
evaluate_LabeledLDA.py:142-145 — no load/resume code exists there):

* arrays are stored in a single ``.npz`` (count tensors, thinned means, RNG
  key), metadata (hyperparameters, labelmap, vocabulary) as JSON — no
  pickled code objects, so checkpoints survive refactors;
* writes are atomic (temp file + rename) so an interrupted run never leaves
  a corrupt checkpoint;
* :func:`save_model` / :func:`restore_model` round-trip the full training
  state of every model class — training can resume mid-chain with the exact
  RNG stream.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, Tuple

import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint", "save_model", "restore_model"]


def _atomic_write(path: str, write_fn) -> None:
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            write_fn(f)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def save_checkpoint(path: str, arrays: Dict[str, Any], meta: Dict[str, Any]) -> None:
    """Atomically write ``{path}.npz`` (arrays) and ``{path}.json`` (metadata)."""
    np_arrays = {k: np.asarray(v) for k, v in arrays.items()}
    _atomic_write(path + ".npz", lambda f: np.savez(f, **np_arrays))
    _atomic_write(
        path + ".json", lambda f: f.write(json.dumps(meta, indent=1).encode())
    )


def load_checkpoint(path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    with np.load(path + ".npz") as z:
        arrays = {k: z[k] for k in z.files}
    with open(path + ".json") as f:
        meta = json.load(f)
    return arrays, meta


# --------------------------------------------------------------------------
# model-level snapshots
# --------------------------------------------------------------------------


def _model_kind(model) -> str:
    return type(model).__name__


def save_model(path: str, model, extra_meta: Dict[str, Any] = None) -> None:
    """Snapshot a LabeledLDA / LocalLDA / CascadeLDA / HSLDA training state.

    ``extra_meta`` lets callers record run-level progress (e.g. the CLI's
    ``iters_done``) alongside the model state.
    """
    kind = _model_kind(model)
    if kind == "DistributedLabeledLDA":
        from ..parallel.sharded_io import save_sharded

        return save_sharded(path, model,
                            iters_done=(extra_meta or {}).get("iters_done", 0))
    if kind == "DistributedHSLDA":
        from ..parallel.sharded_io import save_hslda_sharded

        return save_hslda_sharded(
            path, model, iters_done=(extra_meta or {}).get("iters_done", 0))
    import jax.numpy as jnp  # noqa: F401

    arrays: Dict[str, Any] = {"rng_key": np.asarray(model._key)}
    meta: Dict[str, Any] = {"kind": kind}
    if extra_meta:
        meta.update(extra_meta)

    if kind in ("LabeledLDA", "LocalLDA"):
        # bucketed state: one z/n_dk pair per length bucket
        meta["n_buckets"] = len(model.counts.z)
        for g in range(len(model.counts.z)):
            arrays[f"z_{g}"] = model.counts.z[g]
            arrays[f"n_dk_{g}"] = model.counts.n_dk[g]
        arrays.update(n_vk=model.counts.n_vk, n_k=model.counts.n_k)
        if kind == "LabeledLDA":
            arrays.update(ph_hat=model.ph_hat, th_hat=model.th_hat)
            meta.update(alpha=model.alpha, beta=model.beta, K=model.K,
                        Kp=model.Kp, V=model.V, D=model.D,
                        sweep=model.sweep, avg_s=int(model._avg_s),
                        merge_M=getattr(model, "_merge_M", None),
                        labelmap=model.labelmap,
                        cur_perplx=list(map(float, model.cur_perplx)))
            if model.sweep == "fused":
                from ..ops.gibbs_fused import SAMPLER_FORMULA_VERSION

                meta["sampler_formula"] = SAMPLER_FORMULA_VERSION
        else:
            if model.ph_hat is not None:
                arrays.update(ph_hat=model.ph_hat, th_hat=model.th_hat)
            meta.update(alpha=model.a, beta=model.b, K=model.K, Kp=model.Kp,
                        V=model.V, D=model.D, token2id=model.word2id.token2id,
                        sweep=model.sweep,
                        merge_M=getattr(model, "_merge_M", None))
            if model.sweep == "fused":
                from ..ops.gibbs_fused import SAMPLER_FORMULA_VERSION

                meta["sampler_formula"] = SAMPLER_FORMULA_VERSION
    elif kind == "CascadeLDA":
        arrays.update(ph=model.ph)
        meta.update(alpha=model.alpha, beta=model.beta, K=model.K, V=model.V,
                    D=model.D, labelmap=model.labelmap)
    elif kind == "HSLDA":
        arrays.update(
            z=model.counts.z, n_dk=model.counts.n_dk, n_vk=model.counts.n_vk,
            n_k=model.counts.n_k, eta=model.eta, a=model.a, beta_vec=model.beta,
            master_key=np.asarray(model._master_key),
        )
        if model.ph is not None:
            arrays.update(ph=model.ph, th=model.th)
        meta.update(K=model.K, L=model.L, V=model.V, D=model.D,
                    alpha=model.alpha, aprime=model.aprime, gamma=model.gamma,
                    mu=model.mu, sigma=model.sigma, xi=model.xi,
                    avg_s=int(getattr(model, "_avg_s", 0)),
                    cycles_done=int(getattr(model, "_cycles_done", 0)),
                    labelmap=model.labelmap, token2id=model.w_to_v)
    else:
        raise TypeError(f"unknown model kind: {kind}")
    save_checkpoint(path, arrays, meta)


def restore_model(path: str, model) -> Dict[str, Any]:
    """Restore a snapshot into a *compatibly constructed* model instance.

    The instance must be built over the same corpus/vocabulary (shapes are
    validated); counts, thinned means, auxiliary state, and the RNG key are
    replaced so training continues exactly where the snapshot left off.
    Returns the checkpoint metadata (including any ``extra_meta`` recorded
    at save time, e.g. ``iters_done``).
    """
    import jax.numpy as jnp

    kind = _model_kind(model)
    if kind == "DistributedLabeledLDA":
        from ..parallel.sharded_io import restore_sharded

        return restore_sharded(path, model)
    if kind == "DistributedHSLDA":
        from ..parallel.sharded_io import restore_hslda_sharded

        return restore_hslda_sharded(path, model)
    arrays, meta = load_checkpoint(path)
    if meta["kind"] != kind:
        raise ValueError(f"checkpoint is {meta['kind']}, model is {kind}")

    def _chk(name, got, want):
        if int(got) != int(want):
            raise ValueError(f"{name} mismatch: checkpoint {want}, model {got}")

    _chk("V", model.V, meta["V"])
    _chk("D", model.D, meta["D"])

    if kind in ("LabeledLDA", "LocalLDA"):
        from ..ops.gibbs import BucketLDAState, CompactBucketState

        G = int(meta["n_buckets"])
        if len(model.counts.z) != G:
            raise ValueError(
                f"bucket count mismatch: checkpoint {G}, model "
                f"{len(model.counts.z)} (construct with n_buckets={G}; "
                f"CLI: --n-buckets {G})"
            )
        sweep = meta.get("sweep", "dense")
        if sweep != model.sweep:
            raise ValueError(
                f"sweep kernel mismatch: checkpoint {sweep!r}, model "
                f"{model.sweep!r} (construct with sweep={sweep!r})"
            )
        if sweep == "fused":
            from ..ops.gibbs_fused import FusedBucketState as state_cls
        elif sweep == "compact":
            state_cls = CompactBucketState
        else:
            state_cls = BucketLDAState
        model.counts = state_cls(
            z=tuple(jnp.asarray(arrays[f"z_{g}"]) for g in range(G)),
            n_dk=tuple(jnp.asarray(arrays[f"n_dk_{g}"]) for g in range(G)),
            n_vk=jnp.asarray(arrays["n_vk"]),
            n_k=jnp.asarray(arrays["n_k"]),
        )
        if "ph_hat" in arrays:
            if kind == "LabeledLDA":
                model.ph_hat = jnp.asarray(arrays["ph_hat"])
                model.th_hat = np.asarray(arrays["th_hat"])
            else:
                model.ph_hat = np.asarray(arrays["ph_hat"])
                model.th_hat = np.asarray(arrays["th_hat"])
        if kind == "LabeledLDA":
            model.cur_perplx = list(meta.get("cur_perplx", []))
            model._avg_s = int(meta.get("avg_s", 0))
        if meta.get("merge_M") is not None:
            model._ckpt_merge_M = int(meta["merge_M"])
        if sweep == "fused":
            from ..ops.gibbs_fused import SAMPLER_FORMULA_VERSION

            # round-5 ADVICE: the fused sampler's FP rounding order can
            # change between versions; chunk-invariant bit-identity only
            # holds within one formula version, so cross-version resumes
            # warn instead of silently drawing a different chain.  A
            # missing stamp means the checkpoint predates stamping (≤ v1,
            # whose (n_k−f)+Vβ rounding order differs from v2's by ULPs)
            # — exactly the divergent case, so it warns too.
            got = meta.get("sampler_formula")
            if got is None or int(got) != SAMPLER_FORMULA_VERSION:
                import warnings

                ver = "pre-v2 (unstamped)" if got is None else f"v{got}"
                warnings.warn(
                    f"checkpoint was recorded with fused sampler formula "
                    f"{ver}, current is v{SAMPLER_FORMULA_VERSION}: the "
                    f"resumed chain is statistically valid but not "
                    f"bit-identical to an uninterrupted run of either "
                    f"version", stacklevel=2)
    elif kind == "CascadeLDA":
        model.ph = np.asarray(arrays["ph"])
    elif kind == "HSLDA":
        from ..ops.hslda_gibbs import HSLDACounts

        model.counts = HSLDACounts(
            z=jnp.asarray(arrays["z"]),
            n_dk=jnp.asarray(arrays["n_dk"]),
            n_vk=jnp.asarray(arrays["n_vk"]),
            n_k=jnp.asarray(arrays["n_k"]),
        )
        model.eta = jnp.asarray(arrays["eta"])
        model.a = jnp.asarray(arrays["a"])
        model.beta = jnp.asarray(arrays["beta_vec"])
        if "ph" in arrays:
            model.ph = np.asarray(arrays["ph"])
            model.th = np.asarray(arrays["th"])
        model._avg_s = int(meta.get("avg_s", 0))
        # chunk-invariant training RNG (whole-run loop): the master key is
        # fixed at construction of the RECORDING run, so it must round-trip
        # (older checkpoints predate it — keep the constructor's)
        if "master_key" in arrays:
            model._master_key = jnp.asarray(arrays["master_key"])
        model._cycles_done = int(meta.get("cycles_done", 0))
    model._key = jnp.asarray(arrays["rng_key"])
    return meta
