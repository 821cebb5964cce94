"""Checkpoint/restore for sharded training states (new design surface —
the reference has no distributed layer, SURVEY.md C24/§5).

Saves a :class:`trainer.DistributedLabeledLDA`'s full multi-chain state
(counts, thinned means, save counter, RNG key) through the same atomic
npz+json scheme as utils/checkpoint.py.  Arrays are gathered to host on
save and re-placed with the model's mesh sharding on restore, so a run can
resume on a different mesh shape as long as the chain count matches.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..utils.checkpoint import load_checkpoint, save_checkpoint

__all__ = ["save_sharded", "restore_sharded",
           "save_hslda_sharded", "restore_hslda_sharded"]


def save_sharded(path: str, model, iters_done: int = 0) -> None:
    """Snapshot a DistributedLabeledLDA (gathers shards to host)."""
    st = model.state
    arrays: Dict[str, Any] = {
        "n_vk": np.asarray(st.n_vk),
        "n_k": np.asarray(st.n_k),
        "ph_hat": np.asarray(st.ph_hat),
        "s": np.asarray(st.s),
        "rng_key": np.asarray(model._key),
    }
    if isinstance(st.z, tuple):
        # bucketed layout (parallel/fused_sharded_buckets.py): one
        # z/n_dk/th_hat entry per length bucket
        for g in range(len(st.z)):
            arrays[f"z_{g}"] = np.asarray(st.z[g])
            arrays[f"n_dk_{g}"] = np.asarray(st.n_dk[g])
            arrays[f"th_hat_{g}"] = np.asarray(st.th_hat[g])
    else:
        arrays.update(z=np.asarray(st.z), n_dk=np.asarray(st.n_dk),
                      th_hat=np.asarray(st.th_hat))
    if getattr(model, "sweep", "dense") == "fused":
        # the fused path's chunk-invariant stream derives from this key +
        # the sweep counter — persist it so a resume with a different
        # constructor seed still continues the original stream exactly
        arrays["master_key"] = np.asarray(model._master_key)
    meta = {
        "kind": "DistributedLabeledLDA",
        "table_shard": getattr(model, "table_shard", "replicated"),
        "sweep": getattr(model, "sweep", "dense"),
        "n_chains": int(model.n_chains),
        "K": int(model.K),
        "Kp": int(model.Kp),
        "V": int(model.V),
        "D": int(model.D),
        "alpha": float(model.alpha),
        "beta": float(model.beta),
        "iters_done": int(iters_done),
        "merge_M": getattr(model, "_merge_M", None),
        "n_buckets": int(getattr(model, "n_buckets", 1)),
    }
    save_checkpoint(path, arrays, meta)


def restore_sharded(path: str, model) -> Dict[str, Any]:
    """Restore a snapshot into a compatibly constructed trainer.

    Validates chain count and corpus shape, then re-places every array with
    the model's current mesh sharding.  Returns the checkpoint metadata.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .sharded import ShardedLDAState

    arrays, meta = load_checkpoint(path)
    if meta["kind"] != "DistributedLabeledLDA":
        raise ValueError(f"checkpoint is {meta['kind']}")
    for name, got in (("n_chains", model.n_chains), ("V", model.V), ("D", model.D)):
        if int(meta[name]) != int(got):
            raise ValueError(f"{name} mismatch: checkpoint {meta[name]}, model {got}")
    ckpt_buckets = int(meta.get("n_buckets", 1))
    if ckpt_buckets != int(getattr(model, "n_buckets", 1)):
        raise ValueError(
            f"bucket count mismatch: checkpoint {ckpt_buckets}, model "
            f"{getattr(model, 'n_buckets', 1)} (construct with "
            f"n_buckets={ckpt_buckets})")
    z0 = arrays["z_0"] if ckpt_buckets > 1 else arrays["z"]
    m0 = (np.asarray(model.state.z[0]) if ckpt_buckets > 1
          else np.asarray(model.state.z))
    if z0.shape != m0.shape:
        raise ValueError(
            f"state shape mismatch: checkpoint {z0.shape}, model {m0.shape}"
        )

    layout = meta.get("sweep", "dense")
    if layout != getattr(model, "sweep", "dense"):
        raise ValueError(
            f"checkpoint layout is {layout!r}, model sweep is "
            f"{getattr(model, 'sweep', 'dense')!r} (construct with "
            f"sweep={layout!r})"
        )
    table_shard = meta.get("table_shard", "replicated")
    if table_shard != getattr(model, "table_shard", "replicated"):
        raise ValueError(
            f"checkpoint table_shard is {table_shard!r}, model is "
            f"{getattr(model, 'table_shard', 'replicated')!r}"
        )

    # explicit mesh shardings (the freshly initialised model's ph_hat/th_hat
    # are plain single-device zeros until the first step runs — their
    # .sharding is NOT the mesh placement the training step expects)
    def put(name, spec):
        return jax.device_put(
            jnp.asarray(arrays[name]), NamedSharding(model.mesh, spec)
        )

    if table_shard == "vocab" and getattr(model, "_vocab_chains", False):
        from .vocab_sharded import VocabChainsTrainState

        model.state = VocabChainsTrainState(
            z=put("z", P("chains", None, "data")),
            n_dk=put("n_dk", P("chains", None, "data")),
            n_vk=put("n_vk", P("chains", "data", None)),
            n_k=put("n_k", P("chains", None)),
            ph_hat=put("ph_hat", P("chains", "data", None)),
            th_hat=put("th_hat", P("chains", "data", None)),
            s=put("s", P()),
        )
    elif table_shard == "vocab":
        from .vocab_sharded import VocabShardedTrainState

        model.state = VocabShardedTrainState(
            z=put("z", P(None, "data")),
            n_dk=put("n_dk", P(None, "data")),
            n_vk=put("n_vk", P("data", None)),
            n_k=put("n_k", P()),
            ph_hat=put("ph_hat", P("data", None)),
            th_hat=put("th_hat", P("data", None)),
            s=put("s", P()),
        )
    elif layout == "fused" and ckpt_buckets > 1:
        from .fused_sharded_buckets import BucketedShardedState

        model.state = BucketedShardedState(
            z=tuple(put(f"z_{g}", P("chains", None, "data"))
                    for g in range(ckpt_buckets)),
            n_dk=tuple(put(f"n_dk_{g}", P("chains", None, "data"))
                       for g in range(ckpt_buckets)),
            n_vk=put("n_vk", P("chains", None, None)),
            n_k=put("n_k", P("chains", None)),
            ph_hat=put("ph_hat", P("chains", None, None)),
            th_hat=tuple(put(f"th_hat_{g}", P("chains", "data", None))
                         for g in range(ckpt_buckets)),
            s=put("s", P()),
        )
    elif layout == "fused":
        from .fused_sharded import FusedShardedState

        model.state = FusedShardedState(
            z=put("z", P("chains", None, "data")),
            n_dk=put("n_dk", P("chains", None, "data")),
            n_vk=put("n_vk", P("chains", None, None)),
            n_k=put("n_k", P("chains", None)),
            ph_hat=put("ph_hat", P("chains", None, None)),
            th_hat=put("th_hat", P("chains", "data", None)),
            s=put("s", P()),
        )
    else:
        model.state = ShardedLDAState(
            z=put("z", P("chains", "data", None)),
            n_dk=put("n_dk", P("chains", "data", None)),
            n_vk=put("n_vk", P("chains", None, None)),
            n_k=put("n_k", P("chains", None)),
            ph_hat=put("ph_hat", P("chains", None, None)),
            th_hat=put("th_hat", P("chains", "data", None)),
            s=put("s", P()),
        )
    # replicate the key over the mesh — a single-device key mixed with
    # mesh-sharded state arrays fails jit's device-set check
    model._key = jax.device_put(
        jnp.asarray(arrays["rng_key"]), NamedSharding(model.mesh, P())
    )
    if layout == "fused":
        # fused block keys derive from the fixed master key + this counter
        model._sweeps_done = int(meta.get("iters_done", 0))
        if meta.get("merge_M") is not None:
            model._ckpt_merge_M = int(meta["merge_M"])
        if "master_key" in arrays:
            model._master_key = jax.device_put(
                jnp.asarray(arrays["master_key"]),
                NamedSharding(model.mesh, P()),
            )
    return meta


def save_hslda_sharded(path: str, model, iters_done: int = 0) -> None:
    """Snapshot a DistributedHSLDA (parallel/hslda_trainer.py).

    Gathers the per-chain sharded blocked-Gibbs state (z, counts, η, a, β)
    plus the host-side thinned φ̂ mean to the same atomic npz+json scheme.
    ``model.state`` must exist (run_training at least once before saving).
    """
    st = model.state
    if st is None:
        raise ValueError("DistributedHSLDA has no state yet — train first")
    arrays: Dict[str, Any] = {
        "z": np.asarray(st.z),
        "n_dk": np.asarray(st.n_dk),
        "n_vk": np.asarray(st.n_vk),
        "n_k": np.asarray(st.n_k),
        "eta": np.asarray(st.eta),
        "a": np.asarray(st.a),
        "beta_vec": np.asarray(st.beta),
        "rng_key": np.asarray(model._key),
        # the chunk-invariant cycle stream derives from this key + the
        # global cycle counter — persist both so a resume continues the
        # original stream bit-identically
        "master_key": np.asarray(model._master_key),
    }
    if model._ph_hat is not None:
        arrays["ph_hat"] = np.asarray(model._ph_hat)
    meta = {
        "kind": "DistributedHSLDA",
        "table_shard": getattr(model, "table_shard", "replicated"),
        "n_chains": int(model.n_chains),
        "K": int(model.K),
        "L": int(model.L),
        "V": int(model.V),
        "D": int(model.D),
        "n_saves": int(model._n_saves),
        "iters_done": int(iters_done),
        "cycles_done": int(model._cycles_done),
    }
    save_checkpoint(path, arrays, meta)


def restore_hslda_sharded(path: str, model) -> Dict[str, Any]:
    """Restore a DistributedHSLDA snapshot into a compatibly built trainer.

    The trainer may be freshly constructed (state is created lazily on the
    first run_training) — shardings are derived from the model's mesh, so a
    snapshot can move across mesh shapes with the same chain count.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .hslda_sharded import HSLDAShardedState, _specs

    arrays, meta = load_checkpoint(path)
    if meta["kind"] != "DistributedHSLDA":
        raise ValueError(f"checkpoint is {meta['kind']}")
    for name, got in (("n_chains", model.n_chains), ("K", model.K),
                      ("L", model.L), ("V", model.V), ("D", model.D)):
        if int(meta[name]) != int(got):
            raise ValueError(f"{name} mismatch: checkpoint {meta[name]}, model {got}")
    table_shard = meta.get("table_shard", "replicated")
    if table_shard != getattr(model, "table_shard", "replicated"):
        raise ValueError(
            f"checkpoint table_shard is {table_shard!r}, model is "
            f"{getattr(model, 'table_shard', 'replicated')!r}")

    sp = _specs(model.mesh, table_shard)

    def put(name, spec):
        return jax.device_put(
            jnp.asarray(arrays[name]), NamedSharding(model.mesh, spec)
        )

    model.state = HSLDAShardedState(
        z=put("z", sp["z"]),
        n_dk=put("n_dk", sp["n_dk"]),
        n_vk=put("n_vk", sp["n_vk"]),
        n_k=put("n_k", sp["n_k"]),
        eta=put("eta", sp["eta"]),
        a=put("a", sp["a"]),
        beta=put("beta_vec", sp["beta"]),
    )
    model._ph_hat = (
        np.asarray(arrays["ph_hat"]) if "ph_hat" in arrays else None
    )
    model._n_saves = int(meta.get("n_saves", 0))
    model._cycles_done = int(meta.get("cycles_done", meta.get("iters_done", 0)))
    model._key = jax.device_put(
        jnp.asarray(arrays["rng_key"]), NamedSharding(model.mesh, P())
    )
    if "master_key" in arrays:
        model._master_key = jax.device_put(
            jnp.asarray(arrays["master_key"]), NamedSharding(model.mesh, P())
        )
    return meta
