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

__all__ = ["save_sharded", "restore_sharded"]


def save_sharded(path: str, model, iters_done: int = 0) -> None:
    """Snapshot a DistributedLabeledLDA (gathers shards to host)."""
    st = model.state
    arrays: Dict[str, Any] = {
        "z": np.asarray(st.z),
        "n_dk": np.asarray(st.n_dk),
        "n_vk": np.asarray(st.n_vk),
        "n_k": np.asarray(st.n_k),
        "ph_hat": np.asarray(st.ph_hat),
        "th_hat": np.asarray(st.th_hat),
        "s": np.asarray(st.s),
        "rng_key": np.asarray(model._key),
    }
    meta = {
        "kind": "DistributedLabeledLDA",
        "n_chains": int(model.n_chains),
        "K": int(model.K),
        "Kp": int(model.Kp),
        "V": int(model.V),
        "D": int(model.D),
        "alpha": float(model.alpha),
        "beta": float(model.beta),
        "iters_done": int(iters_done),
    }
    save_checkpoint(path, arrays, meta)


def restore_sharded(path: str, model) -> Dict[str, Any]:
    """Restore a snapshot into a compatibly constructed trainer.

    Validates chain count and corpus shape, then re-places every array with
    the model's current mesh sharding.  Returns the checkpoint metadata.
    """
    import jax
    import jax.numpy as jnp

    from .sharded import ShardedLDAState

    arrays, meta = load_checkpoint(path)
    if meta["kind"] != "DistributedLabeledLDA":
        raise ValueError(f"checkpoint is {meta['kind']}")
    for name, got in (("n_chains", model.n_chains), ("V", model.V), ("D", model.D)):
        if int(meta[name]) != int(got):
            raise ValueError(f"{name} mismatch: checkpoint {meta[name]}, model {got}")
    if arrays["z"].shape != tuple(np.asarray(model.state.z).shape):
        raise ValueError(
            f"state shape mismatch: checkpoint {arrays['z'].shape}, "
            f"model {np.asarray(model.state.z).shape}"
        )

    def put(name, like):
        return jax.device_put(jnp.asarray(arrays[name]), like.sharding)

    st = model.state
    model.state = ShardedLDAState(
        z=put("z", st.z),
        n_dk=put("n_dk", st.n_dk),
        n_vk=put("n_vk", st.n_vk),
        n_k=put("n_k", st.n_k),
        ph_hat=put("ph_hat", st.ph_hat),
        th_hat=put("th_hat", st.th_hat),
        s=jnp.asarray(arrays["s"]),
    )
    model._key = jnp.asarray(arrays["rng_key"])
    return meta
