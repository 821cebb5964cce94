"""Multi-host bootstrap: process-aware mesh construction over DCN × ICI.

The reference has no distributed layer at all (SURVEY.md C24); this module
is new TPU-native surface.  It wires three things together:

1. :func:`initialize_distributed` — ``jax.distributed.initialize`` from
   explicit args or the standard environment (``COORDINATOR_ADDRESS``,
   ``NUM_PROCESSES``, ``PROCESS_ID``; TPU pod slices autodetect all three).
   Safe to call on a single host (no-op) or twice (idempotent).
2. :func:`make_global_mesh` — a ``(chains, data)`` mesh over *all* processes'
   devices.  Chains never communicate during sampling (parallel/sharded.py),
   so the ``chains`` axis is laid over **DCN** (across hosts) and the
   ``data`` axis — whose AD-LDA ``psum`` count merges run every sweep —
   stays inside each host's **ICI** domain.  This is the
   ``mesh_utils.create_hybrid_device_mesh`` recipe specialised to the
   sampler's communication pattern.
3. :func:`chains_for` — the north-star chain layout helper: given a total
   chain count (e.g. 64 HSLDA chains over ≥2 hosts), split it into
   (mesh chains axis) × (vmapped chains per shard).

Typical multi-host launch (same program on every host):

    from lda_thesis_tpu.parallel import bootstrap
    bootstrap.initialize_distributed()            # env-driven
    mesh = bootstrap.make_global_mesh(n_chains=8)
    ... DistributedLabeledLDA(..., mesh=mesh, n_chains=64)
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

__all__ = [
    "initialize_distributed",
    "is_distributed",
    "make_global_mesh",
    "chains_for",
]

_initialized = False


def is_distributed() -> bool:
    """True once :func:`initialize_distributed` has run with >1 process."""
    import jax

    return jax.process_count() > 1


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
    """Bring up the JAX distributed runtime (idempotent).

    Resolution order per argument: explicit parameter → environment
    (``COORDINATOR_ADDRESS`` / ``NUM_PROCESSES`` / ``PROCESS_ID``) →
    platform autodetection (TPU pods fill all three in
    ``jax.distributed.initialize``).  A plain single-host run — nothing
    set anywhere — skips initialisation entirely, so library code can call
    this unconditionally.
    """
    global _initialized
    if _initialized:
        return
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("NUM_PROCESSES")
    env_pid = os.environ.get("PROCESS_ID")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None
    )
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None
    )

    if coordinator_address is None and num_processes is None:
        # single host, nothing to do — jax.process_count() stays 1
        _initialized = True
        return

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True


def _reset_for_tests() -> None:
    global _initialized
    _initialized = False


def make_global_mesh(
    n_chains: int = 1,
    n_data: Optional[int] = None,
    devices=None,
):
    """(chains, data) mesh over every process's devices, DCN-aware.

    With multiple processes the ``chains`` axis is placed across hosts
    (DCN) and the ``data`` axis within hosts (ICI): chains exchange nothing
    during sampling while data shards ``psum``-merge topic-word deltas every
    sweep, so the chatty axis rides the fast interconnect.  Requires
    ``n_chains`` to be a multiple of the process count in that case (whole
    hosts per chain group).  On a single process this reduces to
    :func:`sharded.make_mesh` over the visible devices.
    """
    import jax
    from jax.sharding import Mesh

    devices = list(devices if devices is not None else jax.devices())
    n_dev = len(devices)
    if n_data is None:
        if n_dev % n_chains:
            raise ValueError(f"{n_dev} devices not divisible by chains={n_chains}")
        n_data = n_dev // n_chains
    if n_chains * n_data != n_dev:
        raise ValueError(f"mesh {n_chains}x{n_data} != {n_dev} devices")

    n_proc = jax.process_count()
    if n_proc > 1:
        per_proc = n_dev // n_proc
        if n_chains % n_proc == 0 and n_data <= per_proc:
            # group each host's devices contiguously: hosts own whole chain
            # blocks → data-axis psum stays on ICI, chains axis crosses DCN
            by_proc = sorted(devices, key=lambda d: (d.process_index, d.id))
            devices = by_proc
        # else: fall through to the flat layout — data shards will cross
        # DCN, which works but is slower; callers wanting strict ICI data
        # placement should pick n_chains as a multiple of process_count.
    arr = np.asarray(devices).reshape(n_chains, n_data)
    return Mesh(arr, ("chains", "data"))


def chains_for(total_chains: int, mesh) -> Tuple[int, int]:
    """Split a total chain count into (mesh chains axis, chains per shard).

    E.g. the north-star HSLDA config — 64 chains over an 8-device mesh with
    ``chains=8`` — yields (8, 8): 8 mesh rows × 8 vmapped chains each.
    """
    mesh_chains = mesh.shape["chains"]
    if total_chains % mesh_chains:
        raise ValueError(
            f"total chains {total_chains} not divisible by mesh chains axis "
            f"{mesh_chains}"
        )
    return mesh_chains, total_chains // mesh_chains
