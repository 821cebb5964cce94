"""True multi-process jax.distributed execution of the sharded trainer.

Launches benchmarks/multihost_smoke.py as TWO separate OS processes (4 fake
CPU devices each → one 8-device global (chains, data) mesh), coordinated by
``jax.distributed`` with gloo CPU collectives.  This is the strongest
single-machine proof of the multi-host path (SURVEY.md C24): the AD-LDA
``psum`` merges and the pooled-φ̂ gather cross a real process boundary, not
just fake devices inside one process.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "benchmarks", "multihost_smoke.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_sharded_training():
    port = _free_port()
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        JAX_CPU_COLLECTIVES_IMPLEMENTATION="gloo",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, SCRIPT, "--process-id", str(i),
             "--num-processes", "2", "--port", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        )
        for i in range(2)
    ]
    try:
        outs = [p.communicate(timeout=280)[0] for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
        assert "MULTIHOST-OK" in out, f"process {i} missing OK:\n{out[-3000:]}"
        assert "processes=2 global_devices=8" in out
        assert "pooled_phi ok" in out  # L-LDA AD-LDA step + cross-process gather
        # north-star config #5: 64 HSLDA chains over the 2-process mesh
        assert "hslda 64-chain cycle ok (2 mesh rows x 32 chains/shard)" in out
