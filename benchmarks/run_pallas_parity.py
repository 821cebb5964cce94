"""On-chip kernel-parity artifact (round-5 VERDICT item 8).

The bitwise Pallas-kernel == XLA-twin guarantee is the foundation the
fused sampler's quality records stand on, but the default test suite pins
JAX_PLATFORMS=cpu and skips the 4+ kernel tests.  This driver runs the
accelerator-gated parity files ON CHIP and records the result as a
per-round artifact (PALLAS_PARITY_r05.json), so the guarantee is evidenced
at the current commit rather than by README prose.

    python benchmarks/run_pallas_parity.py [--out PALLAS_PARITY_r05.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

FILES = ["tests/test_fused_parity.py", "tests/test_pallas_parity.py"]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="/root/repo/PALLAS_PARITY_r05.json")
    args = ap.parse_args()

    env = dict(os.environ, LDA_TESTS_KEEP_PLATFORM="1")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", *FILES, "-q", "--no-header"],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=1800,
    )
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout else ""
    m = re.search(r"(\d+) passed", tail)
    passed = int(m.group(1)) if m else 0
    skipped = int((re.search(r"(\d+) skipped", tail) or [0, 0])[1])
    failed = int((re.search(r"(\d+) failed", tail) or [0, 0])[1])

    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd="/root/repo",
        capture_output=True, text=True).stdout.strip()
    try:
        import jax

        device = str(jax.devices()[0])
    except Exception:  # pragma: no cover — record the failure, not crash
        device = "unavailable"

    artifact = {
        "files": FILES,
        "passed": passed,
        "failed": failed,
        "skipped": skipped,
        "exit_code": proc.returncode,
        "summary_line": tail,
        "device": device,
        "commit": commit,
        "wall_s": round(time.time() - t0, 1),
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-2000:] + "\n")
        raise SystemExit(proc.returncode)


if __name__ == "__main__":
    main()
