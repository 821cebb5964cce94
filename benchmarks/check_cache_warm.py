"""Guard: the repo-shipped compile cache covers the product configs.

Round-3 PARITY walls contained 640 s / 924 s outliers — stale-cache
refactors silently regressing cold users to multi-minute compiles.  This
script re-runs every configuration `benchmarks/prewarm.py` warms, through
the NORMAL runtime cache path (two-tier: shipped cache copy-seeded into
~/.cache — exactly what a fresh user hits), and fails if any wall
exceeds its threshold.

Run on the real chip after prewarm / before shipping a refactor:

    python benchmarks/check_cache_warm.py

Prints one JSON line per config and a final summary line; exit code 1 if
any config exceeded its threshold.  Thresholds are generous (the
tunnelled backend loads cached executables at ~10 s each and stalls
occasionally); a cold compile blows through them by minutes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from prewarm import CONFIGS  # noqa: E402

# wall thresholds (s) per prewarm config, same order.  Cascade's budget
# reflects the round-5 root-schedule default (root trains at (16; 4) at
# the reference (4; 2) config — PARITY.md round-5 cascade section): the
# warm wall is ~170 s of real training, not compile.
THRESHOLDS = [90, 150, 60, 250, 90, 180, 150, 90]


def main() -> None:
    env = dict(os.environ)
    env.pop("LDA_CACHE_DIR", None)  # the user path: two-tier runtime cache
    failed = 0
    for cmd, limit in zip(CONFIGS, THRESHOLDS):
        t0 = time.time()
        r = subprocess.run(cmd, cwd="/root/repo", capture_output=True,
                           text=True, env=env)
        wall = time.time() - t0
        ok = r.returncode == 0 and wall <= limit
        failed += not ok
        print(json.dumps({
            "config": " ".join(cmd[2:10]),
            "wall_s": round(wall, 1),
            "limit_s": limit,
            "rc": r.returncode,
            "ok": ok,
        }), flush=True)
    print(json.dumps({"cache_warm": failed == 0, "failed": failed,
                      "n_configs": len(CONFIGS)}))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
