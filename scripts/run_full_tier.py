#!/usr/bin/env python
"""Process-isolated full test tier (VERDICT r4 weak #2).

The full `-m "slow or not slow"` tier is a ~50-minute single process; an
XLA CPU compile segfault at 98% (observed once, round 4) loses the whole
run's signal. This driver splits the tier into one pytest process per
GROUP — the long e2e files isolated individually, everything else in one
batch — so a crash localizes to its group and the rest of the signal
survives. Exit code is nonzero if ANY group fails; per-group tails are
printed and the summary recorded to --out.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# long e2e files that deserve their own process
ISOLATED = [
    "tests/test_trainer_e2e.py",
    "tests/test_full_pipeline.py",
    "tests/test_quality_trajectory.py",
    "tests/test_stage1_loop.py",
    "tests/test_parallel.py",
]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=None, help="write a JSON summary")
    ap.add_argument("-m", "--marker", default="slow or not slow")
    args = ap.parse_args(argv)

    groups = [[p] for p in ISOLATED if os.path.exists(
        os.path.join(REPO, p))]
    rest = ["tests/", *sum((["--ignore", p] for p in ISOLATED
                            if os.path.exists(os.path.join(REPO, p))), [])]
    groups.append(rest)

    results = []
    ok = True
    for g in groups:
        name = g[0] if len(g) == 1 else "tests/ (rest)"
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-m", args.marker,
             "-p", "no:cacheprovider", *g],
            cwd=REPO, capture_output=True, text=True)
        dt = time.time() - t0
        tail = "\n".join(proc.stdout.strip().splitlines()[-2:])
        crashed = proc.returncode not in (0, 1, 5)
        results.append({"group": name, "rc": proc.returncode,
                        "seconds": round(dt, 1), "tail": tail,
                        "crashed": crashed})
        status = ("CRASH" if crashed else
                  "ok" if proc.returncode in (0, 5) else "FAIL")
        print(f"[{status}] {name} rc={proc.returncode} {dt:.0f}s :: {tail}",
              flush=True)
        ok &= proc.returncode in (0, 5)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"ok": ok, "groups": results}, f, indent=1)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
