#!/usr/bin/env python
"""Pre-snapshot gate: the checks every round must pass before snapshot.

Runs, in order, failing fast:
1. the plan-invariants sweep (tests/test_plan_invariants.py — bans
   row-at-a-time Python nodes, unpruned fact scans, -0.0-unsafe rounds
   across EVERY catalog query's executed plan);
2. the full catalog oracle gate (tools/check_oracles.py) at --sf;
3. the empty-input sweep (tools/check_empty_inputs.py — every query on
   zero-row tables: no exception, populated-identical schema);
4. the content-hash snapshot (tools/snapshot_query_hashes.py) that lets
   the verification-priority ordering tie the driver's next
   CORRECTNESS round to the exact code it graded.

Usage: python tools/round_gate.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(label: str, cmd: list[str]) -> None:
    print(f"\n=== {label}: {' '.join(cmd)}", flush=True)
    proc = subprocess.run(cmd, cwd=REPO)
    if proc.returncode != 0:
        print(f"GATE FAILED at: {label}", file=sys.stderr)
        raise SystemExit(proc.returncode)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--skip-snapshot",
        action="store_true",
        help="run the checks only (mid-round); omit the hash snapshot",
    )
    args = ap.parse_args()
    py = sys.executable
    run(
        "plan invariants",
        [py, "-m", "pytest", "tests/test_plan_invariants.py", "-q"],
    )
    run("oracle gate", [py, "tools/check_oracles.py", "--sf", args.sf])
    # zero-row inputs are routine at 100 TB (pruned partitions, filters
    # matching nothing); the r8 first run of this sweep found 15
    # operator crashes — keep it in the gate so the class stays closed
    run("empty-input sweep", [py, "tools/check_empty_inputs.py"])
    if not args.skip_snapshot:
        run("hash snapshot", [py, "tools/snapshot_query_hashes.py"])
    print("\nround gate: ALL GREEN")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
