#!/usr/bin/env python
"""Record the catalog's content hashes for the upcoming snapshot round.

Part of the pre-snapshot gate (with check_oracles.py and the plan-
invariants sweep): writes QUERY_HASHES.json's ``rounds[N]`` map —
name -> {"plan": sha256(plan source + oracle SQL), "deep": that plus
the file shas of every delegated non-plans package module} — so that
when the driver's CORRECTNESS_r{N}.json lands,
``__spark_entry__._catalog_order`` can tell whether a green row vouches
for the CURRENT code (deep hash unchanged since the snapshot the driver
ran) or the query must float for re-verification (plan/oracle/operator
edited since). Rounds <= 6 recorded bare plan-hash strings and retire
against those.

Usage: python tools/snapshot_query_hashes.py [--round N]
Default round = (max round with a CORRECTNESS file) + 1, i.e. the round
whose snapshot is about to be graded.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def infer_round() -> int:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return (max(rounds) + 1) if rounds else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None)
    args = ap.parse_args()
    rnd = args.round if args.round is not None else infer_round()

    import __spark_entry__ as entry_mod
    from aircraftutilization_etl_spark.plans import CATALOG

    # Dual-form entries from round 7 on: "plan" is the legacy
    # plan-source+oracle hash (kept for human diffing across rounds);
    # "deep" — the retirement identity _catalog_order compares — adds
    # the file shas of every non-plans module the plan's defining
    # module transitively imports, closing the operator-delegation hole
    # (ADVICE r6 medium). Rounds <= 6 keep their recorded bare strings
    # and retire against the legacy hash.
    hashes = {
        name: {
            "plan": entry_mod._content_hash(name),
            "deep": entry_mod._deep_hash(name),
        }
        for name in sorted(CATALOG)
    }

    path = os.path.join(REPO, "QUERY_HASHES.json")
    payload: dict = {"rounds": {}}
    if os.path.exists(path):
        try:
            with open(path, encoding="utf-8") as fh:
                existing = json.load(fh)
            if isinstance(existing, dict) and isinstance(
                existing.get("rounds"), dict
            ):
                payload = existing
        except (OSError, ValueError):
            pass
    payload["rounds"][str(rnd)] = hashes
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"{path}: round {rnd}, {len(hashes)} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
