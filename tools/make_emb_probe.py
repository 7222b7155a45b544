#!/usr/bin/env python
"""Build the reduced-vector sf1 ORACLE probe star (VERDICT r7 #5).

Nine embedding queries' DuckDB oracle legs are O(n²) similarity algebra
(all-pairs cosine, MMR recurrences, unrolled Lloyd/PQ replays); at the
full sf1-equivalent 20k vectors they exceed any per-query oracle budget
— NOT because the Spark side is slow (its sf1 behavior is covered by
the order-up bench) but because the *verification* side is brute force
by design. This tool derives a probe star that keeps every non-vector
table at full sf1-equivalent size and slices `embeddings` to a
deterministic PROBE_VECTORS-row prefix (vec_id order) — 3x the sf0.1
vector count, so the probe still exercises one order of vector growth
while the O(n²) oracle stays ~36M pairs (seconds, not hours).

Usage: python tools/make_emb_probe.py [--src .bench_sf1]
           [--dst .bench_sf1_embprobe] [--vectors 6000]

The slice is a PREFIX by vec_id, so it contains complete replicated
copies of the sf0.1 vector set plus their cross-copy duplicates — the
adversarial duplicate structure the dedup/near-dup queries exist to
handle is preserved, not sampled away.

Output lives inside the repo (gitignored), never under /root/testdata.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents",
)


def main() -> int:
    ap = argparse.ArgumentParser()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap.add_argument("--src", default=os.path.join(repo, ".bench_sf1"))
    ap.add_argument(
        "--dst", default=os.path.join(repo, ".bench_sf1_embprobe")
    )
    ap.add_argument("--vectors", type=int, default=6000)
    args = ap.parse_args()

    # symlink targets are stored verbatim and resolve against the
    # LINK's directory — a relative --src would create dangling links
    args.src = os.path.abspath(args.src)
    args.dst = os.path.abspath(args.dst)
    if not os.path.isdir(args.src):
        print(
            f"source {args.src} missing — run tools/upscale_testdata.py "
            "first",
            file=sys.stderr,
        )
        return 1
    os.makedirs(args.dst, exist_ok=True)
    for t in TABLES:
        link = os.path.join(args.dst, f"{t}.parquet")
        target = os.path.join(args.src, f"{t}.parquet")
        if os.path.islink(link):
            os.unlink(link)
        os.symlink(target, link)

    import duckdb

    src_emb = os.path.join(args.src, "embeddings.parquet")
    if os.path.isdir(src_emb):
        src_emb = os.path.join(src_emb, "*.parquet")
    out = os.path.join(args.dst, "embeddings.parquet")
    # the probe must be a single file (check_oracles handles both, but
    # a file keeps the probe dir trivially rebuildable)
    for stale in glob.glob(out + "/*") if os.path.isdir(out) else []:
        os.unlink(stale)
    if os.path.isdir(out):
        os.rmdir(out)
    duckdb.sql(
        f"COPY (SELECT * FROM '{src_emb}' ORDER BY vec_id"
        f" LIMIT {args.vectors}) TO '{out}' (FORMAT PARQUET)"
    )
    n = duckdb.sql(f"SELECT COUNT(*) FROM '{out}'").fetchone()[0]
    print(f"probe star at {args.dst}: embeddings={n} vectors, "
          f"other tables symlinked to {args.src}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
