#!/usr/bin/env python
"""Build the reduced-documents sf1 ORACLE probe star (VERDICT r8 #8).

q_dedup_edit_distance's DuckDB oracle leg is an all-pairs Levenshtein
over document title prefixes — O(n²) by design (the brute force is
what proves the Spark side's q-gram prefilter loses no true pair). At
the full sf1-equivalent 50k documents that single verify leg runs
>1 h (SCALE.md), the last heavy full-sf1 oracle leg standing. Like the
embeddings probe (tools/make_emb_probe.py), this derives a star that
keeps every other table at full sf1-equivalent size and slices
`documents` to a deterministic PROBE_DOCS-row prefix (doc_id order) —
1.5x the sf0.1 document count, so the probe still exercises an
order-up in document volume while the O(n²) oracle stays ~28M pairs
(minutes, not hours).

The slice is a PREFIX by doc_id, so it contains the complete
replicated sf0.1 document set plus a partial second copy — cross-copy
duplicate pairs (the adversarial structure dedup queries exist to
find) are preserved, not sampled away.

Usage: python tools/make_doc_probe.py [--src .bench_sf1]
           [--dst .bench_sf1_docprobe] [--documents 7500]

Then: python tools/check_oracles.py --sf .bench_sf1_docprobe \
          --only q_dedup_edit_distance

Output lives inside the repo (gitignored), never under /root/testdata.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "embeddings",
)


def main() -> int:
    ap = argparse.ArgumentParser()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap.add_argument("--src", default=os.path.join(repo, ".bench_sf1"))
    ap.add_argument(
        "--dst", default=os.path.join(repo, ".bench_sf1_docprobe")
    )
    ap.add_argument("--documents", type=int, default=7500)
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
        # a prior run may have left a regular file or a directory here
        # (e.g. a copy instead of a symlink) — replace it, don't
        # traceback on FileExistsError (ADVICE r9)
        if os.path.islink(link) or os.path.isfile(link):
            os.unlink(link)
        elif os.path.isdir(link):
            shutil.rmtree(link)
        os.symlink(target, link)

    import duckdb

    src_doc = os.path.join(args.src, "documents.parquet")
    if os.path.isdir(src_doc):
        src_doc = os.path.join(src_doc, "*.parquet")
    out = os.path.join(args.dst, "documents.parquet")
    # the probe must be a single file (check_oracles handles both, but
    # a file keeps the probe dir trivially rebuildable); clear any
    # stale output whatever its shape — file, symlink, or (possibly
    # nested) directory (ADVICE r9)
    if os.path.islink(out) or os.path.isfile(out):
        os.unlink(out)
    elif os.path.isdir(out):
        shutil.rmtree(out)
    duckdb.sql(
        f"COPY (SELECT * FROM '{src_doc}' ORDER BY doc_id"
        f" LIMIT {args.documents}) TO '{out}' (FORMAT PARQUET)"
    )
    n = duckdb.sql(f"SELECT COUNT(*) FROM '{out}'").fetchone()[0]
    print(f"probe star at {args.dst}: documents={n} rows, "
          f"other tables symlinked to {args.src}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
