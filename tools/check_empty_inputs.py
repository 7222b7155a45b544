#!/usr/bin/env python
"""Empty-input robustness sweep: every catalog query on zero-row tables.

At 100 TB the empty case is not an edge case — a date filter that
matches nothing, a tenant with no rows, a partition pruned to zero
files. Every query must (a) build and execute its plan without
raising, and (b) keep the SAME output schema it has on populated data
(a downstream consumer's schema contract must not depend on the data).
Driver-side iterative operators (k-means, GD, PageRank) are the risky
class: a `.first()`/`collect()` on an empty model can return None into
arithmetic, or a seeded sample can fail on an empty frame.

Usage: python tools/check_empty_inputs.py [--schema-from DIR]
       [--only name1,name2] [-v]

Writes nothing; exits non-zero on any failure. The zero-row tables are
materialized once into a temp dir by reading each source table's
schema and writing `limit(0)` parquet.

For the stronger CROSS-ENGINE check, point the oracle gate at a
zero-row table directory (tools/check_oracles.py --sf <empty dir>):
the round-8 sweep ran 224/224 that way — 220 hash-identical to DuckDB
on empty inputs; the 4 divergent are all one ENGINE-semantics class
(Spark's Expand-based ROLLUP/CUBE/GROUPING SETS emits no () grand-
total row over zero input rows, DuckDB follows ANSI and emits one —
verified on bare `GROUP BY ROLLUP` SQL against both engines, not a
plan artifact; q_rollup_revenue, q_cube_order_priority,
q_grouping_sets_revenue, q_pack_length_buckets). Left native: those
plans are single-pass Expand aggregations, and grafting the () row in
would add a second pass over the fact table to fix a zero-row edge.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracles import TABLES  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Populated-schema cache keyed by each query's DEEP content hash —
# building a populated plan just to read .schema executes the
# driver-side collects (k-means seeds, PQ training) of every model
# query, which dominated the sweep's runtime (ADVICE r8 #4). The deep
# hash key self-invalidates on any plan/operator/oracle edit, and a
# data fingerprint of the --schema-from parquet (mtime+size per table)
# self-invalidates on testdata regeneration (ADVICE r9).
SCHEMA_CACHE = os.path.join(REPO, ".schema_cache.json")


def _data_fingerprint(schema_from: str) -> str:
    """Cheap fingerprint of the populated tables backing the cached
    schemas: per-table mtime_ns+size (recursed for directory-shaped
    parquet). Regenerated testdata with a different schema would
    otherwise validate against a stale cached populated schema."""
    import hashlib

    parts: list[str] = []
    for t in TABLES:
        p = os.path.join(schema_from, f"{t}.parquet")
        try:
            if os.path.isdir(p):
                for root, _, files in sorted(os.walk(p)):
                    for f in sorted(files):
                        st = os.stat(os.path.join(root, f))
                        parts.append(f"{t}/{f}:{st.st_mtime_ns}:{st.st_size}")
            else:
                st = os.stat(p)
                parts.append(f"{t}:{st.st_mtime_ns}:{st.st_size}")
        except OSError:
            parts.append(f"{t}:missing")
    return hashlib.sha256("\n".join(parts).encode("utf-8")).hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--schema-from",
        default="/root/testdata/sf0.001",
        help="populated tables whose schemas define the empty twins "
        "(and whose query output schemas are the contract)",
    )
    ap.add_argument("--only", default=None)
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()

    if not os.path.isdir(args.schema_from):
        print(
            f"check_empty_inputs: schema source dir {args.schema_from!r} "
            "does not exist — pass --schema-from pointing at a populated "
            "sf directory (the empty twins take their schemas from it)",
            file=sys.stderr,
        )
        return 2

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .appName("empty-input-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    cache: dict[str, list] = {}
    try:
        with open(SCHEMA_CACHE, encoding="utf-8") as fh:
            loaded = json.load(fh)
        if isinstance(loaded, dict):
            cache = loaded
    except (OSError, ValueError):
        pass
    cache_dirty = False

    empty_dir = tempfile.mkdtemp(prefix="empty_sf_")
    try:
        for t in TABLES:
            src = os.path.join(args.schema_from, f"{t}.parquet")
            spark.read.parquet(src).limit(0).write.mode("overwrite").parquet(
                os.path.join(empty_dir, f"{t}.parquet")
            )

        qs = entry_mod.queries()
        data_fp = _data_fingerprint(args.schema_from)
        only = set(args.only.split(",")) if args.only else None
        n_pass = n_fail = 0
        failures: list[str] = []
        for name, fn in qs.items():
            if only and name not in only:
                continue
            t0 = time.time()
            try:
                key = (
                    f"{name}:{data_fp}:"
                    f"{entry_mod._deep_hash(name)}"  # noqa: SLF001
                )
                if key in cache:
                    full_schema = [tuple(f) for f in cache[key]]
                else:
                    full_schema = [
                        (f.name, f.dataType.simpleString())
                        for f in fn(spark, args.schema_from).schema.fields
                    ]
                    cache[key] = [list(f) for f in full_schema]
                    cache_dirty = True
                df = fn(spark, empty_dir)
                rows = df.collect()
                empty_schema = [
                    (f.name, f.dataType.simpleString())
                    for f in df.schema.fields
                ]
            except Exception:
                n_fail += 1
                failures.append(name)
                print(f"FAIL {name}: raised on empty input")
                if args.verbose:
                    traceback.print_exc()
                continue
            if empty_schema != full_schema:
                n_fail += 1
                failures.append(name)
                print(
                    f"FAIL {name}: schema drift on empty input\n"
                    f"  populated: {full_schema}\n  empty:     {empty_schema}"
                )
                continue
            n_pass += 1
            if args.verbose:
                print(
                    f"ok   {name}: {len(rows)} rows on empty "
                    f"({time.time() - t0:.1f}s)"
                )
    finally:
        shutil.rmtree(empty_dir, ignore_errors=True)
    if cache_dirty:
        try:
            # drop entries whose (name, deep hash) no longer matches a
            # current query so the cache cannot grow without bound —
            # but IGNORE the middle (data-fingerprint) segment, so
            # alternating between two schema dirs keeps both dirs'
            # still-valid entries instead of thrashing (ADVICE r9)
            live = {
                (n, entry_mod._deep_hash(n))  # noqa: SLF001
                for n in qs
            }
            cache = {
                k: v
                for k, v in cache.items()
                if k.count(":") >= 2
                and (k.split(":", 1)[0], k.rsplit(":", 1)[1]) in live
            }
            with open(SCHEMA_CACHE, "w", encoding="utf-8") as fh:
                json.dump(cache, fh)
        except OSError:
            pass
    print(f"\n{n_pass} ok, {n_fail} FAILED on empty inputs")
    if failures:
        print("failed:", ",".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
