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
import os
import sys
import tempfile
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracles import TABLES  # noqa: E402


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

    empty_dir = tempfile.mkdtemp(prefix="empty_sf_")
    for t in TABLES:
        src = os.path.join(args.schema_from, f"{t}.parquet")
        spark.read.parquet(src).limit(0).write.mode("overwrite").parquet(
            os.path.join(empty_dir, f"{t}.parquet")
        )

    qs = entry_mod.queries()
    only = set(args.only.split(",")) if args.only else None
    n_pass = n_fail = 0
    failures: list[str] = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            full_schema = [
                (f.name, f.dataType.simpleString())
                for f in fn(spark, args.schema_from).schema.fields
            ]
            df = fn(spark, empty_dir)
            rows = df.collect()
            empty_schema = [
                (f.name, f.dataType.simpleString()) for f in df.schema.fields
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
    print(f"\n{n_pass} ok, {n_fail} FAILED on empty inputs")
    if failures:
        print("failed:", ",".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
