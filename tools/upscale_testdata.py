#!/usr/bin/env python
"""Build an sf1-equivalent bench dataset by consistent 10x replication
of the driver's read-only sf0.1 tables (VERDICT r4 #7: "benchmark one
order up").

The driver generates /root/testdata/sf{0.001,0.01,0.1} and nothing
larger, and its directories are read-only — so the order-up dataset is
derived, not regenerated: every fact/dimension row is copied K times
with ALL key columns offset by copy_index * (max_key + 1), which
preserves referential integrity (each copy is a self-contained star),
key-join selectivities, group cardinalities per key, and the value
distributions bench queries aggregate over. TPC-H's fixed tiny
dimensions (region, nation) are left at one copy, as the spec scales
them. Text/embedding corpora replicate with offset ids — duplicate
bodies across copies are REALISTIC for dedup benches (that is what a
crawl looks like) but inflate near-dup pair outputs superlinearly, so
dedup-pair queries are excluded from order-up comparisons in SCALE.md.

Usage: python tools/upscale_testdata.py [--src /root/testdata/sf0.1]
           [--dst .bench_sf1] [--copies 10]

Output lives inside the repo (gitignored), never under /root/testdata.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# key columns to offset per table: (column, family) — same family shares
# one offset so FKs stay aligned across tables
KEYS = {
    "customer": [("c_custkey", "cust")],
    "supplier": [("s_suppkey", "supp")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "order"), ("o_custkey", "cust")],
    "lineitem": [
        ("l_orderkey", "order"),
        ("l_partkey", "part"),
        ("l_suppkey", "supp"),
    ],
    # user_id joins customer.c_custkey in the catalog (q_skew_salted_join
    # et al.), so it must share the "cust" offset family — its own max
    # (1499) is far below custkey's (14999) and a per-column base would
    # land copy k's events inside copy 0's customer range
    "events": [("event_id", "event"), ("user_id", "cust")],
    # vec_id is the same id space as doc_id (q_hybrid_rrf full-outer
    # joins BM25 doc ranks against cosine vec ranks), so embeddings
    # share the documents offset family
    "documents": [("doc_id", "doc")],
    "embeddings": [("vec_id", "doc")],
}
COPY_AS_IS = ("region", "nation")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--dst",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".bench_sf1",
        ),
    )
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from aircraftutilization_etl_spark.session import build_session

    spark = build_session(
        app_name="upscale-testdata",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # one offset base per key family = global max over every column in
    # it — ONE scan per table covering all its key columns at once
    base: dict[str, int] = {}
    for tbl, cols in KEYS.items():
        row = (
            spark.read.parquet(f"{args.src}/{tbl}.parquet")
            .agg(*[F.max(col).alias(col) for col, _fam in cols])
            .collect()[0]
        )
        for col, fam in cols:
            base[fam] = max(base.get(fam, 0), int(row[col]) + 1)
    for fam, b in sorted(base.items()):
        print(f"family {fam}: offset base {b}", file=sys.stderr)

    os.makedirs(args.dst, exist_ok=True)
    copies = F.explode(
        F.sequence(F.lit(0), F.lit(args.copies - 1))
    ).alias("__copy")
    for tbl in COPY_AS_IS:
        spark.read.parquet(f"{args.src}/{tbl}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{args.dst}/{tbl}.parquet")
    for tbl, cols in KEYS.items():
        df = spark.read.parquet(f"{args.src}/{tbl}.parquet")
        out = df.select("*", copies)
        for col, fam in cols:
            out = out.withColumn(
                col, F.col(col) + F.col("__copy") * F.lit(base[fam])
            )
        out.drop("__copy").repartition(32).write.mode("overwrite").parquet(
            f"{args.dst}/{tbl}.parquet"
        )
        print(f"{tbl}: x{args.copies}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
