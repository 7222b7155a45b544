#!/usr/bin/env python
"""Build the three degenerate-input stars the robustness sweeps use.

- ``.empty_sf``  — every table zero rows (schema from --src)
- ``.one_sf``    — every table exactly one row (first row of the
  single source parquet, so both engines read the identical row)
- ``.degen_sf``  — one-row tables plus a three-document corpus of
  degenerate text: empty string, whitespace-only, single character

Point the cross-engine gate at any of them:

    python tools/check_oracles.py --sf /root/repo/.empty_sf

Round-8 findings these shapes produced: 15 empty-input crashes
(driver-side-model operators), 2 computed-zero-divisor crashes
(one-row), and 4 two-sided semantic edges including 2 latent oracle
bugs (degenerate text) — see SCALE.md. Expected steady state:
empty 220/224 hash-identical (4 documented Spark ROLLUP/CUBE
()-row divergences), one-row 224/224, degenerate 224/224.

Usage: python tools/make_degenerate_stars.py [--src /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracles import TABLES  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Deterministic per-table sort keys: limit(n) without orderBy picks
# whichever file/row-group Spark scans first, so star contents could
# differ across rebuilds on multi-file inputs — breaking the
# hash-snapshot reproducibility of the star sweeps (ADVICE r8 #2).
KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    import pandas as pd
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("degenerate-stars")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    for t in TABLES:
        src = spark.read.parquet(os.path.join(args.src, f"{t}.parquet"))
        src.limit(0).write.mode("overwrite").parquet(
            os.path.join(REPO, ".empty_sf", f"{t}.parquet")
        )
        one = src.orderBy(*KEYS[t]).limit(1).coalesce(1)
        one.write.mode("overwrite").parquet(
            os.path.join(REPO, ".one_sf", f"{t}.parquet")
        )
        if t != "documents":
            one.write.mode("overwrite").parquet(
                os.path.join(REPO, ".degen_sf", f"{t}.parquet")
            )

    rows = spark.read.parquet(
        os.path.join(args.src, "documents.parquet")
    ).orderBy("doc_id").limit(3).collect()
    if len(rows) < 3:
        raise SystemExit(
            f"make_degenerate_stars: --src documents has only {len(rows)} "
            "rows; the degenerate-text star needs 3 distinct doc_ids "
            "(empty / whitespace / single-char)"
        )
    pdf = pd.DataFrame(
        [
            {"doc_id": rows[0]["doc_id"], "text": "",
             "lang": rows[0]["lang"], "source": rows[0]["source"],
             "n_chars": 0},
            {"doc_id": rows[1]["doc_id"], "text": "   ",
             "lang": rows[1]["lang"], "source": rows[1]["source"],
             "n_chars": 3},
            {"doc_id": rows[2]["doc_id"], "text": "x",
             "lang": rows[2]["lang"], "source": rows[2]["source"],
             "n_chars": 1},
        ]
    )
    spark.createDataFrame(pdf).select(
        "doc_id", "text", "lang", "source", F.col("n_chars").cast("long")
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(REPO, ".degen_sf", "documents.parquet")
    )
    print("stars built: .empty_sf .one_sf .degen_sf")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
