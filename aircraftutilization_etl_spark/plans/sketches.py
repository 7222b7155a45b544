"""Approximate sketch aggregates — the 100 TB answer to exact DISTINCT.

Exact COUNT(DISTINCT) is the next per-group memory hazard after exact
percentiles: every group buffers its full key set through the shuffle.
Sketches replace that with fixed-size mergeable state:

- ``approx_count_distinct`` (HyperLogLog++, rsd-tunable) — one-shot
  estimates inside a normal aggregation.
- ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``
  (Apache DataSketches HLL) — sketches as *values*: build once at fine
  grain, re-aggregate to any coarser rollup WITHOUT rescanning the
  facts. That re-aggregability is the property a 100 TB pipeline needs
  (daily sketches persisted, monthly/yearly rollups from sketch unions).

Both are rows-only driver checks: sketch estimates are implementation-
defined, so no cross-engine value oracle exists. Accuracy against exact
distinct counts and partial-aggregation plan shape are pinned by
tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import query, table


@query("q_approx_distinct_orders", None)
def q_approx_distinct_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct estimates per return flag (rows-only check).

    Scale: approx_count_distinct carries a ~kilobyte HLL register array
    per group through the shuffle instead of the full key set — partial
    aggregation map-side, constant memory per group regardless of fact
    count. rsd=0.01 sizes the registers for ~1% standard error.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
            F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@query("q_sketch_reaggregation", None)
def q_sketch_reaggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataSketches HLL built daily, UNIONED to months (rows-only check).

    The two-level shape proves mergeability: the monthly estimate comes
    from ``hll_union_agg`` over the daily sketch binaries — the fact
    table is scanned exactly once, at the fine grain. At 100 TB the
    daily sketch table is what you persist; every coarser rollup
    (month, year, region×month, …) is a cheap union over kilobyte blobs.
    """
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.to_date("o_orderdate").alias("order_day")
    ).agg(F.hll_sketch_agg("o_custkey").alias("cust_sketch"))
    return (
        daily.groupBy(
            F.year("order_day").cast("int").alias("order_year"),
            F.month("order_day").cast("int").alias("order_month"),
        )
        .agg(
            F.hll_sketch_estimate(
                F.hll_union_agg("cust_sketch")
            ).alias("approx_customers"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .orderBy("order_year", "order_month")
    )


@query("q_sketch_overlap", None)
def q_sketch_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-audience OVERLAP between event types from HLL algebra
    (rows-only check): |A ∩ B| ≈ |A| + |B| − |A ∪ B|, the union
    estimated by ``hll_union_agg`` over the two per-type sketches —
    inclusion–exclusion entirely in sketch space.

    The question ("how many users do these two segments share?") is the
    classic two-sided distinct problem that exact COUNT(DISTINCT)
    answers only by re-shuffling both key sets per pair; with persisted
    per-segment sketches every pairwise overlap is a kilobyte-blob
    union. The exact intersection and the signed error ride along so
    the estimate's quality is measured, not assumed (the audit
    discipline of q_cms_user_counts / q_dedup_minhash_estimate).
    """
    e = table(spark, sf_dir, "events")
    pairs = [("click", "purchase"), ("view", "signup"), ("click", "error")]
    sketches = (
        e.groupBy("event_type")
        .agg(
            F.hll_sketch_agg("user_id").alias("sk"),
            F.count_distinct("user_id").alias("nd"),
        )
        .persist()
    )
    out = None
    for a, b in pairs:
        two = sketches.filter(F.col("event_type").isin([a, b]))
        est = two.agg(
            F.lit(a).alias("type_a"),
            F.lit(b).alias("type_b"),
            F.sum("nd").cast("bigint").alias("sum_exact_distinct"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_union"),
        )
        row = est.withColumn(
            "approx_intersection",
            (F.col("sum_exact_distinct") - F.col("approx_union")).cast("bigint"),
        )
        out = row if out is None else out.unionByName(row)
    exact = (
        e.select("event_type", "user_id")
        .distinct()
        .alias("x")
        .join(
            e.select(
                F.col("event_type").alias("type_b"), "user_id"
            ).distinct().alias("y"),
            "user_id",
        )
        .groupBy(F.col("x.event_type").alias("type_a"), "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_intersection"))
    )
    result = (
        out.join(exact, ["type_a", "type_b"], "left")
        .withColumn(
            "err",
            (F.col("approx_intersection") - F.col("exact_intersection")).cast(
                "bigint"
            ),
        )
        .orderBy("type_a", "type_b")
        .localCheckpoint(eager=True)
    )
    sketches.unpersist()
    return result
