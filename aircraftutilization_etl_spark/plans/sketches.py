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
