"""TPC-H additions landed after the original relational_tpch module.

A separate file on purpose: the verification-priority ordering hashes
every query against its defining module's file sha, so appending to
relational_tpch.py would float all 18 of its driver-verified queries
for re-verification (VERDICT r8 #1 asked for exactly this restraint).
New TPC-H members land here; the module may grow in later rounds at
the cost of floating only its own members.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import query, table

# Q4's one-quarter window, centered in the synthetic orders range
# (1995-01 .. 2001-08); the classic spec uses 1993-07.
_Q4_START = "1996-07-01 00:00:00"
_Q4_END = "1996-10-01 00:00:00"
# Stand-in for the reduced schema (TESTDATA.md ships no
# l_commitdate/l_receiptdate): a "late" line is one shipped more than
# 90 days after its order date — the same exists-a-delinquent-line
# shape as spec Q4's l_commitdate < l_receiptdate.
_LATE_DAYS = 90


@query(
    "q4_order_priority",
    f"""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '{_Q4_START}'
      AND o_orderdate < TIMESTAMP '{_Q4_END}'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate
                                     + INTERVAL {_LATE_DAYS} DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: order-priority checking — orders in one quarter having
    at least one late line, counted by priority.

    Shape: correlated EXISTS against the fact table with a date-window
    predicate — the one §2.8 subquery variant the catalog lacked
    (VERDICT r8 #2). The correlation carries an OUTER column into the
    inner predicate (l_shipdate > o_orderdate + 90 days), which is the
    part plain IN/semi-on-key doesn't exercise.

    Scale: the quarter filter on orders is a pushed-down scan
    predicate (one quarter of seven years ≈ 3-4% of the table), and
    EXISTS lowers to ONE left-semi hash join on l_orderkey whose
    non-equi correlation rides along as the join's residual condition —
    no aggregation or distinct on lineitem first, and the semi join
    emits each qualifying order once regardless of how many late lines
    it has. Both sides are column-pruned to (key, date). The final
    5-row aggregate is a map-side partial over the already-tiny semi
    output.
    """
    o = (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit(_Q4_START).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(_Q4_END).cast("timestamp"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (
            li.l_shipdate
            > o.o_orderdate + F.expr(f"INTERVAL {_LATE_DAYS} DAY")
        ),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )
