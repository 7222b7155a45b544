"""Scale-pattern queries (operators/scale.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.scale import salted_join
from .catalog import query, table


@query(
    "q_skew_salted_join",
    """
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event rollup by customer segment through a SALTED join: the hot
    user ids (a few users own most events) are spread over 8 sub-keys,
    the customer dimension replicated once per salt.

    Result-identical to the plain join — exactly what the oracle checks.
    At 100 TB this is the fallback when one key exceeds what AQE's
    skew-split can rebalance; here it doubles as the correctness proof
    that salting preserves join semantics.
    """
    events = table(spark, sf_dir, "events").withColumnRenamed(
        "user_id", "c_custkey"
    )
    customer = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = salted_join(events, customer, on="c_custkey", n_salts=8)
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("c_mktsegment")
    )
