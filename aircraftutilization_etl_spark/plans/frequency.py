"""Heavy-hitter queries (operators/frequency.py).

The two-pass Misra–Gries plan returns EXACT heavy hitters (the sketch
only generates candidates; a verify pass exact-counts them), so the
oracle is the plain GROUP BY … HAVING formulation — any disagreement
means the candidate union lost a true heavy hitter, i.e. a broken
guarantee, not float noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.frequency import heavy_hitters
from .catalog import query, table

HH_K = 1000  # heavy = frequency > n/1000


@query(
    "q_heavy_hitters_customers",
    f"""
    WITH t AS (SELECT COUNT(*) AS n_total FROM orders)
    SELECT o_custkey AS key,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) * 1000000 // n_total AS BIGINT) AS freq_ppm
    FROM orders, t
    GROUP BY o_custkey, n_total
    HAVING COUNT(*) * {HH_K} > n_total
    ORDER BY key
    """,
)
def q_heavy_hitters_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers placing > 1/1000 of all orders — exact, via the
    Misra–Gries candidate pass + broadcast-semi-join verify pass.

    Scale: the candidate pass shuffles ≤ capacity·partitions summary
    rows instead of every distinct custkey; the verify pass shuffles
    only rows whose key survived the map-side broadcast semi-join. The
    answer is exact (and oracle-hash-checked) because verification
    recounts candidates precisely — the sketch can only over-generate.
    """
    return heavy_hitters(table(spark, sf_dir, "orders"), "o_custkey", HH_K)
