"""Heavy-hitter queries (operators/frequency.py).

The two-pass Misra–Gries plan returns EXACT heavy hitters (the sketch
only generates candidates; a verify pass exact-counts them), so the
oracle is the plain GROUP BY … HAVING formulation — any disagreement
means the candidate union lost a true heavy hitter, i.e. a broken
guarantee, not float noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


_CMS_HASH = (
    "CAST(CAST('0x' || substr(md5('cms' || d.i || ':' || user_id), 1, 8)"
    " AS BIGINT) % 256 AS BIGINT)"
)


@query(
    "q_cms_user_counts",
    f"""
    WITH cells AS (
        SELECT d.i AS depth, {_CMS_HASH} AS col
        FROM events, (SELECT unnest(range(0, 4)) AS i) d),
    sketch AS (SELECT depth, col, COUNT(*) AS cnt FROM cells GROUP BY 1, 2),
    exact AS (SELECT user_id, COUNT(*) AS exact_n FROM events GROUP BY 1),
    probes AS (
        SELECT user_id, d.i AS depth, {_CMS_HASH} AS col
        FROM exact, (SELECT unnest(range(0, 4)) AS i) d),
    est AS (
        SELECT p.user_id, MIN(COALESCE(s.cnt, 0)) AS cms_n
        FROM probes p LEFT JOIN sketch s USING (depth, col)
        GROUP BY 1)
    SELECT e.user_id, CAST(e.exact_n AS BIGINT) AS exact_n,
           CAST(est.cms_n AS BIGINT) AS cms_n,
           CAST(est.cms_n - e.exact_n AS BIGINT) AS over_n
    FROM exact e JOIN est USING (user_id)
    ORDER BY user_id
    """,
)
def q_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch point-frequency audit: per-user event counts
    estimated from a 4×256-cell CMS, side by side with the exact
    counts — ``over_n`` is the sketch's (always non-negative)
    collision overestimate, measured not assumed.

    The bounded-size companion to heavy_hitters: at 100 TB the sketch
    is the only per-key frequency summary whose state does not grow
    with the key cardinality (depth×width cells vs one counter per
    distinct key), and two stream slices' sketches merge by cell-wise
    addition. Integer-exact construction (md5-prefix hashes, integer
    mod), so the whole estimate replays in the SQL oracle.
    """
    from ..operators.frequency import count_min_build, count_min_estimate

    e = table(spark, sf_dir, "events")
    sketch = count_min_build(e, "user_id")
    exact = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    est = count_min_estimate(sketch, exact.select("user_id"), "user_id")
    return (
        exact.join(est, "user_id")
        .select(
            "user_id",
            F.col("exact_n").cast("bigint").alias("exact_n"),
            F.col("cms_n").cast("bigint").alias("cms_n"),
            (F.col("cms_n") - F.col("exact_n")).cast("bigint").alias("over_n"),
        )
    )
