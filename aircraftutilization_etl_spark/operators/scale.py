"""Scale patterns: salted skew joins and bucketed co-located joins.

These are the two levers SURVEY.md §4.3 and the 100 TB design brief call
out beyond what AQE gives for free:

- **Salting** defeats hot-key skew that AQE's skew-join splitting can't
  fully fix (a single key's rows must still meet a single copy of the
  build row per split). The salted join spreads each hot key over
  ``n_salts`` sub-keys and replicates the small side once per salt —
  result-identical to the plain join, verified by oracle.
- **Bucketing** pre-shuffles fact tables at write time: two tables
  bucketed on the same key with the same bucket count join with ZERO
  exchanges at read time — the shuffle is paid once at ingest, amortized
  over every downstream join (the Spark answer to the co-located-join
  requirement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side's hot keys spread over ``n_salts``
    sub-keys.

    The skewed side gets a deterministic content-derived salt; the small
    side is replicated once per salt value (explode of a literal range —
    ``n_salts``× a small table, still broadcastable). Joining on
    (key, salt) splits every hot key's rows across ``n_salts`` tasks.

    Result set is exactly the plain join's ONLY for join types where the
    replicated (small) side never contributes unmatched rows: inner,
    left outer, left semi, left anti. For right/full outer an unmatched
    small-side row would survive once per salt replica (``n_salts``
    copies), so those types are rejected.
    """
    allowed = {
        "inner", "left", "left_outer", "leftouter",
        "semi", "left_semi", "leftsemi",
        "anti", "left_anti", "leftanti",
    }
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not preserve '{how}' semantics: the small "
            "side is replicated per salt, so unmatched small-side rows "
            "would be emitted n_salts times. Use inner/left/semi/anti."
        )
    salt = F.pmod(F.xxhash64(*skewed.columns), F.lit(n_salts)).cast("int")
    left = skewed.withColumn("__salt", salt)
    right = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")),
    )
    joined = left.join(right, on=[on, "__salt"], how=how)
    return joined.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) table — the one-time
    shuffle that co-locates every future join/agg on ``bucket_col``."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables — with matching bucketing the plan
    contains no Exchange (verified by tests/test_scale.py).

    The merge hint pins the sort-merge strategy bucketing feeds: for a
    small table the planner would pick broadcast and skip the bucketed
    scan ("Bucketed: false"), hiding exactly the property this operator
    exists to exploit at fact-table scale.
    """
    return spark.table(left_table).hint("merge").join(
        spark.table(right_table), on=on
    )
