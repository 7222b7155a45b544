"""Single-pass column profiler — the dataset-card statistics operator.

``profile_columns`` computes per-column row count, null count, distinct
count, and min/max in ONE scan of the table: every column's aggregates
ride the same hash-aggregate, and the per-column rows are produced by
exploding an array of structs driver-side-free. The alternative — one
query per column — rescans the table |columns| times, which at 100 TB is
the difference between one pass and a day of passes.

Distinct counts: ``exact=True`` uses COUNT(DISTINCT ...), which Spark
plans as an Expand (row multiplication by |columns|) — correct, and what
the DuckDB oracle can replay, but the multiplication is a real cost at
scale. ``exact=False`` switches to HyperLogLog++
(``approx_count_distinct``), collapsing the Expand back to a single
pass; same output shape, rows-only checkable. This mirrors the
percentile discipline (exact for the oracle, sketch for the 100 TB
path).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: Sequence[str], exact: bool = True
) -> DataFrame:
    """One row per profiled column: (col_name, n_rows, n_nulls,
    n_distinct, min_value, max_value); min/max are computed in the
    column's native type and cast to string only at the edge (so numeric
    columns order numerically, not lexically)."""
    if not cols:
        raise ValueError("profile_columns needs at least one column")
    distinct = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact
        else (lambda c: F.approx_count_distinct(c))
    )
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(c).isNull().cast("long")).alias("n_nulls"),
            distinct(c).alias("n_distinct"),
            F.min(F.col(c)).cast("string").alias("min_value"),
            F.max(F.col(c)).cast("string").alias("max_value"),
        )
        for c in cols
    ]
    return (
        df.agg(F.array(*structs).alias("p"))
        .select(F.explode("p").alias("p"))
        .select("p.*")
    )
