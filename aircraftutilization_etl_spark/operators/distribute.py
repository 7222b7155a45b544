"""Scan-parallelism guard for compute-heavy per-row projections.

A small parquet file scans as ONE task, so any expensive per-row work
planned directly over the scan — interpreted higher-order-function
folds, Arrow/pandas kernels, per-word hashing — serializes on a single
core no matter how many the cluster has (measured r11: 0.7-1.4 s
single-task stages across the text/embedding families at bench scale).
``ensure_scan_parallelism`` spreads the raw rows first, moving the
bytes at their smallest (guide §2.3/§8: shuffle the lightweight form,
compute after); at real corpus scale the scan already carries
>= defaultParallelism splits and this is a no-op.

The explicit partition count matters: without one, AQE's byte-based
coalescing folds a sub-MB exchange back to one partition — it cannot
see per-row CPU cost (the same blindness the edit-distance pair join
and the stream fold pin against).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ensure_scan_parallelism(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """Repartition to defaultParallelism when the plan is
    under-partitioned; hash on ``key_col`` when given (deterministic,
    and downstream id-keyed aggregations can reuse the partitioning),
    round-robin otherwise."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        if key_col is not None:
            return df.repartition(target, F.col(key_col))
        return df.repartition(target)
    return df
