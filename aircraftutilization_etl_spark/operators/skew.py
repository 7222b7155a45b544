"""Zipf-head skew guards shared across pair-generating operators.

Any equi-self-join on a raw text-derived key (shingle, q-gram, band
key, term) has a Zipf head at 100 TB: one hot key's entire f² pair
block lands in a single join task. ``chunked_self_pairs`` bounds the
per-task block at ~cap² with OUTPUT IDENTICAL to the plain self-join —
the guard every such join in this engine routes through (SCALE.md
round-10 Zipf-skew audit table names the per-site bounds).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunked_self_pairs(
    keyed: DataFrame,
    key_cols: Sequence[str],
    id_col: str,
    cap: int,
    payload: Mapping[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Skew-bounded self-join: every unordered pair of rows sharing the
    ``key_cols`` value meets EXACTLY once, with no join task group ever
    holding more than ~``cap``² pairs.

    Members of each key bucket hash into m = ceil(f / cap) chunks; side
    A replicates each member across its ROW of chunk pairs, side B
    across its COLUMN, so pair (a, b) meets exactly at
    (chunk(a), chunk(b)) — output identical to the plain self-join
    (certified per consumer by the unchanged DuckDB oracles), per-task
    work bounded by cap². Normal buckets have m = 1, where the chunk
    machinery degenerates to the plain bucket join (no replication).

    Output: one row per (unordered pair, shared key occurrence) with
    columns (id_a, id_b) plus, for each ``payload`` entry
    ``col: (a_name, b_name)``, that column's value from each side —
    callers count rows per pair (intersection sizes), aggregate payload
    products (dot products), or ``distinct()`` (candidate sets). The
    sized frame is persisted: both join sides consume it, and the
    bucket sizes come from ONE window count over the key partitioning
    the join shuffle needs anyway.
    """
    payload = dict(payload or {})
    key_cols = list(key_cols)
    join_keys = [*key_cols, "__ca", "__cb"]
    bucket = Window.partitionBy(*key_cols)
    sized = keyed.select(
        F.col(id_col),
        *key_cols,
        *payload,
        F.ceil(F.count(F.lit(1)).over(bucket) / cap).cast("int").alias("__m"),
    ).persist()
    own = F.pmod(F.xxhash64(F.col(id_col)), F.col("__m")).cast("int")
    chunks = F.sequence(F.lit(0), F.col("__m") - 1)
    # Pin the join exchange with an EXPLICIT hash repartition on the
    # join keys: the shuffle INPUT here is byte-small (ids + keys, the
    # strings/payloads of a few-MB side), so AQE's byte-based
    # coalescing would merge the join stage into 1-2 partitions — blind
    # to the pair EXPLOSION that happens inside the stage (measured on
    # the 7,500-title probe: the whole ~28M-pair fallback ran in 2
    # tasks, a 336 s straggler). An explicit count disables coalescing
    # for exactly this exchange; AQE's skew-split is not needed here
    # because the chunking already bounds every key group at ~cap².
    n_part = int(
        keyed.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    a = sized.select(
        F.col(id_col).alias("id_a"),
        *key_cols,
        *[F.col(c).alias(names[0]) for c, names in payload.items()],
        own.alias("__ca"),
        F.explode(chunks).alias("__cb"),
    ).repartition(n_part, *join_keys)
    b = sized.select(
        F.col(id_col).alias("id_b"),
        *key_cols,
        *[F.col(c).alias(names[1]) for c, names in payload.items()],
        own.alias("__cb"),
        F.explode(chunks).alias("__ca"),
    ).repartition(n_part, *join_keys)
    out_payload = [n for names in payload.values() for n in names]
    return (
        a.join(b, join_keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", *out_payload)
    )
