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

# Pin the join's exchange (explicit hash repartition, which AQE will
# not coalesce) only when the total pair volume Σf² exceeds what one
# task absorbs without becoming a straggler. Below it, the whole join
# output is a few million rows end-to-end and AQE's byte-based
# coalescing (or its broadcast conversion) is strictly cheaper — the
# r10 bench measured the unconditional pin costing ~4x on the LSH
# candidate join whose ENTIRE pair volume was 22k rows. Above it, the
# pin is load-bearing: byte-based coalescing is blind to the pair
# explosion inside the join stage (measured on the 7,500-title probe:
# a ~28M-pair stage coalesced to 2 tasks, a 336 s straggler).
PIN_TOTAL_PAIRS = 4_000_000


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
    work bounded by cap².

    Adaptive physical plan, identical output in all regimes: the sized
    frame (per-row bucket count ``__f`` from ONE window over the key
    partitioning) is persisted — both join sides consume it — and a
    driver O(1) aggregate over it (max f, Σf — the latter IS Σ_buckets
    f², the total pair-meeting volume) picks the strategy the way the
    quota/kmeans operators collect model-sized statistics:

    - max f ≤ cap (the overwhelmingly common case — an honest corpus's
      buckets are tiny): the chunk columns are provably all-zero, so
      they are OMITTED and the join runs on the bare keys, leaving AQE
      free to broadcast or coalesce the few-MB sides.
    - max f > cap: the chunk machinery engages as described.
    - Σf² > PIN_TOTAL_PAIRS (either path): the join exchange is pinned
      with an explicit hash repartition on the join keys, because
      AQE's byte-based coalescing is blind to the pair explosion
      inside the join stage; its skew-split is unnecessary once
      chunking bounds every key group. Below the threshold the whole
      output fits in one comfortable task and the pin would only buy
      scheduling overhead. (If the planner broadcast-converts the join
      instead, dropping the pin, the sides were under the broadcast
      byte threshold — which itself bounds pair volume at
      broadcast_rows × cap, a benign few-seconds stage; the pin's
      target regime, big-bytes sort-merge sides, always retains it.)

    The decision depends only on the data (not on parallelism), and
    every branch emits the same multiset of rows — parallelism
    independence stays pinned by the odd-partitioning sweeps.

    Output: one row per (unordered pair, shared key occurrence) with
    columns (id_a, id_b) plus, for each ``payload`` entry
    ``col: (a_name, b_name)``, that column's value from each side —
    callers count rows per pair (intersection sizes), aggregate payload
    products (dot products), or ``distinct()`` (candidate sets).
    """
    payload = dict(payload or {})
    key_cols = list(key_cols)
    bucket = Window.partitionBy(*key_cols)
    sized = keyed.select(
        F.col(id_col),
        *key_cols,
        *payload,
        F.count(F.lit(1)).over(bucket).alias("__f"),
    ).persist()
    stats = sized.agg(
        F.max("__f").alias("mx"), F.sum("__f").alias("s2")
    ).collect()[0]
    max_f = stats["mx"] or 0
    sum_f2 = stats["s2"] or 0
    pin = sum_f2 > PIN_TOTAL_PAIRS
    n_part = int(
        keyed.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )

    if max_f <= cap and not pin:
        # no chunk columns at all: the join runs on the bare keys, so
        # it can reuse the persisted frame's window partitioning with
        # ZERO additional exchange (or broadcast-convert outright)
        join_keys = key_cols
        a = sized.select(
            F.col(id_col).alias("id_a"),
            *key_cols,
            *[F.col(c).alias(n[0]) for c, n in payload.items()],
        )
        b = sized.select(
            F.col(id_col).alias("id_b"),
            *key_cols,
            *[F.col(c).alias(n[1]) for c, n in payload.items()],
        )
    else:
        # the chunk construction also carries the pin when max f <= cap
        # (all m = 1, chunk columns provably zero): joining on
        # (keys, __ca, __cb) differs from the cached window layout, so
        # the explicit repartition below cannot be elided as redundant
        join_keys = [*key_cols, "__ca", "__cb"]
        m = F.ceil(F.col("__f") / cap).cast("int")
        own = F.pmod(F.xxhash64(F.col(id_col)), m).cast("int")
        chunks = F.sequence(F.lit(0), m - 1)
        a = sized.select(
            F.col(id_col).alias("id_a"),
            *key_cols,
            *[F.col(c).alias(n[0]) for c, n in payload.items()],
            own.alias("__ca"),
            F.explode(chunks).alias("__cb"),
        )
        b = sized.select(
            F.col(id_col).alias("id_b"),
            *key_cols,
            *[F.col(c).alias(n[1]) for c, n in payload.items()],
            own.alias("__cb"),
            F.explode(chunks).alias("__ca"),
        )
    if pin:
        a = a.repartition(n_part, *join_keys)
        b = b.repartition(n_part, *join_keys)
    out_payload = [n for names in payload.values() for n in names]
    return (
        a.join(b, join_keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", *out_payload)
    )
