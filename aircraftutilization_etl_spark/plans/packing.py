"""Sequence-packing queries (operators/packing.py).

The oracle replays the greedy fill recurrence with a recursive CTE —
one recursion step per within-bucket rank, all buckets advancing in
parallel — so Spark's per-bucket linear pass and DuckDB must agree on
every document's (bucket, seq_id, offset) placement exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.packing import DEFAULT_CAPACITY, pack_sequences, packing_efficiency
from .catalog import query, table

# shared CTE chain ending in `packed` = (bucket, rn, doc_id, n_tokens,
# seq_id, offset, fill); mirrors pack_sequences exactly
_PACKED_CTES = f"""
    sized AS (
        SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bucket,
               md5(CAST(doc_id AS VARCHAR)) AS ord,
               doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
                   AS n_tokens
        FROM documents
    ),
    ordered AS (
        SELECT bucket, doc_id, n_tokens,
               ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY ord, doc_id)
                   AS rn
        FROM sized
    ),
    packed AS (
        SELECT bucket, rn, doc_id, n_tokens,
               0::BIGINT AS seq_id, 0::BIGINT AS "offset",
               n_tokens AS fill
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.bucket, o.rn, o.doc_id, o.n_tokens,
               CASE WHEN p.fill + o.n_tokens <= {DEFAULT_CAPACITY}
                    THEN p.seq_id ELSE p.seq_id + 1 END,
               CASE WHEN p.fill + o.n_tokens <= {DEFAULT_CAPACITY}
                    THEN p.fill ELSE 0 END,
               CASE WHEN p.fill + o.n_tokens <= {DEFAULT_CAPACITY}
                    THEN p.fill + o.n_tokens ELSE o.n_tokens END
        FROM packed p JOIN ordered o
          ON o.bucket = p.bucket AND o.rn = p.rn + 1
    )
"""


@query(
    "q_pack_sequences",
    f"""
    WITH RECURSIVE {_PACKED_CTES}
    SELECT bucket, seq_id, doc_id, n_tokens, "offset"
    FROM packed
    ORDER BY bucket, seq_id, "offset"
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget packing of the corpus into 256-token training
    sequences: every document's (bucket, seq_id, offset) placement,
    deterministic under any partitioning.

    Scale: one shuffle on the 16-way md5 bucket, then a vectorized
    linear pass per bucket over (id, n_tokens) pairs only — raw text
    never moves. Widen the bucket prefix for more parallelism at larger
    corpora; placement within a bucket is partitioning-independent
    either way.
    """
    return pack_sequences(table(spark, sf_dir, "documents")).select(
        "bucket", "seq_id", "doc_id", "n_tokens", "offset"
    )


@query(
    "q_pack_efficiency",
    f"""
    WITH RECURSIVE {_PACKED_CTES},
    per_seq AS (
        SELECT bucket, seq_id, SUM(n_tokens) AS seq_tokens
        FROM packed GROUP BY bucket, seq_id
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_sequences,
           CAST(SUM(seq_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(seq_tokens) * 1000000
                // (COUNT(*) * {DEFAULT_CAPACITY}) AS BIGINT) AS fill_ppm
    FROM per_seq
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def q_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing audit: sequences produced and exact integer-ppm budget
    utilization per bucket — the dataset-card number that tells a
    training team how much context window the packing wastes.

    Scale: reuses the packing's bucket partitioning; both aggregations
    land on already-bucketed data.
    """
    return packing_efficiency(pack_sequences(table(spark, sf_dir, "documents")))
