"""Sequence packing: greedy token-budget binning of documents into
fixed-capacity training sequences.

LLM pretraining consumes fixed-length sequences; feeding one short
document per sequence wastes most of the context window, so pipelines
pack documents back-to-back into a token budget. The assignment must be
DETERMINISTIC (a training run's data order is part of its provenance),
so Spark's nondeterministic partition order can't drive it. Scheme:

1. Route every document to a packing bucket by an md5 prefix of its id
   (16^prefix_len buckets) — stable, partitioning-independent.
2. Within a bucket, order documents by (md5(id), id) — a uniform
   reproducible pseudo-shuffle, the same idiom as operators/sampling.
3. Greedy sequential fill in that order: a document joins the current
   sequence if it fits, else opens the next one. Documents longer than
   the capacity get a sequence of their own (never split, never
   dropped) — truncation is the trainer's policy decision, not the
   packer's.

The fill recurrence is inherently sequential WITHIN a bucket, which is
exactly what ``applyInPandas`` per bucket expresses: one shuffle on the
bucket key, then a vectorized linear pass per group. Parallelism =
bucket count (choose prefix_len so buckets fit comfortably: each group
carries only (id, n_tokens) — 16 bytes/doc, so even 1 B docs over 256
buckets is ~64 MB/group). The per-bucket greedy is embarrassingly
parallel across buckets — the 100 TB plan is scan → project(tokens) →
one shuffle → linear pass, nothing quadratic anywhere.

The DuckDB oracle replays the identical recurrence with a recursive CTE
(one step per within-bucket rank), so sequence ids and offsets must
match row for row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import token_count_expr

DEFAULT_CAPACITY = 256


def pack_sequences(
    df: DataFrame,
    capacity: int = DEFAULT_CAPACITY,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_prefix_len: int = 1,
) -> DataFrame:
    """Assign every document to (bucket, seq_id, offset) under a greedy
    token-budget packing; returns one row per document.

    Output: ``bucket`` (md5-prefix hex, 16^prefix_len values), ``seq_id``
    (sequence ordinal within the bucket), ``doc_id``, ``n_tokens``
    (whitespace tokens), ``offset`` (token start within the sequence).
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    md5 = F.md5(F.col(id_col).cast("string"))
    sized = df.select(
        F.substring(md5, 1, bucket_prefix_len).alias("bucket"),
        md5.alias("__order"),
        F.col(id_col),
        token_count_expr(text_col).cast("long").alias("n_tokens"),
    )

    out_schema = (
        f"bucket string, seq_id long, {id_col} long, "
        "n_tokens long, offset long"
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__order", id_col], kind="mergesort")
        seq_ids, offsets = [], []
        seq_id, fill = 0, 0
        for tok in pdf["n_tokens"]:
            if fill > 0 and fill + tok > capacity:
                seq_id += 1
                fill = 0
            seq_ids.append(seq_id)
            offsets.append(fill)
            fill += tok
        return pd.DataFrame(
            {
                "bucket": pdf["bucket"],
                "seq_id": seq_ids,
                id_col: pdf[id_col],
                "n_tokens": pdf["n_tokens"],
                "offset": offsets,
            }
        )

    return sized.groupBy("bucket").applyInPandas(_pack, out_schema)


def packing_efficiency(
    packed: DataFrame, capacity: int = DEFAULT_CAPACITY
) -> DataFrame:
    """Per-bucket packing audit: sequences produced, mean fill ppm.

    ``fill_ppm`` uses integer arithmetic (total tokens vs total budget
    of the bucket's sequences) so the ratio is exact and tie-free.
    """
    per_seq = packed.groupBy("bucket", "seq_id").agg(
        F.sum("n_tokens").alias("seq_tokens")
    )
    return per_seq.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_sequences"),
        F.sum("seq_tokens").alias("n_tokens"),
        F.expr(
            f"CAST((SUM(seq_tokens) * 1000000) DIV (COUNT(1) * {capacity}) "
            "AS BIGINT)"
        ).alias("fill_ppm"),
    )
