"""Content-defined chunking queries (operators/chunking.py).

The oracle replays the sequential min/max-bounded CDC recurrence with a
recursive CTE — one step per chunk, all documents advancing in
parallel — including every boundary decision (md5-window flag, minimum
suppression, maximum force-cut) and each chunk's content fingerprint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.chunking import MAX_CHUNK, MIN_CHUNK, WINDOW, chunk_documents
from .catalog import query, table


@query(
    "q_chunk_documents",
    f"""
    WITH RECURSIVE
    flags AS (
        SELECT doc_id, CAST(i AS INT) AS pos
        FROM documents,
             LATERAL unnest(range({WINDOW}, length(text) + 1)) AS u(i)
        WHERE substr(md5(substr(text, CAST(i - {WINDOW - 1} AS INT),
                                {WINDOW})), 1, 1) IN ('0', '1')
    ),
    docs AS (SELECT doc_id, length(text) AS n FROM documents),
    chunks(doc_id, chunk_idx, s, e) AS (
        SELECT d.doc_id, 0, 1,
               COALESCE(
                   (SELECT MIN(f.pos) FROM flags f
                     WHERE f.doc_id = d.doc_id
                       AND f.pos BETWEEN {MIN_CHUNK}
                                     AND LEAST({MAX_CHUNK}, d.n)),
                   LEAST({MAX_CHUNK}, d.n))
        FROM docs d WHERE d.n >= 1
        UNION ALL
        SELECT c.doc_id, c.chunk_idx + 1, c.e + 1,
               COALESCE(MIN(f.pos), LEAST(c.e + {MAX_CHUNK}, d.n))
        FROM chunks c
          JOIN docs d ON d.doc_id = c.doc_id
          LEFT JOIN flags f ON f.doc_id = c.doc_id
               AND f.pos BETWEEN c.e + {MIN_CHUNK}
                             AND LEAST(c.e + {MAX_CHUNK}, d.n)
        WHERE c.e < d.n
        GROUP BY c.doc_id, c.chunk_idx, c.e, d.n
    )
    SELECT c.doc_id,
           CAST(c.chunk_idx AS INT) AS chunk_idx,
           CAST(c.s AS INT) AS start,
           CAST(c.e - c.s + 1 AS INT) AS length,
           md5(substr(t.text, CAST(c.s AS INT), CAST(c.e - c.s + 1 AS INT)))
               AS chunk_md5
    FROM chunks c JOIN documents t USING (doc_id)
    ORDER BY c.doc_id, c.chunk_idx
    """,
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking of the corpus: md5-window boundary
    candidates with min-16/max-64 span enforcement, one output row per
    chunk with its span and content fingerprint — the substrate for
    chunk-level dedup of near-identical documents.

    Scale: partition-local mapInPandas, zero shuffles — each document is
    one sequential pass (the min/max suppression makes per-doc order
    inherent, which is why this is a kernel and not a window expression).
    The oracle recursive-CTE replays every cut decision exactly.
    """
    return chunk_documents(table(spark, sf_dir, "documents"))
