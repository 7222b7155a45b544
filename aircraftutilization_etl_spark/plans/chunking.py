"""Content-defined chunking queries (operators/chunking.py).

The oracle replays the sequential min/max-bounded CDC recurrence with a
recursive CTE — one step per chunk, all documents advancing in
parallel — including every boundary decision (md5-window flag, minimum
suppression, maximum force-cut) and each chunk's content fingerprint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.chunking import (
    GEAR_CUT_MASK,
    GEAR_MASK,
    GEAR_MULT,
    MAX_CHUNK,
    MIN_CHUNK,
    WINDOW,
    chunk_documents,
)
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


# chunk-level dedup: which chunk contents recur across the corpus —
# the payoff query for CDC (near-identical docs share most chunks even
# when byte offsets differ)
_CHUNK_CTES = """
    flags AS (
        SELECT doc_id, CAST(i AS INT) AS pos
        FROM documents,
             LATERAL unnest(range(8, length(text) + 1)) AS u(i)
        WHERE substr(md5(substr(text, CAST(i - 7 AS INT), 8)), 1, 1)
                  IN ('0', '1')
    ),
    docs AS (SELECT doc_id, length(text) AS n FROM documents),
    chunks(doc_id, chunk_idx, s, e) AS (
        SELECT d.doc_id, 0, 1,
               COALESCE(
                   (SELECT MIN(f.pos) FROM flags f
                     WHERE f.doc_id = d.doc_id
                       AND f.pos BETWEEN 16 AND LEAST(64, d.n)),
                   LEAST(64, d.n))
        FROM docs d WHERE d.n >= 1
        UNION ALL
        SELECT c.doc_id, c.chunk_idx + 1, c.e + 1,
               COALESCE(MIN(f.pos), LEAST(c.e + 64, d.n))
        FROM chunks c
          JOIN docs d ON d.doc_id = c.doc_id
          LEFT JOIN flags f ON f.doc_id = c.doc_id
               AND f.pos BETWEEN c.e + 16 AND LEAST(c.e + 64, d.n)
        WHERE c.e < d.n
        GROUP BY c.doc_id, c.chunk_idx, c.e, d.n
    ),
    hashed AS (
        SELECT c.doc_id,
               md5(substr(t.text, CAST(c.s AS INT),
                          CAST(c.e - c.s + 1 AS INT))) AS chunk_md5
        FROM chunks c JOIN documents t USING (doc_id)
    )
"""


@query(
    "q_chunk_dedup",
    f"""
    WITH RECURSIVE {_CHUNK_CTES}
    SELECT chunk_md5,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           MIN(doc_id) AS first_doc
    FROM hashed
    GROUP BY chunk_md5
    HAVING COUNT(*) > 1
    ORDER BY chunk_md5
    """,
)
def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level dedup over the CDC output: every chunk content that
    occurs more than once corpus-wide, with occurrence/document counts —
    sub-document duplication that whole-doc fingerprints cannot see,
    robust to byte offsets because boundaries are content-defined.

    Scale: the chunking pass is shuffle-free; this adds ONE shuffle on
    the 128-bit chunk fingerprint with map-side partial counts — the
    same hash-groupBy profile as exact document dedup.
    """
    from pyspark.sql import functions as F

    chunks = chunk_documents(table(spark, sf_dir, "documents"))
    return (
        chunks.groupBy("chunk_md5")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_occurrences") > 1)
    )


@query(
    "q_chunk_documents_gear",
    f"""
    WITH RECURSIVE
    docs AS (SELECT doc_id, text, length(text) AS n FROM documents),
    gear(doc_id, pos, h, n) AS (
        SELECT doc_id, 1,
               CAST((ord(substr(text, 1, 1)) * {GEAR_MULT})
                    % 4294967296 AS BIGINT),
               n
        FROM docs WHERE n >= 1
        UNION ALL
        SELECT g.doc_id, g.pos + 1,
               ((g.h * 2) + ((ord(substr(d.text, CAST(g.pos + 1 AS INT), 1))
                              * {GEAR_MULT}) % 4294967296))
                   & {GEAR_MASK},
               g.n
        FROM gear g JOIN docs d USING (doc_id)
        WHERE g.pos < g.n
    ),
    flags AS (
        SELECT doc_id, CAST(pos AS INT) AS pos FROM gear
        WHERE (h & {GEAR_CUT_MASK}) = 0
    ),
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
def q_chunk_documents_gear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC with the PRODUCTION flag function: a 48-bit gear rolling
    hash (FastCDC-style, O(1) per byte — no per-window digest), same
    min/max cut scaffold as q_chunk_documents. The oracle chains two
    recursions: one replays the per-position hash recurrence, one
    replays the per-chunk cuts — every boundary decision is integer
    math both engines agree on bit-for-bit.

    Scale: identical plan shape to the md5 variant (partition-local
    mapInPandas, zero shuffles) but the per-byte cost drops from one
    md5 digest per window to two integer ops — this is the variant a
    100 TB corpus runs.
    """
    return chunk_documents(table(spark, sf_dir, "documents"), method="gear")


CHUNK_JACCARD_THRESH_PPM = 300000  # 0.30 chunk-set overlap


@query(
    "q_chunk_near_dup",
    f"""
    WITH RECURSIVE {_CHUNK_CTES},
    csets AS (SELECT DISTINCT doc_id, chunk_md5 FROM hashed),
    sizes AS (SELECT doc_id, COUNT(*) AS n_chunks FROM csets GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
        FROM csets a JOIN csets b
          ON a.chunk_md5 = b.chunk_md5 AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(i.n_common AS BIGINT) AS n_common,
           CAST(i.n_common * 1000000
                // (sa.n_chunks + sb.n_chunks - i.n_common) AS BIGINT)
               AS jaccard_ppm
    FROM inter i
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
    WHERE i.n_common * 1000000
          // (sa.n_chunks + sb.n_chunks - i.n_common)
          >= {CHUNK_JACCARD_THRESH_PPM}
    ORDER BY id_a, id_b
    """,
)
def q_chunk_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate documents by CDC chunk-set Jaccard (≥ 0.30,
    integer ppm): documents sharing a third of their content-defined
    chunks are flagged even when the shared content sits at different
    byte offsets or in different order — the sub-document complement to
    word-shingle Jaccard, off the same chunk fingerprints chunk-level
    dedup uses.

    Scale: pairs form only through the equi-join on the chunk
    fingerprint (Σ per-fingerprint freq², never n²) — the identical
    bucketed-join shape as q_dedup_ngram_jaccard, fed by the
    shuffle-free chunking kernel.
    """
    from pyspark.sql import functions as F

    chunks = chunk_documents(table(spark, sf_dir, "documents"))
    csets = chunks.select("doc_id", "chunk_md5").distinct()
    sizes = csets.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    a = csets.select(F.col("doc_id").alias("id_a"), "chunk_md5")
    b = csets.select(F.col("doc_id").alias("id_b"), "chunk_md5")
    inter = (
        a.join(b, "chunk_md5")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_chunks").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_chunks").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_common",
            F.expr(
                "CAST(n_common * 1000000 DIV (n_a + n_b - n_common) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
        .filter(F.col("jaccard_ppm") >= CHUNK_JACCARD_THRESH_PPM)
    )
