"""Benchmark-contamination queries (operators/contamination.py).

The oracle replays the whole pipeline in DuckDB — the deterministic
md5-prefix split, the word-3-gram shingling, the set intersection and
the integer-exact ppm ratio — so Spark and the oracle must agree on the
per-document hit counts row for row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.contamination import benchmark_shingle_set, contamination_report
from ..operators.sampling import hash_split
from .catalog import query, table

# 90/10 corpus/benchmark carve of the documents table; 'e666' is the
# md5-prefix bound for 0.9 (round(0.9 * 16^4) = 58982 = 0xE666), the
# same threshold scheme q_split_train_val pins.
SPLITS = {"train": 0.9, "benchmark": 0.1}
_TRAIN_BOUND = "e666"


@query(
    "q_contamination_report",
    f"""
    WITH tagged AS (
        SELECT doc_id, text,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{_TRAIN_BOUND}'
                   AS is_train
        FROM documents
    ),
    shingles AS (
        SELECT DISTINCT doc_id, is_train,
               array_to_string(w[CAST(i AS INT):CAST(i + 2 AS INT)], ' ')
                   AS shingle
        FROM (SELECT doc_id, is_train,
                     regexp_split_to_array(trim(text), '\\s+') AS w
              FROM tagged) t,
             LATERAL unnest(range(1, len(w) - 1)) AS u(i)
        WHERE len(w) >= 3
    ),
    bench AS (SELECT DISTINCT shingle FROM shingles WHERE NOT is_train),
    sizes AS (
        SELECT doc_id, COUNT(*) AS n_shingles
        FROM shingles WHERE is_train GROUP BY doc_id
    ),
    hits AS (
        SELECT s.doc_id, COUNT(*) AS n_hits
        FROM shingles s JOIN bench b USING (shingle)
        WHERE s.is_train
        GROUP BY s.doc_id
    )
    SELECT h.doc_id,
           CAST(h.n_hits AS BIGINT) AS n_hits,
           CAST(z.n_shingles AS BIGINT) AS n_shingles,
           CAST(h.n_hits * 1000000 // z.n_shingles AS BIGINT) AS hit_ppm
    FROM hits h JOIN sizes z USING (doc_id)
    ORDER BY h.doc_id
    """,
)
def q_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination audit: carve documents 90/10 into
    corpus/benchmark by content hash, then flag every training document
    sharing ≥ 1 word-3-gram with the benchmark side, with exact distinct
    hit counts and an integer-ppm overlap ratio.

    Scale: the benchmark shingle set (small by construction at real
    scale — eval suites vs a 100 TB corpus) is broadcast; the corpus
    side never shuffles its shingles, and the per-document count lands
    on the id partitioning ``with_shingle_array`` already installed, so
    the plan is one corpus scan + one broadcast probe + one partial agg.
    """
    tagged = hash_split(table(spark, sf_dir, "documents"), "doc_id", SPLITS)
    train = tagged.filter(F.col("split") == "train")
    bench = tagged.filter(F.col("split") == "benchmark")
    # driver compare is order-insensitive; no final sort
    return contamination_report(train, benchmark_shingle_set(bench))


SEMANTIC_TAU = 0.35
_COSINE = (
    "list_dot_product(cv, rv)"
    " / (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(rv, rv)))"
)


@query(
    "q_contamination_semantic",
    f"""
    WITH r AS (SELECT vec_id AS ref_id, CAST(embedding AS DOUBLE[]) AS rv
               FROM embeddings WHERE label = 0),
         c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
               FROM embeddings WHERE label <> 0),
    scored AS (
        SELECT vec_id, ref_id, ROUND({_COSINE}, 6) AS cosine
        FROM c CROSS JOIN r
    ),
    best AS (
        SELECT vec_id, ref_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY cosine DESC, ref_id) AS rn
        FROM scored
    )
    SELECT vec_id, ref_id AS best_ref_id, cosine,
           cosine >= {SEMANTIC_TAU} AS flagged
    FROM best WHERE rn = 1
    ORDER BY vec_id
    """,
)
def q_contamination_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination: every corpus vector's best
    cosine match against the benchmark reference set (label 0), flagged
    at tau=0.35 — the semantic complement of the n-gram collision audit
    (q_contamination_report), catching paraphrased benchmark leakage
    that shares no 3-gram.

    Scale: the reference set broadcasts (enforced budget); the corpus
    streams through one GEMM scan emitting only per-row argmax
    candidates, so the sole exchange is a 24-byte-per-vector candidate
    table. The oracle replays every best match and flag.
    """
    from ..operators.similarity import cosine_best_match

    e = table(spark, sf_dir, "embeddings")
    best = cosine_best_match(
        e.filter(F.col("label") != 0), e.filter(F.col("label") == 0)
    )
    return best.select(
        "vec_id",
        "best_ref_id",
        "cosine",
        (F.col("cosine") >= SEMANTIC_TAU).alias("flagged"),
    ).orderBy("vec_id")
