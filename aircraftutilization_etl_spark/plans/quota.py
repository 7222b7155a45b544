"""Per-source quota sampling — the common-crawl per-domain cap.

Every production pretraining corpus caps how many documents any one
source/domain may contribute (Common Crawl's head domains are orders
of magnitude larger than the tail; an uncapped corpus is a
head-domain corpus). The cap is the per-source twin of the catalog's
stratified_sample: keep at most QUOTA docs per source, chosen by
deterministic md5 rank of the key so the kept set is reproducible on
any engine and stable under corpus appends of OTHER keys.

A separate module (not plans/sampling.py) so landing it floats no
driver-verified query — sampling.py defines 12 green rows
(VERDICT r8 #1/#3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sampling import stratified_sample
from .catalog import query, table

# Bites at every SF: documents ships ≥25 docs/source at sf0.001.
QUOTA_PER_SOURCE = 10


@query(
    "q_quota_per_source",
    f"""
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents)
    WHERE rn <= {QUOTA_PER_SOURCE}
    ORDER BY source, doc_id
    """,
)
def q_quota_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap every source at QUOTA_PER_SOURCE docs, md5-rank selected —
    the kept (doc_id, source) set IS the semantic, so the query returns
    it row-for-row and the oracle hash pins exactly which docs survive.

    Scale: one per-source window (rank + filter inside the same
    exchange — Spark lowers the rn<=k filter to WindowGroupLimit, so
    each shuffle task retains only k rows per source group rather than
    sorting whole groups); no join, no second pass. Skew-safe: a
    monster source costs one task a top-k heap over its rows, not a
    full sort, and the output is bounded at QUOTA x n_sources rows.
    """
    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    return stratified_sample(
        d, ["source"], QUOTA_PER_SOURCE, "doc_id"
    ).select("doc_id", "source")


# Exact-N corpus cut: sample exactly TOTAL_BUDGET docs across sources,
# allocated by sqrt-of-size weights (temperature 1/2, the same
# correctly-rounded integer idiom as q_sample_temperature) with the
# classic largest-remainder (Hamilton) apportionment so the integer
# per-source allocations sum EXACTLY to the budget — the primitive
# behind "cut me a 10B-doc corpus with this mix".
TOTAL_BUDGET = 120


def budget_allocate(
    d: DataFrame, total: int, key: str = "doc_id", source_col: str = "source"
) -> DataFrame:
    """Keep exactly ``total`` rows (when no source runs dry), allocated
    across sources by largest-remainder over integer sqrt weights, each
    source's share chosen by md5 rank of the key.

    Integer exactness: weights are FLOOR(sqrt(n)·1e6) (IEEE sqrt is
    correctly rounded, so Python, Spark, and DuckDB compute the
    identical BIGINT); base shares are total·w DIV W with non-negative
    operands (Python // == Spark trunc-DIV == DuckDB // here); the
    leftover total - Σbase goes to the largest remainders, source name
    breaking ties. Python ints are arbitrary-precision, so the driver
    arithmetic has no 2^63 envelope at all.

    No redistribution pass: if sqrt weighting over-allocates a small
    source past its row count, the kept total falls short of the
    budget rather than paying a second allocation round — the
    q_mix_manifest data card is where callers see the shift coming.

    Scale: the apportionment runs on the DRIVER over the model-sized
    per-source count vector (the kmeans/classifier collect pattern —
    |sources| rows, not data; a first pure-DataFrame draft re-derived
    the counts aggregate three times because exchange reuse does not
    dedupe the tiny lineage, costing 5 fact scans). The data-sized
    work is ONE pruned scan + ONE per-source md5 rank, pre-pruned
    map-side by the constant bound rn <= total (WindowGroupLimit;
    every alloc is <= total by construction) before the exact
    broadcast-join filter.
    """
    import math

    from pyspark.sql.window import Window

    docs = d.select(key, source_col)
    counts = sorted(
        (r[0], r[1])
        for r in docs.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .collect()
    )
    if not counts:
        return docs.filter(F.lit(False))
    weights = {
        s: int(math.floor(math.sqrt(float(n)) * 1_000_000))
        for s, n in counts
    }
    wtot = sum(weights.values())
    base = {s: total * w // wtot for s, w in weights.items()}
    rem = {s: (total * w) % wtot for s, w in weights.items()}
    leftover = total - sum(base.values())
    for s in sorted(rem, key=lambda s: (-rem[s], s))[:leftover]:
        base[s] += 1
    src_type = docs.schema[source_col].dataType.simpleString()
    alloc = d.sparkSession.createDataFrame(
        sorted(base.items()), f"`{source_col}` {src_type}, alloc bigint"
    )
    order = F.md5(F.col(key).cast("string"))
    rn_w = Window.partitionBy(source_col).orderBy(order, F.col(key))
    return (
        docs.withColumn("__rn", F.row_number().over(rn_w))
        # constant upper bound first: alloc <= total always, so this
        # prune is exact AND constant -> Catalyst applies the map-side
        # WindowGroupLimit; the broadcast-join filter below then cuts
        # to the data-dependent per-source allocation
        .filter(F.col("__rn") <= total)
        .join(F.broadcast(alloc), source_col)
        .filter(F.col("__rn") <= F.col("alloc"))
        .select(key, source_col)
    )


@query(
    "q_quota_budget_allocation",
    f"""
    WITH counts AS (
        SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    ),
    w AS (
        SELECT source, n_docs,
               CAST(FLOOR(sqrt(CAST(n_docs AS DOUBLE)) * 1000000)
                    AS BIGINT) AS sqrt_w
        FROM counts
    ),
    tot AS (SELECT SUM(sqrt_w) AS wtot FROM w),
    alloc0 AS (
        SELECT w.source,
               {TOTAL_BUDGET} * w.sqrt_w // t.wtot AS base,
               ({TOTAL_BUDGET} * w.sqrt_w) % t.wtot AS rem
        FROM w, tot t
    ),
    leftover AS (SELECT {TOTAL_BUDGET} - SUM(base) AS leftover FROM alloc0),
    ranked AS (
        SELECT a.source, a.base, l.leftover,
               ROW_NUMBER() OVER (ORDER BY a.rem DESC, a.source) AS rk
        FROM alloc0 a, leftover l
    ),
    alloc AS (
        SELECT source,
               base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS alloc
        FROM ranked
    ),
    rdocs AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents
    )
    SELECT r.doc_id, r.source
    FROM rdocs r JOIN alloc a USING (source)
    WHERE r.rn <= a.alloc
    ORDER BY r.source, r.doc_id
    """,
)
def q_quota_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly TOTAL_BUDGET docs across all sources, sqrt-weighted with
    largest-remainder apportionment — the kept (doc_id, source) set is
    the semantic and the oracle hash pins both the integer allocation
    arithmetic and the md5 selection.
    """
    return budget_allocate(
        table(spark, sf_dir, "documents"), TOTAL_BUDGET
    )
