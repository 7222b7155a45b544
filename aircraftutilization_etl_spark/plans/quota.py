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
