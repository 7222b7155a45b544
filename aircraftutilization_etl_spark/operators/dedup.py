"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

All engine-portable by construction: the only hash primitive is md5
(identical hex output in Spark and DuckDB), so every operator here has an
exact SQL oracle. MinHash uses the *lexicographic minimum of md5 strings*
per seeded hash function — a valid uniform min-hash that needs no
hex→integer conversion.

Scale design (the point of these operators at 100 TB):
- shingling is a per-row map (no shuffle);
- pair generation never crosses the full corpus: exact dedup shuffles on
  the fingerprint, LSH shuffles on (band, band_key) buckets, n-gram
  Jaccard shuffles on the shingle — each key-local;
- verification joins run only over candidate pairs, not the cross
  product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import fingerprint_expr, words_expr

SHINGLE_N = 3
MINHASH_K = 16  # 16 hash functions → 4 bands × 4 rows
MINHASH_BANDS = 4
MINHASH_ROWS = MINHASH_K // MINHASH_BANDS


def doc_shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct word-``SHINGLE_N``-grams per document.

    Documents with fewer than SHINGLE_N words produce no shingles (and
    therefore never pair) — the same convention as the SQL oracle.
    """
    words = words_expr(text_col)
    shingle_list = F.transform(
        F.sequence(F.lit(0), F.size(words) - SHINGLE_N),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, SHINGLE_N)),
    )
    return (
        df.filter(F.size(words) >= SHINGLE_N)
        .select(F.col(id_col), F.explode(shingle_list).alias("shingle"))
        .distinct()
    )


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup on the normalized-text fingerprint.

    Returns one row per content group: representative (min id), member
    count. Scale: one shuffle on the 128-bit fingerprint — the classic
    hash-groupBy dedup.
    """
    return (
        df.select(F.col(id_col), fingerprint_expr(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("representative"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def shingle_jaccard_pairs(
    shingles: DataFrame, threshold: float, id_col: str = "doc_id"
) -> DataFrame:
    """All document pairs with shingle-set Jaccard ≥ threshold.

    Pairs are generated only for documents sharing at least one shingle
    (equi-join on the shingle), then scored exactly:
    J = |A∩B| / (|A|+|B|−|A∩B|).
    """
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    a = shingles.select(F.col(id_col).alias("id_a"), "shingle")
    b = shingles.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(shingles: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """MinHash signature per document: for seed i in [0, K), the
    lexicographic MIN of md5(shingle || '#' || i).

    One explode (×K) + one groupBy(id, seed) min — all partial-aggregated
    map-side before the shuffle on the doc id.
    """
    seeded = shingles.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(MINHASH_K - 1))).alias("seed"),
        "shingle",
    )
    return (
        seeded.select(
            id_col,
            "seed",
            F.md5(F.concat_ws("#", "shingle", "seed")).alias("h"),
        )
        .groupBy(id_col, "seed")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_candidate_pairs(signatures: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Band the K minhashes into MINHASH_BANDS buckets; docs colliding on
    any band's full key become candidate pairs.

    Scale: the join is per (band, band_key) bucket — only near-identical
    documents collide, so bucket sizes stay tiny even at corpus scale.
    """
    banded = (
        signatures.withColumn("band", (F.col("seed") / MINHASH_ROWS).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.md5(
                F.concat_ws("|", F.array_sort(F.collect_list("minhash")))
            ).alias("band_key")
        )
    )
    a = banded.select(F.col(id_col).alias("id_a"), "band", "band_key")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_lsh_duplicates(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash-LSH near-dup pipeline: shingle → minhash → band → candidate
    pairs → exact-Jaccard verification ≥ threshold.

    The verification join runs only over LSH candidates, so the exact
    Jaccard pass is proportional to the number of near-duplicates, not to
    the corpus size.
    """
    shingles = doc_shingles(df, id_col, text_col)
    candidates = lsh_candidate_pairs(minhash_signatures(shingles, id_col), id_col)
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    a = shingles.select(F.col(id_col).alias("id_a"), "shingle")
    b = shingles.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        candidates.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_expr(text_col: str = "text", bits: int = 16):
    """SimHash fingerprint as a ``bits``-character bit string.

    Each word hashes to md5; hex digit p (one per output bit) votes
    +1/−1 by its high bit (digit ≥ 8). Bit p of the fingerprint is 1
    when the vote sum is positive. Pure column expressions — the per-bit
    vote is an aggregate over the word array, no shuffle, no UDF.
    """
    words = words_expr(text_col)
    hashed = F.transform(words, lambda w: F.md5(w))

    def bit(p: int):
        # vote_p = Σ_words (digit_p >= '8' ? 1 : -1)
        votes = F.aggregate(
            hashed,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.substring(h, p + 1, 1) >= "8", 1).otherwise(-1),
        )
        return F.when(votes > 0, F.lit("1")).otherwise(F.lit("0"))

    return F.concat(*[bit(p) for p in range(bits)])
