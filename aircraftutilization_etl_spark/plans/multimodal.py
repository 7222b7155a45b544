"""Multimodal-column queries (operators/multimodal.py).

Media assets derive deterministically from ``documents``
(attach_fake_media), so the mapInPandas pipelines have closed-form SQL
oracles wherever the stub codec's arithmetic is SQL-expressible. The
feature-extraction query keeps the full decoded-signal histogram and is
rows-only checked (the byte-level decode is not SQL-expressible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    FRAME_BYTES,
    attach_fake_media,
    extract_features,
    resize_images,
    sample_frames,
)
from .catalog import query, table

# media_type assignment used by attach_fake_media, as SQL
_MEDIA_TYPE = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'"
    " ELSE 'video' END"
)
_N_BYTES = "octet_length(encode(text))"


@query(
    "q_media_metadata_stats",
    f"""
    SELECT {_MEDIA_TYPE} AS media_type,
           CAST(COUNT(*) AS BIGINT) AS n_assets,
           CAST(SUM({_N_BYTES}) AS BIGINT) AS total_bytes,
           CAST(SUM(CAST(CEIL({_N_BYTES} / {FRAME_BYTES}.0) AS BIGINT))
                AS BIGINT) AS total_frames
    FROM documents
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_media_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only rollup of the media-asset table.

    Scale: the aggregation touches only media_type, payload length and
    the metadata struct — Catalyst prunes the binary payload out of the
    scan entirely (ReadSchema excludes it), which is the whole point of
    the payload/metadata split at 100 TB.
    """
    media = attach_fake_media(table(spark, sf_dir, "documents"))
    return (
        media.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum(F.octet_length("payload")).alias("total_bytes"),
            F.sum(F.col("meta.n_frames").cast("bigint")).alias("total_frames"),
        )
        .orderBy("media_type")
    )


@query(
    "q_media_frame_sample",
    f"""
    WITH video AS (
        SELECT doc_id AS asset_id,
               CAST(CEIL({_N_BYTES} / {FRAME_BYTES}.0) AS BIGINT) AS n_frames
        FROM documents
        WHERE doc_id % 3 = 2 AND {_N_BYTES} > 0
    )
    SELECT asset_id,
           CAST((n_frames - 1) // 4 + 1 AS BIGINT) AS n_sampled,
           CAST(4 * ((n_frames - 1) // 4) AS INT) AS max_frame_index
    FROM video
    ORDER BY asset_id
    """,
)
def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (every 4th frame) of video assets via the
    row-expanding mapInPandas kernel, rolled up per asset.

    The expansion happens partition-local (no shuffle); only the final
    per-asset count aggregates across the cluster.
    """
    media = attach_fake_media(table(spark, sf_dir, "documents"))
    frames = sample_frames(media, every=4)
    return (
        frames.groupBy("asset_id")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.max("frame_index").alias("max_frame_index"),
        )
        .orderBy("asset_id")
    )


@query(
    "q_media_resize",
    f"""
    SELECT doc_id AS asset_id,
           CAST(768 AS BIGINT) AS payload_bytes,
           32 AS width, 24 AS height
    FROM documents
    WHERE doc_id % 3 = 0
    ORDER BY asset_id
    """,
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize every image asset to 32×24 through the stub codec and
    verify payload/metadata agree — exercises the decode→transform→
    re-encode mapInPandas path end-to-end."""
    media = attach_fake_media(table(spark, sf_dir, "documents"))
    resized = resize_images(media, width=32, height=24)
    return resized.select(
        "asset_id",
        F.octet_length("payload").cast("bigint").alias("payload_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


@query("q_media_feature_extract", None)
def q_media_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-histogram feature vectors for every asset (decode stub +
    Arrow-batched feature kernel). Rows-only check: the byte-level
    decode has no SQL oracle."""
    media = attach_fake_media(table(spark, sf_dir, "documents"))
    feats = extract_features(media)
    return feats.select(
        "asset_id",
        "media_type",
        F.round(F.aggregate("features", F.lit(0.0), lambda a, x: a + x), 4).alias(
            "feature_l1"
        ),
        F.size("features").alias("dim"),
    )
