"""K-means clustering over embedding columns — the trained coarse
quantizer an IVF ANN index needs (operators/similarity.py's ivf_topk
probes whatever cell map it is given; this operator produces one).

Why quantized (int8) Lloyd's instead of float Lloyd's: k-means is
iterative, and every float summation order differs between engines, so a
float formulation can flip argmin assignments near ties and cascade into
different clusterings — unverifiable against an independent oracle. On
the int8 grid (operators/similarity.quantize_embeddings — exact
floor-of-double, engine-portable) every distance is an exact BIGINT sum
of squared integer differences and every centroid update an exact
floor-of-ratio, so two engines replay the identical iteration history
bit-for-bit. Quantized k-means is also the production-realistic variant:
coarse quantizers for billion-scale ANN are routinely trained on
compressed codes (the IVF literature's OPQ/SQ pipelines).

Scale shape (the part that must survive 100 TB):

- **Assignment is map-only.** Centroids are k×d integers — broadcast as
  literal arrays into a codegen'd zip_with/aggregate fold; no join, no
  shuffle, no Python. The corpus streams through one narrow projection
  per iteration.
- **The update is one key-partitioned shuffle per iteration**:
  posexplode to (cluster, dim) pairs and sum/count — k·d result groups
  regardless of corpus size, i.e. partial (map-side) aggregation does
  almost all the work.
- **The driver holds k×d integers per round** (the new centroids), never
  the data — the legitimate O(model) materialization every distributed
  k-means has.
- Codes are persisted across iterations (one quantization pass, not
  ``iterations`` of them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import quantize_embeddings


def _sq_dist_expr(vec_col: str, centroid: list[int]):
    """Exact BIGINT squared L2 distance between an int-code array column
    and one literal centroid — a codegen'd fold, no Python, no join."""
    carr = F.array(*[F.lit(int(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(
            F.col(vec_col),
            carr,
            lambda a, b: (a.cast("bigint") - b) * (a.cast("bigint") - b),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _assign(codes: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """(id, qvec) + k literal centroids → (id, qvec, cluster, dist).

    argmin with lowest-cluster-index tie-break: array_position returns
    the FIRST index holding the minimum.
    """
    dists = F.array(*[_sq_dist_expr("qvec", c) for c in centroids])
    return codes.select(
        "*",
        (F.array_position(dists, F.array_min(dists)) - 1)
        .cast("int")
        .alias("cluster"),
        F.array_min(dists).alias("dist"),
    )


def kmeans_int8(
    df: DataFrame,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means on int8-quantized vectors → (id, cluster, dist).

    Deterministic protocol (what the oracle replays):

    - **Init**: the k smallest ids' code vectors, cluster index assigned
      in id order.
    - **Iterate** ``iterations`` times: exact-integer argmin assignment
      (ties → lowest cluster index), then centroid update
      ``floor(sum/count)`` per dimension (exact: the ratio of exact
      BIGINTs is correctly rounded in double, and floor of it matches
      the true floor for |sum| < 2^53). A cluster that loses all members
      keeps its previous centroid.
    - **Output**: final assignment against the post-update centroids,
      with the exact BIGINT squared distance.
    """
    codes = (
        quantize_embeddings(df, id_col, vec_col)
        .select(F.col(id_col), "qvec")
        .persist()
    )
    seed_rows = codes.orderBy(id_col).limit(k).collect()
    centroids = [list(r["qvec"]) for r in seed_rows]

    for _ in range(iterations):
        assigned = _assign(codes, centroids)
        stats = (
            assigned.select("cluster", F.posexplode("qvec").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(
                F.floor(F.sum("x") / F.count(F.lit(1))).alias("val")
            )
            .collect()
        )
        new_centroids = [list(c) for c in centroids]  # empty keeps prior
        for row in stats:
            new_centroids[row["cluster"]][row["pos"]] = int(row["val"])
        centroids = new_centroids

    # materialize the (narrow: id, cluster, dist) result WHILE the code
    # cache is hot — otherwise the caller's first action would re-run
    # quantization from the raw vectors after the unpersist below
    out = (
        _assign(codes, centroids)
        .select(F.col(id_col), "cluster", "dist")
        .localCheckpoint(eager=True)
    )
    codes.unpersist()
    return out
