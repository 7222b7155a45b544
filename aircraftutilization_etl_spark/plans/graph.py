"""Graph queries (operators/graph.py).

The PageRank oracle replays all five synchronous integer-ppm updates
with a recursive CTE. Pitfall pinned here: inside ``WITH RECURSIVE``
DuckDB treats ANY union-shaped CTE as recursive — a plain
``UNION``-dedup nodes CTE silently yields duplicates, so the node set
is built as DISTINCT over UNION ALL instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.events import cooccurrence_pairs, directed_cooccurrence
from ..operators.graph import pagerank
from .catalog import query, table

N_ITER = 5

# symmetric item co-occurrence edges (both directions), built from
# distinct (user, item) observations — identical row set both engines
_EDGES_SQL = """
    ui AS (
        SELECT DISTINCT user_id,
               CAST(json_extract_string(props, '$.k') AS INT) AS item
        FROM events
        WHERE json_extract_string(props, '$.k') IS NOT NULL
    ),
    edges AS (
        SELECT DISTINCT a.item AS src, b.item AS dst
        FROM ui a JOIN ui b
          ON a.user_id = b.user_id AND a.item <> b.item
    )
"""


@query(
    "q_graph_pagerank",
    f"""
    WITH RECURSIVE {_EDGES_SQL},
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    nodes AS (
        SELECT DISTINCT node FROM (
            SELECT src AS node FROM edges
            UNION ALL SELECT dst FROM edges
        )
    ),
    ranks(i, node, r) AS (
        SELECT 0, node, 1000000::BIGINT FROM nodes
        UNION ALL
        SELECT r.i + 1, e.dst,
               150000 + (850000 * SUM(r.r // d.d)) // 1000000
        FROM ranks r
          JOIN edges e ON e.src = r.node
          JOIN deg d ON d.src = e.src
        WHERE r.i < {N_ITER}
        GROUP BY r.i, e.dst
    )
    SELECT node, CAST(r AS BIGINT) AS rank_ppm
    FROM ranks WHERE i = {N_ITER}
    ORDER BY node
    """,
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (5 iterations, integer-ppm arithmetic) over the item
    co-occurrence graph mined from event streams — "centrality of items
    by shared audiences".

    The co-occurrence edge list is symmetric, so the oracle's inner-join
    recursion and the engine's general left-join formulation coincide;
    integer arithmetic makes all five iterations' ranks bit-identical
    across engines and partitionings.

    Scale: per iteration, one |edges|-sized shuffle with map-side
    partial sums; the degree-annotated edge list is persisted once.
    Lineage is truncated per round (localCheckpoint) so the driver's
    plan stays O(1) in iteration count.
    """
    from ..operators.distribute import ensure_scan_parallelism

    ev = table(spark, sf_dir, "events")
    ui = ev.select(
        "user_id", F.get_json_object("props", "$.k").cast("int").alias("item")
    ).filter(F.col("item").isNotNull())
    edges = directed_cooccurrence(ui, "user_id", "item").select(
        "src", "dst"
    )
    # Spread the mined edges before the iterative driver when the input
    # is small (r12, unlocked by the sentinel rotation): the pair-count
    # exchange's output is tiny in bytes, so AQE coalesced everything
    # downstream — the direction mirror, the degree aggregate, and the
    # edge-cache build pagerank iterates over — onto ONE partition
    # (profiled: an ~850 ms single-task stage per run). Keying the
    # spread on src lets pagerank's degree aggregate and rank join
    # reuse the partitioning; no-op at corpus scale (input-size
    # estimate), where the join's own exchanges do the spreading.
    edges = ensure_scan_parallelism(edges, "src")
    # item vocabulary is tiny relative to the event stream: keep the
    # per-iteration rank table on a few partitions
    return pagerank(edges, N_ITER, rank_partitions=4)


@query(
    "q_graph_triangles",
    f"""
    WITH {_EDGES_SQL},
    und AS (SELECT src AS a, dst AS b FROM edges WHERE src < dst),
    deg AS (SELECT src AS u, COUNT(*) AS d FROM edges GROUP BY src),
    ori AS (
        SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
                    THEN a ELSE b END AS src,
               CASE WHEN da.d < db.d OR (da.d = db.d AND a < b)
                    THEN b ELSE a END AS dst
        FROM und JOIN deg da ON da.u = und.a JOIN deg db ON db.u = und.b
    ),
    wedges AS (
        SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM ori e1 JOIN ori e2 ON e1.src = e2.src AND e1.dst < e2.dst
    ),
    closing AS (SELECT LEAST(src, dst) AS x, GREATEST(src, dst) AS y
                FROM ori),
    tri AS (
        SELECT a, b, c FROM wedges JOIN closing
          ON LEAST(wedges.b, wedges.c) = closing.x
         AND GREATEST(wedges.b, wedges.c) = closing.y
    ),
    pn AS (
        SELECT u, COUNT(*) AS t FROM (
            SELECT a AS u FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        ) GROUP BY u
    )
    SELECT deg.u AS node,
           CAST(deg.d AS BIGINT) AS degree,
           CAST(COALESCE(pn.t, 0) AS BIGINT) AS n_triangles,
           CAST(CASE WHEN deg.d >= 2
                     THEN 2 * COALESCE(pn.t, 0) * 1000000
                          // (deg.d * (deg.d - 1))
                     ELSE 0 END AS BIGINT) AS clustering_ppm
    FROM deg LEFT JOIN pn ON pn.u = deg.u
    ORDER BY node
    """,
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counts + local clustering coefficient (integer ppm) per
    node of the item co-occurrence graph — the community-density gauge
    next to PageRank's centrality gauge.

    Scale (operators/graph.triangle_stats): degree-ordered edge
    orientation bounds wedge generation at O(m^1.5) on power-law
    graphs (id-ordering would be quadratic around hubs); the close is
    an equi-join on the canonical pair key; coefficients are integer
    DIV so both engines agree bit-for-bit.
    """
    from ..operators.graph import triangle_stats

    ev = table(spark, sf_dir, "events")
    ui = ev.select(
        "user_id", F.get_json_object("props", "$.k").cast("int").alias("item")
    ).filter(F.col("item").isNotNull())
    edges = cooccurrence_pairs(ui, "user_id", "item").select(
        "item_a", "item_b"
    )
    return triangle_stats(edges).orderBy("node")


KNN_K = 3
BFS_MAX_DEPTH = 4


@query(
    "q_graph_knn_bfs",
    f"""
    WITH RECURSIVE ui AS (
        SELECT DISTINCT user_id,
               CAST(json_extract_string(props, '$.k') AS INT) AS item
        FROM events
        WHERE json_extract_string(props, '$.k') IS NOT NULL
    ),
    pairs AS (
        SELECT a.item AS src, b.item AS dst, COUNT(*) AS n
        FROM ui a JOIN ui b
          ON a.user_id = b.user_id AND a.item <> b.item
        GROUP BY 1, 2
    ),
    knn AS (
        SELECT src, dst FROM (
            SELECT src, dst,
                   ROW_NUMBER() OVER (PARTITION BY src
                                      ORDER BY n DESC, dst) AS r
            FROM pairs)
        WHERE r <= {KNN_K}
    ),
    s AS (SELECT MIN(src) AS v FROM knn),
    walk(node, depth) AS (
        SELECT v, 0 FROM s
        UNION
        SELECT k.dst, w.depth + 1
        FROM walk w JOIN knn k ON k.src = w.node
        WHERE w.depth < {BFS_MAX_DEPTH}
    )
    SELECT CAST(node AS BIGINT) AS node, CAST(MIN(depth) AS INT) AS depth
    FROM walk GROUP BY node
    ORDER BY node
    """,
)
def q_graph_knn_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN graph + BFS: sparsify the item co-occurrence graph to each
    item's 3 strongest neighbors, then breadth-first depths (≤ 4 hops)
    from the smallest item — reachability over a similarity skeleton,
    the traversal primitive the dense graph can't afford at scale.

    Scale (operators/graph.knn_edges/bfs_depths): the k-NN cut bounds
    edges at k·|V| however dense co-occurrence gets; BFS prunes by
    anti-join against the visited set (work ∝ newly reached nodes, not
    paths — the oracle's UNION-dedup recursion is the same pruning).
    """
    from ..operators.graph import bfs_depths, knn_edges

    ev = table(spark, sf_dir, "events")
    ui = ev.select(
        "user_id", F.get_json_object("props", "$.k").cast("int").alias("item")
    ).filter(F.col("item").isNotNull())
    cooc = cooccurrence_pairs(ui, "user_id", "item")
    directed = cooc.select(
        F.col("item_a").alias("src"),
        F.col("item_b").alias("dst"),
        F.col("n_keys").alias("weight"),
    ).unionByName(
        cooc.select(
            F.col("item_b").alias("src"),
            F.col("item_a").alias("dst"),
            F.col("n_keys").alias("weight"),
        )
    )
    sparse = knn_edges(directed, KNN_K)
    return bfs_depths(sparse, BFS_MAX_DEPTH).select(
        F.col("node").cast("bigint").alias("node"), "depth"
    )


JACCARD_MIN_PPM = 400_000


@query(
    "q_graph_node_jaccard",
    f"""
    WITH ui AS (
        SELECT DISTINCT user_id,
               CAST(json_extract_string(props, '$.k') AS INT) AS item
        FROM events
        WHERE json_extract_string(props, '$.k') IS NOT NULL
    ),
    pairs AS (
        SELECT a.item AS src, b.item AS dst, COUNT(*) AS n
        FROM ui a JOIN ui b
          ON a.user_id = b.user_id AND a.item <> b.item
        GROUP BY 1, 2
    ),
    knn AS (
        SELECT src, dst FROM (
            SELECT src, dst,
                   ROW_NUMBER() OVER (PARTITION BY src
                                      ORDER BY n DESC, dst) AS r
            FROM pairs)
        WHERE r <= {KNN_K}
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM knn GROUP BY src),
    common AS (
        SELECT e1.src AS node_a, e2.src AS node_b, COUNT(*) AS n_common
        FROM knn e1 JOIN knn e2
          ON e1.dst = e2.dst AND e1.src < e2.src
        GROUP BY 1, 2
    ),
    und AS (SELECT DISTINCT LEAST(src, dst) AS ua,
                   GREATEST(src, dst) AS ub FROM knn)
    SELECT c.node_a AS node_a, c.node_b AS node_b,
           CAST(c.n_common AS BIGINT) AS n_common,
           CAST(c.n_common * 1000000
                // (da.d + db.d - c.n_common) AS BIGINT) AS jaccard_ppm,
           u.ua IS NOT NULL AS is_edge
    FROM common c
      JOIN deg da ON da.src = c.node_a
      JOIN deg db ON db.src = c.node_b
      LEFT JOIN und u
        ON u.ua = c.node_a AND u.ub = c.node_b
    WHERE c.n_common * 1000000 // (da.d + db.d - c.n_common)
          >= {JACCARD_MIN_PPM}
    ORDER BY node_a, node_b
    """,
)
def q_graph_node_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item pairs sharing most of their nearest neighbors: neighborhood
    Jaccard (integer ppm, ≥ 0.4 ≈ "2 of 3 strongest neighbors in
    common") over the k-NN-SPARSIFIED co-occurrence graph, with an
    ``is_edge`` flag — the link-prediction / "customers also bought"
    primitive. The raw co-occurrence graph is near-complete (shared-
    audience edges saturate), so similarity is computed where it is
    informative: on each item's top-3 strongest-association skeleton —
    a high-Jaccard NON-edge is a recommendation candidate, a
    high-Jaccard edge a reinforced one.

    Scale (operators/graph.neighborhood_jaccard over knn_edges): the
    k-NN cut bounds the wedge join at k²·|V| candidate pairs however
    dense co-occurrence gets; degree tables are group-count-sized; all
    similarity arithmetic is integer DIV — bit-identical across
    engines.
    """
    from ..operators.graph import knn_edges, neighborhood_jaccard

    ev = table(spark, sf_dir, "events")
    ui = ev.select(
        "user_id", F.get_json_object("props", "$.k").cast("int").alias("item")
    ).filter(F.col("item").isNotNull())
    directed = directed_cooccurrence(ui, "user_id", "item")
    sparse = knn_edges(directed, KNN_K)
    return (
        neighborhood_jaccard(sparse, JACCARD_MIN_PPM)
        .select(
            F.col("node_a").cast("int").alias("node_a"),
            F.col("node_b").cast("int").alias("node_b"),
            "n_common",
            "jaccard_ppm",
            "is_edge",
        )
        .orderBy("node_a", "node_b")
    )


@query(
    "q_graph_degree_distribution",
    f"""
    WITH ui AS (
        SELECT DISTINCT user_id,
               CAST(json_extract_string(props, '$.k') AS INT) AS item
        FROM events
        WHERE json_extract_string(props, '$.k') IS NOT NULL
    ),
    pairs AS (
        SELECT a.item AS src, b.item AS dst, COUNT(*) AS n
        FROM ui a JOIN ui b
          ON a.user_id = b.user_id AND a.item <> b.item
        GROUP BY 1, 2
    ),
    knn AS (
        SELECT src, dst FROM (
            SELECT src, dst,
                   ROW_NUMBER() OVER (PARTITION BY src
                                      ORDER BY n DESC, dst) AS r
            FROM pairs)
        WHERE r <= {KNN_K}
    ),
    indeg AS (SELECT dst AS node, COUNT(*) AS d FROM knn GROUP BY dst),
    binned AS (
        SELECT CAST(LENGTH(BIN(d)) - 1 AS INT) AS log2_bin, d
        FROM indeg
    )
    SELECT log2_bin,
           CAST(1 << log2_bin AS BIGINT) AS bin_lo,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MIN(d) AS BIGINT) AS min_degree,
           CAST(MAX(d) AS BIGINT) AS max_degree
    FROM binned
    GROUP BY log2_bin
    ORDER BY log2_bin
    """,
)
def q_graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-binned IN-degree distribution of the k-NN item graph — the
    "is it scale-free?" diagnostic that decides every downstream graph
    strategy (a heavy tail says salt the hubs before any wedge join;
    out-degree is fixed at k by construction, so in-degree carries all
    the signal: items that are many items' nearest neighbor are the
    hubs). A straight line across these bins on log-log axes is the
    power-law signature.

    Determinism: degrees are exact counts and the bin is the
    integer's BIT LENGTH minus one — pure integer derivation, because
    floor(ln d / ln 2) amplifies a 1-ulp libm difference into a whole
    bin exactly at the power-of-two degrees a k-NN graph is full of.

    Scale: the k-NN construction bounds edges at k·|V|; binning is one
    count aggregate over the degree table.
    """
    from ..operators.graph import knn_edges

    ev = table(spark, sf_dir, "events")
    ui = ev.select(
        "user_id", F.get_json_object("props", "$.k").cast("int").alias("item")
    ).filter(F.col("item").isNotNull())
    sparse = knn_edges(directed_cooccurrence(ui, "user_id", "item"), KNN_K)
    indeg = sparse.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    binned = indeg.select(
        (F.length(F.bin("d")) - 1).cast("int").alias("log2_bin"),
        "d",
    )
    return (
        binned.groupBy("log2_bin")
        .agg(
            F.expr("CAST(SHIFTLEFT(CAST(1 AS BIGINT), log2_bin)"
                   " AS BIGINT)").alias("bin_lo"),
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.min("d").cast("bigint").alias("min_degree"),
            F.max("d").cast("bigint").alias("max_degree"),
        )
        .select(
            "log2_bin", "bin_lo", "n_nodes", "min_degree", "max_degree"
        )
        .orderBy("log2_bin")
    )
