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

from ..operators.events import cooccurrence_pairs
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
    ev = table(spark, sf_dir, "events")
    ui = ev.select(
        "user_id", F.get_json_object("props", "$.k").cast("int").alias("item")
    ).filter(F.col("item").isNotNull())
    cooc = cooccurrence_pairs(ui, "user_id", "item")
    edges = cooc.select(
        F.col("item_a").alias("src"), F.col("item_b").alias("dst")
    ).union(
        cooc.select(F.col("item_b").alias("src"), F.col("item_a").alias("dst"))
    )
    # item vocabulary is tiny relative to the event stream: keep the
    # per-iteration rank table on a few partitions
    return pagerank(edges, N_ITER, rank_partitions=4)
