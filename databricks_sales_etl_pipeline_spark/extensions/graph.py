"""Graph analytics over the co-purchase graph (north-star item; the
reference notebooks have no graph surface — REFERENCE_MAP.md). Connected
components and a PageRank step already live in ``dedup.py``; this module
adds triangle counting — the canonical "needs a real distributed
algorithm" graph kernel.

Graph: vertices = parts, edges = two parts co-ordered in the same order
(a < b, distinct). Triangle counting uses the degree-oriented
node-iterator form (Schank–Wagner / "compact-forward"): orient every edge
from its lower-(degree, id) endpoint to the higher one, enumerate wedges
only among ORIENTED out-neighbors, and probe the oriented edge set. Total
wedge work is O(m^{3/2}) instead of Σ deg² — the difference between a
bounded shuffle and a skew blow-up on power-law degree graphs at 100 TB
(a celebrity vertex with degree 10⁶ contributes 10¹² naive wedges but
only ~m^{1/2}·10⁶ oriented ones).

The triangle COUNT is orientation-independent, so the DuckDB oracle uses
the naive a<b<c three-way self-join — different plan, provably identical
integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query


@query(
    "ext_graph_triangles",
    oracle="""
    WITH e AS (
        SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
        FROM lineitem l1
        JOIN lineitem l2 ON l2.l_orderkey = l1.l_orderkey
                        AND l1.l_partkey < l2.l_partkey
    ),
    deg AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS d
        FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
        GROUP BY v
    )
    SELECT
        CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_vertices,
        CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
        CAST((SELECT SUM(d * (d - 1) // 2) FROM deg) AS BIGINT) AS n_wedges,
        CAST((SELECT COUNT(*)
              FROM e e1
              JOIN e e2 ON e2.a = e1.b
              JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b) AS BIGINT)
            AS n_triangles
    """,
)
def ext_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 — triangle census of the co-purchase graph: vertex/edge/wedge
    counts plus the exact triangle count via degree-oriented wedge
    enumeration (each triangle generated exactly once from its
    lowest-(degree, id) corner)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("x"), li.alias("y")
    # Materialize the working set (edge list, degrees, oriented edges) with
    # localCheckpoint: the census reads each one from several consumers, and
    # without truncation every aggregate replays the whole upstream lineage
    # (first draft: 29 shuffles in one plan; this shape: 4).
    edges = (
        a.join(
            b,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .select(
            F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b")
        )
        .distinct()
        .localCheckpoint()
    )
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint()
    )
    # orient each edge low-(degree, id) → high-(degree, id)
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    oriented = (
        edges.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("s"), F.col("b").alias("t")),
            )
            .otherwise(F.struct(F.col("b").alias("s"), F.col("a").alias("t")))
            .alias("e")
        )
        .select(F.col("e.s").alias("s"), F.col("e.t").alias("t"))
        .localCheckpoint()
    )
    # wedges among out-neighbors of the same source, ordered so each
    # triangle's apex generates exactly one (v, w) probe pair
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedges = o1.join(
        o2,
        (F.col("o1.s") == F.col("o2.s")) & (F.col("o1.t") < F.col("o2.t")),
    ).select(F.col("o1.t").alias("v"), F.col("o2.t").alias("w"))
    # a wedge (v, w) closes iff v—w is an edge; orientation of the closing
    # edge is unknown, so probe the UNDIRECTED edge set (a < b form). The
    # wedge pair is already emitted with v < w (raw-id order), matching it.
    probe = edges.select(F.col("a").alias("pv"), F.col("b").alias("pw"))
    tri = wedges.join(
        probe, (F.col("v") == F.col("pv")) & (F.col("w") == F.col("pw"))
    )

    n_wedges = deg.agg(
        F.sum(F.expr("d * (d - 1) DIV 2")).cast("long").alias("n_wedges")
    )
    return (
        deg.agg(F.count(F.lit(1)).alias("n_vertices"))
        .crossJoin(F.broadcast(edges.agg(F.count(F.lit(1)).alias("n_edges"))))
        .crossJoin(F.broadcast(n_wedges))
        .crossJoin(
            F.broadcast(tri.agg(F.count(F.lit(1)).alias("n_triangles")))
        )
        .select("n_vertices", "n_edges", "n_wedges", "n_triangles")
    )


# --- bounded BFS ------------------------------------------------------------

BFS_DEPTH = 3
#: sparsify: only co-purchases from every 11th order, so distances > 1 exist
_BFS_ORDER_MOD = 11


@query(
    "ext_graph_bfs",
    oracle=f"""
    WITH RECURSIVE eu AS (
        SELECT a, b FROM (
            SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
            FROM lineitem l1
            JOIN lineitem l2 ON l2.l_orderkey = l1.l_orderkey
                            AND l1.l_partkey < l2.l_partkey
            WHERE l1.l_orderkey % {_BFS_ORDER_MOD} = 0
        )
        UNION ALL
        SELECT b, a FROM (
            SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
            FROM lineitem l1
            JOIN lineitem l2 ON l2.l_orderkey = l1.l_orderkey
                            AND l1.l_partkey < l2.l_partkey
            WHERE l1.l_orderkey % {_BFS_ORDER_MOD} = 0
        )
    ), bfs(v, d) AS (
        SELECT MIN(a), 0 FROM eu
        UNION ALL
        SELECT eu.b, bfs.d + 1
        FROM bfs JOIN eu ON eu.a = bfs.v
        WHERE bfs.d < {BFS_DEPTH}
    )
    SELECT v, CAST(MIN(d) AS BIGINT) AS dist
    FROM bfs GROUP BY v
    """,
)
def ext_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 — bounded breadth-first search from the smallest vertex of the
    (sparsified) co-purchase graph: the iterative frontier-join dataflow
    (the Pregel loop beside ext_pagerank_step and the dup-cluster
    min-label propagation) with per-round min-distance dedup and
    localCheckpoint lineage truncation — the scalable form. The oracle is
    an INDEPENDENT bounded WITH RECURSIVE path enumeration whose MIN(d)
    per vertex equals the BFS distance.

    Scale: per round, one frontier⋈edges shuffle + one min groupBy; the
    frontier-dedup is what keeps dense graphs from exploding the way the
    oracle's path enumeration would."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("x"), li.alias("y")
    half = (
        a.join(
            b,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .where(F.col("x.l_orderkey") % _BFS_ORDER_MOD == 0)
        .select(
            F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b")
        )
        .distinct()
    )
    eu = half.unionAll(
        half.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint()
    src = eu.agg(F.min("a")).collect()[0][0]  # bounded 1-value artifact
    dist = spark.createDataFrame([(int(src), 0)], "v long, d long")
    for it in range(1, BFS_DEPTH + 1):
        frontier = dist.where(F.col("d") == it - 1)
        nxt = frontier.join(eu, frontier["v"] == eu["a"]).select(
            eu["b"].alias("v"), F.lit(it).cast("long").alias("d")
        )
        dist = (
            dist.unionByName(nxt)
            .groupBy("v")
            .agg(F.min("d").alias("d"))
            .localCheckpoint()
        )
    return dist.select("v", F.col("d").alias("dist"))
