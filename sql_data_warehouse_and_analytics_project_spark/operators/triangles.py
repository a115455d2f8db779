"""Triangle counting + global clustering coefficient, degree-oriented.

Graph audits show up throughout the curation tier (how clumpy is the
dedup-pair graph? is the co-occurrence graph one hairball or real
communities?) and the core primitive is the triangle count. The naive
3-way join counts every triangle 6 times and explodes on hubs; the
canonical scalable form (Cohen 2009; Suri & Vassilvitskii, "Counting
Triangles and the Curse of the Last Reducer", WWW 2011) ORIENTS every
edge from its (degree, id)-smaller endpoint to the larger, making the
graph a DAG where each triangle survives as exactly ONE wedge+closure:
out-degrees are bounded by O(sqrt(m)), so the wedge join does O(m^1.5)
work total regardless of hub skew — the hub's million neighbors produce
wedges at the hub's (tiny) OUT-degree, not its total degree.

Plan shape (100 TB): edge list → per-endpoint degree annotate (two equi
joins — no global rank/sort; orientation is the LEXICOGRAPHIC (deg, id)
tuple comparison evaluated row-wise, so there is no single-partition
window anywhere) → wedge self-join on the oriented source → semi-join
against the oriented edge set to close. Every join is an equi join on a
node key; AQE handles residual skew.

Graph here: the part co-purchase graph (parts appearing in >=
``min_support`` common orders — the basket-affinity graph the olap tier
already scores pairwise). All outputs are exact bigints except the one
final rounded ratio, so DuckDB replays the whole chain.

No reference counterpart — graph-analytics extension (public algorithm).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch


def copurchase_edges(lineitem: DataFrame, min_support: int = 2) -> DataFrame:
    """(a, b) undirected edges, a < b: part pairs sharing >= min_support
    distinct orders."""
    l1 = lineitem.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("a"))
    l2 = lineitem.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("b"))
    return (
        l1.join(l2, "o")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count_distinct("o").alias("sup"))
        .filter(F.col("sup") >= min_support)
        .select("a", "b")
    )


def _tuple_lt(deg_x: Column, x: Column, deg_y: Column, y: Column) -> Column:
    """(deg_x, x) < (deg_y, y) lexicographically — the total order that
    orients edges without any global rank materialization."""
    return (deg_x < deg_y) | ((deg_x == deg_y) & (x < y))


def triangle_stats(edges: DataFrame) -> DataFrame:
    """One row (n_nodes, n_edges, n_wedges, n_triangles, transitivity)
    for an undirected simple graph given as (a, b) edges with a < b.
    transitivity = 3·triangles / wedges (global clustering coefficient),
    null on a wedge-free graph."""
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )
    ed = (
        edges.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
    )
    a_first = _tuple_lt(F.col("da"), F.col("a"), F.col("db"), F.col("b"))
    oriented = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("ddst"),
    )
    o1 = oriented.select(
        F.col("src"), F.col("dst").alias("v"), F.col("ddst").alias("dv")
    )
    o2 = oriented.select(
        F.col("src"), F.col("dst").alias("w"), F.col("ddst").alias("dw")
    )
    # each unordered out-wedge {v, w} at src is generated ONCE, already
    # oriented by the same (deg, id) order as the edges — so the closing
    # edge, if it exists, is exactly the oriented row (v, w)
    wedges = (
        o1.join(o2, "src")
        .filter(_tuple_lt(F.col("dv"), F.col("v"), F.col("dw"), F.col("w")))
        .select(F.col("v").alias("src"), F.col("w").alias("dst"))
    )
    tri = wedges.join(
        oriented.select("src", "dst"), ["src", "dst"], "left_semi"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    stats = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum(F.expr("(deg * (deg - 1)) div 2")).cast("bigint").alias("n_wedges"),
    ).crossJoin(edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges")))
    return stats.crossJoin(tri).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.round(
            F.lit(3.0)
            * F.col("n_triangles").cast("double")
            / F.nullif(F.col("n_wedges").cast("double"), F.lit(0.0)),
            6,
        ).alias("transitivity"),
    )


_TRI_SQL = """
WITH edges AS MATERIALIZED (
  SELECT a, b FROM (
    SELECT l1.l_partkey AS a, l2.l_partkey AS b,
           COUNT(DISTINCT l1.l_orderkey) AS sup
    FROM lineitem l1 JOIN lineitem l2
      ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    GROUP BY l1.l_partkey, l2.l_partkey
  ) WHERE sup >= 2
),
deg AS MATERIALIZED (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT a AS node FROM edges UNION ALL SELECT b FROM edges
  ) GROUP BY node
),
oriented AS MATERIALIZED (
  SELECT CASE WHEN (x.deg < y.deg) OR (x.deg = y.deg AND a < b) THEN a ELSE b END AS src,
         CASE WHEN (x.deg < y.deg) OR (x.deg = y.deg AND a < b) THEN b ELSE a END AS dst,
         CASE WHEN (x.deg < y.deg) OR (x.deg = y.deg AND a < b) THEN y.deg ELSE x.deg END AS ddst
  FROM edges e
  JOIN deg x ON x.node = e.a
  JOIN deg y ON y.node = e.b
),
wedges AS (
  SELECT o1.dst AS src, o2.dst AS dst
  FROM oriented o1 JOIN oriented o2
    ON o1.src = o2.src
   AND ((o1.ddst < o2.ddst) OR (o1.ddst = o2.ddst AND o1.dst < o2.dst))
),
tri AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM wedges w
  WHERE EXISTS (SELECT 1 FROM oriented o WHERE o.src = w.src AND o.dst = w.dst)
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM((deg * (deg - 1)) // 2) AS BIGINT) AS n_wedges
  FROM deg
),
ecnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM edges)
SELECT a.n_nodes, e.n_edges, a.n_wedges, t.n_triangles,
       ROUND(3.0 * t.n_triangles / NULLIF(CAST(a.n_wedges AS DOUBLE), 0.0), 6) AS transitivity
FROM agg a, ecnt e, tri t
"""


@query("graph_triangle_count", oracle=_TRI_SQL, defer=True)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the part co-purchase graph (support >= 2):
    node/edge/wedge counts, the degree-oriented exact triangle count,
    and the global clustering coefficient — DuckDB replays the edge
    build, the (deg, id) orientation, and the wedge closure."""
    li = tpch.load(spark, sf_dir, "lineitem")
    return triangle_stats(copurchase_edges(li, min_support=2))
