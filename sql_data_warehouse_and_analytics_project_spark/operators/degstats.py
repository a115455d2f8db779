"""Degree distribution + Hill power-law tail estimator for the
co-purchase graph.

The graph tier (triangles, pagerank, components, k-core) characterizes
STRUCTURE; pipelines also need the degree DISTRIBUTION — the first
question about any behavioral graph is "how heavy is the tail?", because
hub-dominated graphs break per-node fan-out assumptions (the hot-key
salting/capping decisions elsewhere in this repo). The standard tail
readout is the Hill estimator (Hill 1975) of the power-law exponent over
degrees ≥ d_min:

    α̂ = 1 + n_tail / Σ_{d_i ≥ d_min} ln(d_i / d_min)

Engine discipline: degrees and the histogram are exact bigints (one
groupBy each); the Hill sum folds ln(deg/d_min) per HISTOGRAM row
(n_nodes · ln(deg/d_min) — the per-distinct-degree collapse makes the
libm call count bounded by max degree, not node count) with a mirrored
parenthesization; ln is the one libm call (the BH/perplexity tolerance
class). Output is the degree histogram (bounded by max degree) with the
global α̂ and tail size on every row. No windows anywhere — plain
aggregations and one broadcast 1-row join.

No reference counterpart — graph-analytics extension (public method).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch

_MIN_SUPPORT = 2
_D_MIN = 2  # Hill tail cut: degrees >= 2


def degree_stats(edges: DataFrame) -> DataFrame:
    """(deg, n_nodes, share, n_tail, alpha_hill) from an (a, b) edge
    list: the exact degree histogram plus the Hill tail exponent."""
    degrees = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )
    hist = degrees.groupBy("deg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    tail_term = F.when(
        F.col("deg") >= _D_MIN,
        d("n_nodes") * F.log(d("deg") / F.lit(float(_D_MIN))),
    ).otherwise(F.lit(0.0))
    tot = F.broadcast(
        hist.agg(
            F.sum("n_nodes").cast("bigint").alias("n_total"),
            F.sum(
                F.when(F.col("deg") >= _D_MIN, F.col("n_nodes")).otherwise(0)
            ).cast("bigint").alias("n_tail"),
            F.sum(tail_term).alias("log_sum"),
        )
    )
    alpha = F.lit(1.0) + d("n_tail") / F.nullif(F.col("log_sum"), F.lit(0.0))
    return (
        hist.crossJoin(tot)
        .select(
            F.col("deg").cast("bigint").alias("deg"),
            "n_nodes",
            F.round(d("n_nodes") / d("n_total"), 6).alias("share"),
            "n_tail",
            F.round(alpha, 6).alias("alpha_hill"),
        )
        .orderBy("deg")
    )


_CO_EDGES_SQL = f"""
  SELECT a, b FROM (
    SELECT l1.l_partkey AS a, l2.l_partkey AS b,
           COUNT(DISTINCT l1.l_orderkey) AS sup
    FROM lineitem l1 JOIN lineitem l2
      ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    GROUP BY l1.l_partkey, l2.l_partkey
  ) WHERE sup >= {_MIN_SUPPORT}
"""

_DEGSTATS_SQL = f"""
WITH edges AS ({_CO_EDGES_SQL}),
degrees AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM
  (SELECT a AS node FROM edges UNION ALL SELECT b FROM edges) GROUP BY node
),
hist AS (
  SELECT deg, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM degrees GROUP BY deg
),
tot AS (
  SELECT CAST(SUM(n_nodes) AS BIGINT) AS n_total,
         CAST(SUM(CASE WHEN deg >= {_D_MIN} THEN n_nodes ELSE 0 END) AS BIGINT) AS n_tail,
         SUM(CASE WHEN deg >= {_D_MIN}
                  THEN CAST(n_nodes AS DOUBLE) * LN(CAST(deg AS DOUBLE) / {float(_D_MIN)})
                  ELSE 0.0 END) AS log_sum
  FROM hist
)
SELECT CAST(h.deg AS BIGINT) AS deg,
       h.n_nodes,
       ROUND(CAST(h.n_nodes AS DOUBLE) / CAST(t.n_total AS DOUBLE), 6) AS share,
       t.n_tail,
       ROUND(1.0 + CAST(t.n_tail AS DOUBLE) / NULLIF(t.log_sum, 0.0), 6) AS alpha_hill
FROM hist h, tot t
ORDER BY deg
"""


@query("graph_degree_stats", oracle=_DEGSTATS_SQL)
def graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact degree histogram of the part co-purchase graph with the
    Hill power-law tail exponent — the hub-heaviness readout beside
    k-core/triangles/pagerank. DuckDB replays the edge build, the
    histogram, and the per-distinct-degree Hill fold."""
    from .triangles import copurchase_edges

    return degree_stats(
        copurchase_edges(tpch.load(spark, sf_dir, "lineitem"), _MIN_SUPPORT)
    )


# --- degree assortativity (r18) ------------------------------------------------
#
# Newman 2002 (PRL 89.208701): the Pearson correlation of the degrees at
# the two ends of an edge. Positive = hubs link to hubs (social-style),
# negative = hub-and-spoke (technological/catalog-style) — together with
# the Hill exponent this pins down WHERE the heavy tail sits in the
# topology, which decides whether hot-key mitigation needs per-hub
# caps (disassortative) or whole-community salting (assortative).
#
# Exactness: with undirected edges counted once, r derives from four
# exact sums over the degree-joined edge list — M, Σjk, Σ(j+k),
# Σ(j²+k²) (products in decimal(38,0)) — and doubles appear only in the
# final closed form, so both engines compute identical values with no
# libm at all. Two broadcast-joinable degree lookups + one aggregate.


def assortativity(edges: DataFrame) -> DataFrame:
    """One row (n_nodes, n_edges, mean_deg, assortativity) from an
    (a, b) undirected edge list (each edge once, a < b)."""
    degrees = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )
    da = degrees.select(F.col("node").alias("a"), F.col("deg").alias("ja"))
    db = degrees.select(F.col("node").alias("b"), F.col("deg").alias("jb"))
    j = edges.join(da, "a").join(db, "b")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum(dec("ja") * F.col("jb")).alias("s_jk"),
        F.sum(F.col("ja") + F.col("jb")).cast("decimal(38,0)").alias("s_sum"),
        F.sum(dec("ja") * F.col("ja") + dec("jb") * F.col("jb")).alias("s_sq"),
    )
    nodes = degrees.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum("deg").cast("bigint").alias("deg_total"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mu = d("s_sum") / (F.lit(2.0) * d("m"))
    num = d("s_jk") / d("m") - mu * mu
    den = d("s_sq") / (F.lit(2.0) * d("m")) - mu * mu
    return (
        F.broadcast(nodes)
        .crossJoin(agg)
        .select(
            "n_nodes",
            F.col("m").alias("n_edges"),
            F.round(d("deg_total") / F.nullif(d("n_nodes"), F.lit(0.0)), 6).alias(
                "mean_deg"
            ),
            F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("assortativity"),
        )
    )


_ASSORT_SQL = f"""
WITH edges AS ({_CO_EDGES_SQL}),
degrees AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM
  (SELECT a AS node FROM edges UNION ALL SELECT b FROM edges) GROUP BY node
),
joined AS (
  SELECT da.deg AS ja, db.deg AS jb
  FROM edges e JOIN degrees da ON e.a = da.node JOIN degrees db ON e.b = db.node
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         SUM(CAST(ja AS HUGEINT) * jb) AS s_jk,
         CAST(SUM(ja + jb) AS HUGEINT) AS s_sum,
         SUM(CAST(ja AS HUGEINT) * ja + CAST(jb AS HUGEINT) * jb) AS s_sq
  FROM joined
),
nodes AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(deg) AS BIGINT) AS deg_total
  FROM degrees
)
SELECT n_nodes, m AS n_edges,
       ROUND(CAST(deg_total AS DOUBLE) / NULLIF(CAST(n_nodes AS DOUBLE), 0.0), 6) AS mean_deg,
       ROUND((CAST(s_jk AS DOUBLE) / CAST(m AS DOUBLE)
              - (CAST(s_sum AS DOUBLE) / (2.0 * CAST(m AS DOUBLE)))
                * (CAST(s_sum AS DOUBLE) / (2.0 * CAST(m AS DOUBLE))))
             / NULLIF(CAST(s_sq AS DOUBLE) / (2.0 * CAST(m AS DOUBLE))
              - (CAST(s_sum AS DOUBLE) / (2.0 * CAST(m AS DOUBLE)))
                * (CAST(s_sum AS DOUBLE) / (2.0 * CAST(m AS DOUBLE))), 0.0), 6) AS assortativity
FROM nodes, agg
"""


@query("graph_assortativity", oracle=_ASSORT_SQL, defer=True)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002) of the part co-purchase graph
    — hubs-to-hubs vs hub-and-spoke, the topology readout beside the
    Hill tail. Exact integer sums, zero libm. DuckDB replays the edge
    build, the degree joins, and the closed form."""
    from .triangles import copurchase_edges

    return assortativity(
        copurchase_edges(tpch.load(spark, sf_dir, "lineitem"), _MIN_SUPPORT)
    )
