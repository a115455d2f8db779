"""Degree-oriented triangle counting: exact counts vs brute-force
enumeration on crafted and pseudo-random graphs, and the plan stays
equi-join-only (the orientation must not introduce a cartesian)."""

from __future__ import annotations

import itertools

from sql_data_warehouse_and_analytics_project_spark.operators.triangles import (
    triangle_stats,
)


def _brute(edges):
    es = {tuple(sorted(e)) for e in edges}
    nodes = sorted({n for e in es for n in e})
    tri = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in es and (a, c) in es and (b, c) in es
    )
    deg = {n: sum(1 for e in es if n in e) for n in nodes}
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    return len(nodes), len(es), wedges, tri


def _stats(spark, edges):
    df = spark.createDataFrame(
        [tuple(sorted(e)) for e in edges], "a bigint, b bigint"
    ).distinct()
    return triangle_stats(df).collect()[0]


def test_triangles_k4_plus_tail(spark):
    """K4 (4 triangles) with a pendant path: counts hand-checkable."""
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    r = _stats(spark, edges)
    n, m, w, t = _brute(edges)
    assert (r["n_nodes"], r["n_edges"], r["n_wedges"], r["n_triangles"]) == (n, m, w, t)
    assert r["n_triangles"] == 4
    assert abs(r["transitivity"] - round(3 * t / w, 6)) < 1e-12


def test_triangles_hub_graph_matches_bruteforce(spark):
    """A hub star plus deterministic chords — the degree orientation must
    count each triangle exactly once despite the hub's fan-in."""
    edges = [(0, i) for i in range(1, 40)]  # hub 0
    edges += [(i, i + 1) for i in range(1, 39)]  # ring chords -> triangles at hub
    edges += [(3, 9), (9, 27), (3, 27)]  # off-hub triangle
    r = _stats(spark, edges)
    n, m, w, t = _brute(edges)
    assert (r["n_nodes"], r["n_edges"], r["n_wedges"], r["n_triangles"]) == (n, m, w, t)
    assert t >= 39  # the 38 hub triangles + off-hub ones


def test_triangles_pseudorandom_matches_bruteforce(spark):
    """60-node deterministic pseudo-random graph vs enumeration."""
    edges = [
        (a, b)
        for a in range(60)
        for b in range(a + 1, 60)
        if (a * 7919 + b * 104729 + a * b) % 11 == 0
    ]
    r = _stats(spark, edges)
    n, m, w, t = _brute(edges)
    assert (r["n_nodes"], r["n_edges"], r["n_wedges"], r["n_triangles"]) == (n, m, w, t)
    assert t > 0


def test_triangle_plan_no_cartesian(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "a bigint, b bigint")
    plan = triangle_stats(edges)._jdf.queryExecution().executedPlan().toString()
    # the two scalar-aggregate combines are 1-row cross joins by design;
    # the graph-sized joins must all be equi joins
    assert "CartesianProduct" not in plan
