"""Pareto-front skyline: equals the brute-force dominance check, is
bucketing-invariant, keeps incomparable ties, and the bucketed plan
stays free of graph-sized cartesians."""

from __future__ import annotations

from sql_data_warehouse_and_analytics_project_spark.operators.skyline import (
    doc_objectives,
    pareto_front,
)


def _brute(points):
    def dom(b, a):
        ge = b[1] >= a[1] and b[2] >= a[2] and b[3] <= a[3]
        strict = b[1] > a[1] or b[2] > a[2] or b[3] < a[3]
        return ge and strict

    return {
        a[0]
        for a in points
        if not any(dom(b, a) for b in points if b[0] != a[0])
    }


def _pts(spark, points):
    return spark.createDataFrame(
        points, "doc_id bigint, n_chars bigint, n_distinct bigint, top_freq bigint"
    )


def test_skyline_crafted_and_ties():
    # crafted: 1 dominates 2; 3 incomparable; 4 and 5 are equal tuples
    # (both stay: strict dominance never holds between equals)
    pts = [
        (1, 100, 50, 2),
        (2, 90, 40, 3),    # dominated by 1
        (3, 50, 80, 1),    # incomparable with 1
        (4, 100, 50, 5),   # dominated by 1 (same chars/distinct, worse freq)
        (5, 60, 60, 4),
        (6, 60, 60, 4),    # exact tie with 5 -> both survive iff undominated
    ]
    assert _brute(pts) == {1, 3, 5, 6}


def test_skyline_matches_bruteforce_and_bucket_invariant(spark):
    points = [
        (i, (i * 37) % 101, (i * 61) % 97, (i * 13) % 23 + 1) for i in range(300)
    ]
    expected = _brute(points)
    got32 = {r["doc_id"] for r in pareto_front(_pts(spark, points), n_buckets=32).collect()}
    got1 = {r["doc_id"] for r in pareto_front(_pts(spark, points), n_buckets=1).collect()}
    got7 = {r["doc_id"] for r in pareto_front(_pts(spark, points), n_buckets=7).collect()}
    assert got32 == expected
    assert got1 == expected and got7 == expected


def test_doc_objectives_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a b a c a", 9), (2, "x y", 3)],
        "doc_id bigint, text string, n_chars bigint",
    )
    got = {r["doc_id"]: (r["n_chars"], r["n_distinct"], r["top_freq"])
           for r in doc_objectives(docs).collect()}
    assert got == {1: (9, 3, 3), 2: (3, 2, 1)}


def test_skyline_plan_no_cartesian(spark):
    pts = _pts(spark, [(1, 1, 1, 1), (2, 2, 2, 2)])
    plan = pareto_front(pts)._jdf.queryExecution().executedPlan().toString()
    # phase 1 joins on the bucket key; phase 2 is a broadcast theta join
    # over the candidate set — neither may degrade to CartesianProduct
    assert "CartesianProduct" not in plan
