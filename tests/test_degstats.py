"""Degree stats: exact histogram on a planted graph and the Hill
estimator against a pure-python replay (including the tail cut)."""

from __future__ import annotations

import math

from sql_data_warehouse_and_analytics_project_spark.operators.degstats import (
    _D_MIN,
    degree_stats,
)


def _mk(spark, edges):
    return spark.createDataFrame(sorted(edges), "a bigint, b bigint")


def test_degree_stats_planted_star_plus_path(spark):
    """A 6-leaf star (hub deg 6, leaves deg 1) plus a disjoint 4-path
    (ends deg 1, middles deg 2): histogram and Hill replayed in python."""
    star = {(1, i) for i in range(2, 8)}
    path = {(10, 11), (11, 12), (12, 13)}
    rows = degree_stats(_mk(spark, star | path)).collect()
    got = {r["deg"]: r["n_nodes"] for r in rows}
    assert got == {1: 8, 2: 2, 6: 1}  # 6 leaves + 2 path ends; 2 middles; hub

    degs = [1] * 8 + [2] * 2 + [6]
    tail = [d for d in degs if d >= _D_MIN]
    alpha = 1.0 + len(tail) / sum(math.log(d / _D_MIN) for d in tail)
    n = len(degs)
    for r in rows:
        assert r["n_tail"] == len(tail)
        assert abs(r["alpha_hill"] - round(alpha, 6)) <= 1e-6
        assert r["share"] == round(got[r["deg"]] / n, 6)


def test_degree_stats_all_below_tail_cut_yields_null_alpha(spark):
    """A perfect matching (every degree 1 < d_min): log_sum = 0 → the
    NULLIF guard makes alpha NULL, never a division error."""
    rows = degree_stats(_mk(spark, {(1, 2), (3, 4), (5, 6)})).collect()
    assert [(r["deg"], r["n_nodes"]) for r in rows] == [(1, 6)]
    assert rows[0]["n_tail"] == 0 and rows[0]["alpha_hill"] is None
