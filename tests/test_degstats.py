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


def test_abc_parts_planted_distribution_and_tie_class_sharing(spark):
    """ABC on a planted revenue set replayed in python (boundary rule: a
    distinct-revenue GROUP is A if it starts strictly before the 80%
    boundary, B before 95%); equal-revenue parts must land in the same
    class even when a per-part rank would straddle a boundary."""
    from sql_data_warehouse_and_analytics_project_spark.operators.olap_extras import (
        abc_parts,
    )

    # part -> unit revenue; parts 3/4 tie at 100 and straddle 80% if
    # ranked per-part (cum 60% -> 80% -> 100% in 20% steps)
    revs = {1: 300.0, 2: 300.0, 3: 100.0, 4: 100.0, 5: 120.0, 6: 40.0, 7: 40.0}
    rows = [
        (pk, rev, 0.0)
        for pk, rev in revs.items()
    ]
    li = spark.createDataFrame(rows, "l_partkey bigint, l_extendedprice double, l_discount double")
    got = {r["abc_class"]: (r["n_parts"], r["revenue"]) for r in abc_parts(li).collect()}

    # python replay: groups by distinct revenue desc
    total = sum(revs.values())
    groups = {}
    for pk, rev in revs.items():
        groups.setdefault(rev, []).append(pk)
    cum = 0.0
    want = {}
    for rev in sorted(groups, reverse=True):
        parts = groups[rev]
        klass = "A" if cum * 100 < total * 80 else ("B" if cum * 100 < total * 95 else "C")
        n, r = want.get(klass, (0, 0.0))
        want[klass] = (n + len(parts), r + rev * len(parts))
        cum += rev * len(parts)
    assert got == {k: (n, round(r, 2)) for k, (n, r) in want.items()}
    # the tie pair (parts 3,4) shares one class
    assert sum(n for n, _ in got.values()) == 7
