"""Weighted PageRank (r11): conservation, hub detection, fold modes.

Cross-engine trajectory parity is pinned by the DuckDB oracle
(tests/test_oracle_parity.py::[graph_pagerank_trade]).
"""

from __future__ import annotations

from sql_data_warehouse_and_analytics_project_spark.operators import pagerank as pr


def _star_graph(spark, spokes=10):
    """Hub h connected to every spoke (heavy, w=5) + a weak ring among
    the spokes (w=1). Symmetric, closed under reversal."""
    rows = []
    for i in range(spokes):
        rows += [("h", f"n{i}", 5.0), (f"n{i}", "h", 5.0)]
        j = (i + 1) % spokes
        rows += [(f"n{i}", f"n{j}", 1.0), (f"n{j}", f"n{i}", 1.0)]
    return spark.createDataFrame(rows, "src string, dst string, w double")


def test_pagerank_mass_conserved_and_hub_wins(spark):
    edges = _star_graph(spark)
    got = pr.pagerank(edges, iters=6).collect()
    total = sum(r["rank"] for r in got)
    # symmetric graph, no dangling: mass conserved up to 6dp output rounding
    assert abs(total - 1.0) < 1e-4, total
    top = max(got, key=lambda r: r["rank"])
    assert top["node"] == "h", got
    # spokes are symmetric to each other: identical ranks
    spoke_ranks = {r["rank"] for r in got if r["node"] != "h"}
    assert len(spoke_ranks) == 1, spoke_ranks


def test_pagerank_scale_fold_matches_parity_fold(spark):
    edges = _star_graph(spark, spokes=7)
    a = {r["node"]: r["rank"] for r in pr.pagerank(edges, fold="parity").collect()}
    b = {r["node"]: r["rank"] for r in pr.pagerank(edges, fold="scale").collect()}
    assert set(a) == set(b)
    assert all(abs(a[k] - b[k]) <= 1e-6 for k in a), (a, b)


def test_pagerank_uniform_on_regular_graph(spark):
    """On a regular symmetric graph (pure ring, equal weights) PageRank
    is exactly uniform at every iteration — a closed-form pin."""
    n = 8
    rows = []
    for i in range(n):
        j = (i + 1) % n
        rows += [(f"n{i}", f"n{j}", 1.0), (f"n{j}", f"n{i}", 1.0)]
    edges = spark.createDataFrame(rows, "src string, dst string, w double")
    got = pr.pagerank(edges, iters=4).collect()
    assert len(got) == n
    assert {r["rank"] for r in got} == {0.125}, got
