"""Water-filling mix allocation: hand-computed closed form, budget
conservation, cap saturation, and the degenerate over-budget branch.
Cross-engine parity for the registered query runs in
test_oracle_parity.py (auto-parametrized over the registry)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_data_warehouse_and_analytics_project_spark.operators import waterfill


def _per_source(spark, rows):
    return spark.createDataFrame(rows, "source string, w long, c long")


def test_waterfill_hand_computed(spark):
    """A(w=1,c=10) caps out, lambda lands in B's segment: level 65,
    allocations (10, 65, 130) summing exactly to the 205 budget."""
    ps = _per_source(spark, [("A", 1, 10), ("B", 1, 100), ("C", 2, 300)])
    got = {r["source"]: r for r in waterfill.waterfill_allocations(ps, 205).collect()}
    assert got["A"]["alloc_chars"] == 10.0 and got["A"]["at_cap"]
    assert got["B"]["alloc_chars"] == 65.0 and not got["B"]["at_cap"]
    assert got["C"]["alloc_chars"] == 130.0 and not got["C"]["at_cap"]
    assert sum(r["alloc_chars"] for r in got.values()) == 205.0


def test_waterfill_over_budget_takes_everything(spark):
    """B >= sum(c): no valid water level -> every source fully taken."""
    ps = _per_source(spark, [("A", 1, 10), ("B", 3, 20)])
    got = {r["source"]: r for r in waterfill.waterfill_allocations(ps, 1000).collect()}
    assert got["A"]["alloc_chars"] == 10.0 and got["A"]["at_cap"]
    assert got["B"]["alloc_chars"] == 20.0 and got["B"]["at_cap"]


def test_waterfill_uncapped_proportional(spark):
    """Budget small enough that nobody caps: pure proportional split."""
    ps = _per_source(spark, [("A", 1, 1000), ("B", 3, 1000)])
    got = {r["source"]: r for r in waterfill.waterfill_allocations(ps, 400).collect()}
    assert got["A"]["alloc_chars"] == 100.0 and not got["A"]["at_cap"]
    assert got["B"]["alloc_chars"] == 300.0 and not got["B"]["at_cap"]


def test_waterfill_registered_query_conserves_budget(spark):
    """The registered corpus query: allocations sum to the DIV-2 budget
    (6-dp rounding slack only) and every at_cap row equals its cap."""
    sf = "/root/testdata/sf0.001"
    out = waterfill.mix_waterfill_chars(spark, sf).collect()
    assert out
    from sql_data_warehouse_and_analytics_project_spark.sources import tpch

    total = tpch.load(spark, sf, "documents").agg(F.sum("n_chars")).first()[0]
    budget = total // waterfill._BUDGET_DEN
    alloc = sum(r["alloc_chars"] for r in out)
    assert abs(alloc - budget) <= 1e-2 * len(out) or all(r["at_cap"] for r in out)
    for r in out:
        if r["at_cap"]:
            assert r["alloc_chars"] == float(r["chars_avail"])
        assert r["alloc_chars"] <= r["chars_avail"] + 1e-9
