"""Benford first-digit audit semantics."""

from __future__ import annotations

import math

from sql_data_warehouse_and_analytics_project_spark.operators import olap_extras as ox


def _amounts(spark, values):
    rows = [(i, float(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "rid bigint, amount double")


def test_first_digit_across_magnitudes(spark):
    got = {r["digit"]: r["n"] for r in
           ox.benford_digits(_amounts(spark, [1.2, 95.0, 1320.51, 9.99, 20000.0, 2.5]), "amount").collect()}
    assert got == {1: 2, 9: 2, 2: 2}


def test_chi_term_hand_computed(spark):
    """60 ones + 40 twos: e1 = 100·log10(2), e2 = 100·log10(1.5);
    chi terms match the closed form."""
    vals = [1.0] * 60 + [2.0] * 40
    got = {r["digit"]: r for r in ox.benford_digits(_amounts(spark, vals), "amount").collect()}
    e1 = 100 * math.log10(2.0)
    e2 = 100 * math.log10(1.5)
    assert got[1]["chi_term"] == round((60 - e1) ** 2 / e1, 6)
    assert got[2]["chi_term"] == round((40 - e2) ** 2 / e2, 6)
    assert got[1]["obs_share"] == 0.6 and got[2]["obs_share"] == 0.4


def test_benford_distributed_data_scores_low(spark):
    """Counts planted AT the Benford proportions: every chi term ≈ 0 —
    the detector passes clean data."""
    vals = []
    for d in range(1, 10):
        vals += [float(d)] * round(10000 * math.log10(1 + 1 / d))
    got = ox.benford_digits(_amounts(spark, vals), "amount").collect()
    assert len(got) == 9
    for r in got:
        assert r["chi_term"] < 0.05, (r["digit"], r["chi_term"])


def test_gini_hand_computed_extremes(spark):
    """Perfect equality → 0; one customer holding everything → (n−1)/n."""
    from pyspark.sql import functions as F

    def run(rows):
        df = spark.createDataFrame(rows, "nation string, k bigint, cents bigint")
        [r] = ox.gini_by_group(df, "nation", "k", F.col("cents")).collect()
        return r["gini"]

    assert run([("x", i, 100) for i in range(5)]) == 0.0
    # x = [0,0,0,0,1000]: G = (2·(5·1000))/(5·1000) − 6/5 = 0.8 = (n−1)/n
    assert run([("x", i, 0) for i in range(4)] + [("x", 9, 1000)]) == 0.8
    # hand case [1,2,3,4]: Σi·x = 1+4+9+16 = 30; G = 60/40 − 5/4 = 0.25
    assert run([("x", i, v) for i, v in enumerate([1, 2, 3, 4])]) == 0.25


def test_hll_overlap_planted_disjoint_and_identical(spark):
    """Identical vocabularies → jaccard_est ≈ 1; disjoint → ≈ 0 (sketch
    noise only, within the ~1.6% HLL rsd at 4096 registers)."""
    from sql_data_warehouse_and_analytics_project_spark.operators import approx

    rows = []
    for i in range(400):
        rows.append(("a", f"tok{i}"))
        rows.append(("b", f"tok{i}"))          # identical to a
        rows.append(("c", f"other{i}"))        # disjoint from both
    vals = spark.createDataFrame(rows, "source string, term string")
    got = {(r["source_a"], r["source_b"]): r for r in
           approx.hll_overlap_pairs(vals, "source", "term").collect()}
    ab = got[("a", "b")]
    assert ab["jaccard_est"] == 1.0 and ab["est_union"] == ab["est_a"]
    ac = got[("a", "c")]
    assert abs(ac["jaccard_est"]) < 0.05
    # union of disjoint 400+400 within 5% of 800
    assert abs(ac["est_union"] - 800) / 800 < 0.05


def test_mass_concentration_hand_computed(spark):
    """10 docs, one giant: top decile = ceil(10/10) = 1 doc = the giant;
    4 docs → ceil(4/10) = 1 doc even for tiny groups."""
    from sql_data_warehouse_and_analytics_project_spark.operators import composition as cp

    rows = [(i, "s1", "x" * (100 if i == 0 else 10)) for i in range(10)]
    rows += [(100 + i, "s2", "y" * 20) for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    got = {r["source"]: r for r in cp.mass_concentration(docs).collect()}
    s1 = got["s1"]
    assert (s1["n_docs"], s1["chars_total"], s1["chars_top_decile"]) == (10, 190, 100)
    assert s1["top_decile_share"] == round(100 / 190, 6)
    s2 = got["s2"]
    assert (s2["chars_top_decile"], s2["top_decile_share"]) == (20, 0.25)


def test_basket_affinity_hand_computed(spark):
    """4 orders, pair (A,B) in two of them: support 0.5, confidence 2/3,
    lift 8/9; a part repeated within one order counts once."""
    from sql_data_warehouse_and_analytics_project_spark.operators import olap_extras as ox2

    rows = [
        (1, 10), (1, 20), (1, 10),   # duplicate part 10 in order 1
        (2, 10), (2, 20),
        (3, 10), (3, 30),
        (4, 20), (4, 40),
    ]
    li = spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint")
    got = {(r["part_a"], r["part_b"]): r for r in ox2.basket_affinity(li).collect()}
    ab = got[(10, 20)]
    assert ab["pair_orders"] == 2 and ab["orders_a"] == 3 and ab["orders_b"] == 3
    assert ab["support"] == 0.5
    assert ab["confidence_a_to_b"] == round(2 / 3, 6)
    assert ab["lift"] == round(8 / 9, 6)
