"""Planted-scenario properties for the r18 statistics generation:
TOST equivalence, burstiness, HHI, Theil, assortativity, Zipf fit,
Simpson diversity, Dirichlet query likelihood. Each operator is driven
on a constructed input whose answer is known in closed form (or
computed by an independent pure-python replay), so the oracle-parity
checks are backed by semantic ground truth, not just cross-engine
agreement."""

from __future__ import annotations

import math
from datetime import datetime as dt, timedelta

import pytest
from pyspark.sql import functions as F


# --- TOST ---------------------------------------------------------------------


def _events_for_conv(spark, conv_by_user):
    """events rows giving each user one view plus (optionally) one
    purchase — conversion is per-user MAX(purchase)."""
    rows = []
    eid = 0
    t0 = dt(2024, 5, 1)
    for uid, conv in conv_by_user:
        eid += 1
        rows.append((eid, t0, uid, "view", 0.0, "{}"))
        if conv:
            eid += 1
            rows.append((eid, t0 + timedelta(minutes=1), uid, "purchase", 1.0, "{}"))
    from sql_data_warehouse_and_analytics_project_spark.streaming.jobs import (
        EVENTS_SCHEMA,
    )

    return spark.createDataFrame(rows, schema=EVENTS_SCHEMA)


def _md5_arm(uid: int) -> int:
    import hashlib

    return int(hashlib.md5(str(uid).encode()).hexdigest()[:13], 16) % 2


def test_tost_identical_arms_declare_equivalence(spark):
    """Two arms with the SAME conversion rate and plenty of units must
    pass TOST at the ±2pp margin; the p-values and z's must match a
    pure-python replay of the closed form."""
    from sql_data_warehouse_and_analytics_project_spark.operators.abtest import (
        _TOST_DELTA,
        tost_equivalence,
    )

    # exactly every 10th user WITHIN each md5 arm converts, so the two
    # arm rates are equal by construction (a uid-pattern rule would leak
    # a deterministic md5-correlated imbalance comparable to the margin)
    seen = {0: 0, 1: 0}
    users = []
    for uid in range(1, 10001):
        arm = _md5_arm(uid)
        seen[arm] += 1
        users.append((uid, seen[arm] % 10 == 0))
    ev = _events_for_conv(spark, users)
    [r] = tost_equivalence(ev).collect()

    n1 = sum(1 for uid, _ in users if _md5_arm(uid) == 1)
    n0 = len(users) - n1
    x1 = sum(1 for uid, c in users if c and _md5_arm(uid) == 1)
    x0 = sum(1 for uid, c in users if c and _md5_arm(uid) == 0)
    p1, p0 = x1 / n1, x0 / n0
    se = math.sqrt(p1 * (1 - p1) / n1 + p0 * (1 - p0) / n0)
    z_lo = (p1 - p0 + _TOST_DELTA) / se
    z_up = (p1 - p0 - _TOST_DELTA) / se
    assert r["n_treat"] == n1 and r["n_ctrl"] == n0
    assert r["z_lower"] == round(z_lo, 6) or abs(r["z_lower"] - z_lo) < 1e-5
    assert r["z_upper"] == round(z_up, 6) or abs(r["z_upper"] - z_up) < 1e-5
    # ~0pp true difference, 4000 units, ±2pp margin: decisively equivalent
    assert r["equivalent"] is True
    assert r["p_tost"] < 0.05


def test_tost_large_lift_is_not_equivalent(spark):
    """A planted ~10pp conversion lift in arm 1 must FAIL equivalence at
    the ±2pp margin (p_tost near 1 on the violated side)."""
    from sql_data_warehouse_and_analytics_project_spark.operators.abtest import (
        tost_equivalence,
    )

    users = []
    for uid in range(1, 4001):
        arm = _md5_arm(uid)
        conv = (uid % 10 == 0) if arm == 0 else (uid % 5 == 0)
        users.append((uid, conv))
    ev = _events_for_conv(spark, users)
    [r] = tost_equivalence(ev).collect()
    assert r["equivalent"] is False
    assert r["p_tost"] > 0.5  # the d >= +delta side is nowhere near rejected


# --- burstiness ---------------------------------------------------------------


def test_burstiness_clockwork_vs_bursty(spark):
    """A clockwork stream (all gaps equal) has σ=0 → B = −1; a planted
    two-gap mixture matches the closed form from exact moments."""
    from sql_data_warehouse_and_analytics_project_spark.operators.analytics_extras import (
        burstiness,
    )
    from sql_data_warehouse_and_analytics_project_spark.streaming.jobs import (
        EVENTS_SCHEMA,
    )

    t0 = dt(2024, 5, 1)
    rows = []
    eid = 0
    # user 1, type "tick": 11 events exactly 60s apart -> 10 equal gaps
    for i in range(11):
        eid += 1
        rows.append((eid, t0 + timedelta(seconds=60 * i), 1, "tick", 0.0, "{}"))
    # user 2, type "burst": nine 1s gaps then one 991s silence — the
    # heavy-tailed shape (σ ≈ 3μ) that reads B ≈ +0.5; an alternating
    # two-point mixture would sit at σ slightly BELOW μ and read ≈ 0
    t = t0
    gaps = [1] * 9 + [991]
    eid += 1
    rows.append((eid, t, 2, "burst", 0.0, "{}"))
    for g in gaps:
        t = t + timedelta(seconds=g)
        eid += 1
        rows.append((eid, t, 2, "burst", 0.0, "{}"))
    got = {r["event_type"]: r for r in burstiness(
        spark.createDataFrame(rows, schema=EVENTS_SCHEMA)
    ).collect()}

    assert got["tick"]["n_gaps"] == 10
    assert got["tick"]["mean_gap_s"] == 60.0
    assert got["tick"]["std_gap_s"] == 0.0
    assert got["tick"]["burstiness"] == -1.0

    mu = sum(gaps) / len(gaps)
    var = sum((g - mu) ** 2 for g in gaps) / len(gaps)
    b = (math.sqrt(var) - mu) / (math.sqrt(var) + mu)
    assert got["burst"]["n_gaps"] == 10
    assert abs(got["burst"]["burstiness"] - b) < 1e-6
    assert got["burst"]["burstiness"] > 0  # bursty reads positive


# --- HHI ----------------------------------------------------------------------


def test_hhi_monopoly_and_equal_split(spark):
    """One-supplier nation → HHI = 1; four equal suppliers → HHI = 1/4
    and effective_suppliers = 4. Built directly from the (nation,
    supplier, lineitem) frames the operator joins."""
    from sql_data_warehouse_and_analytics_project_spark.operators.olap_extras import (
        hhi_by_nation,
    )

    nation = spark.createDataFrame(
        [(1, "MONO"), (2, "QUAD")], "n_nationkey int, n_name string"
    )
    supplier = spark.createDataFrame(
        [(10, 1), (20, 2), (21, 2), (22, 2), (23, 2)],
        "s_suppkey bigint, s_nationkey int",
    )
    li = []
    li.append((10, 500.0, 0.0))
    for sk in (20, 21, 22, 23):
        li.append((sk, 250.0, 0.0))
    lineitem = spark.createDataFrame(
        li, "l_suppkey bigint, l_extendedprice double, l_discount double"
    )
    got = {r["nation"]: r for r in hhi_by_nation(lineitem, supplier, nation).collect()}
    assert got["MONO"]["hhi"] == 1.0
    assert got["MONO"]["n_suppliers"] == 1
    assert got["QUAD"]["hhi"] == 0.25
    assert got["QUAD"]["effective_suppliers"] == 4.0
    assert got["QUAD"]["total_cents"] == 4 * 25000


# --- Theil --------------------------------------------------------------------


def test_theil_equality_zero_and_concentration_ln_n(spark):
    """Perfect equality → T = 0; total concentration on one of n
    customers → T = ln(n) (the upper bound)."""
    from sql_data_warehouse_and_analytics_project_spark.operators.olap_extras import (
        theil_by_nation,
    )

    nation = spark.createDataFrame(
        [(1, "EQ"), (2, "CONC")], "n_nationkey int, n_name string"
    )
    customer = spark.createDataFrame(
        [(i, 1) for i in range(1, 5)] + [(i, 2) for i in range(11, 15)],
        "c_custkey bigint, c_nationkey int",
    )
    orders = spark.createDataFrame(
        [(i, 100.0) for i in range(1, 5)]
        # CONC: one customer holds (almost) everything; zero-revenue
        # customers can't exist through the orders join, so approximate
        # total concentration with cents 1 vs huge
        + [(11, 1000000.0), (12, 0.01), (13, 0.01), (14, 0.01)],
        "o_custkey bigint, o_totalprice double",
    )
    got = {r["nation"]: r for r in theil_by_nation(orders, customer, nation).collect()}
    assert got["EQ"]["theil_t"] == 0.0
    # n=4, near-total concentration: T → ln(4) ≈ 1.386294
    assert abs(got["CONC"]["theil_t"] - math.log(4)) < 0.01


# --- assortativity -------------------------------------------------------------


def test_assortativity_star_is_negative_chain_mixed(spark):
    """A star graph is maximally disassortative (r = −1); the closed
    form on a 4-path matches a pure-python Pearson replay."""
    from sql_data_warehouse_and_analytics_project_spark.operators.degstats import (
        assortativity,
    )

    star = spark.createDataFrame(
        [(1, h) for h in (2, 3, 4, 5)], "a bigint, b bigint"
    )
    [r] = assortativity(star).collect()
    assert r["n_nodes"] == 5 and r["n_edges"] == 4
    assert r["assortativity"] == -1.0

    path = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "a bigint, b bigint")
    deg = {1: 1, 2: 2, 3: 2, 4: 1}
    ends = [(deg[a], deg[b]) for a, b in [(1, 2), (2, 3), (3, 4)]]
    m = len(ends)
    sjk = sum(j * k for j, k in ends)
    ssum = sum(j + k for j, k in ends)
    ssq = sum(j * j + k * k for j, k in ends)
    mu = ssum / (2 * m)
    want = (sjk / m - mu * mu) / (ssq / (2 * m) - mu * mu)
    [r] = assortativity(path).collect()
    assert abs(r["assortativity"] - want) < 1e-6


# --- Zipf ---------------------------------------------------------------------


def test_zipf_fit_recovers_planted_exponent(spark):
    """A corpus whose term frequencies are EXACTLY freq(rank) =
    round(C / rank^s) must fit slope ≈ −s with r² ≈ 1."""
    from sql_data_warehouse_and_analytics_project_spark.operators.corpusstats import (
        zipf_fit,
    )

    s_true, C, R = 1.0, 600, 20
    docs = []
    words = []
    for rank in range(1, R + 1):
        f = max(1, round(C / rank**s_true))
        words.extend([f"w{rank:03d}"] * f)
    docs.append((1, "en", "synthetic", " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id bigint, lang string, source string, text string")
    [r] = zipf_fit(df, top_r=R).collect()
    assert r["n_terms_fit"] == R
    assert r["top_tf"] == C
    assert abs(r["zipf_exponent"] - s_true) < 0.05  # rounding of freqs
    assert r["r2"] > 0.999


def test_zipf_rank_tiebreak_is_deterministic(spark):
    """Equal-frequency terms rank by term ASC — the fit must not depend
    on shuffle order (two runs, same result)."""
    from sql_data_warehouse_and_analytics_project_spark.operators.corpusstats import (
        zipf_fit,
    )

    text = " ".join(["a"] * 5 + ["b"] * 5 + ["c"] * 3 + ["d"] * 3 + ["e"] * 1)
    df = spark.createDataFrame(
        [(1, "en", "s", text)], "doc_id bigint, lang string, source string, text string"
    )
    r1 = zipf_fit(df, top_r=5).collect()
    r2 = zipf_fit(df, top_r=5).collect()
    assert [tuple(x) for x in r1] == [tuple(x) for x in r2]


# --- Simpson ------------------------------------------------------------------


def test_simpson_uniform_vs_degenerate(spark):
    """All-distinct tokens → λ = 0 (diversity 1); all-same tokens →
    λ = 1; a mixed source matches the exact formula."""
    from sql_data_warehouse_and_analytics_project_spark.operators.corpusstats import (
        simpson_diversity,
    )

    rows = [
        (1, "en", "uniq", "a b c d e f g h"),
        (2, "en", "same", "x x x x x x"),
        (3, "en", "mix", "p p q"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, source string, text string")
    got = {r["source"]: r for r in simpson_diversity(df).collect()}
    assert got["uniq"]["simpson_lambda"] == 0.0 and got["uniq"]["diversity"] == 1.0
    assert got["same"]["simpson_lambda"] == 1.0
    # mix: n=3, pairs same-type = 2·1 = 2 of N(N-1) = 6 → λ = 1/3
    assert abs(got["mix"]["simpson_lambda"] - 1 / 3) < 1e-6
    assert got["mix"]["n_terms"] == 2 and got["mix"]["n_tokens"] == 3


# --- query likelihood ----------------------------------------------------------


def test_query_likelihood_prefers_matching_and_shorter_docs(spark):
    """A doc containing the query terms outranks one that doesn't; among
    equal-tf docs the shorter one wins (Dirichlet length penalty); the
    score matches a pure-python replay."""
    from sql_data_warehouse_and_analytics_project_spark.operators.retrieval import (
        _QL_MU,
        query_likelihood_topk,
    )

    rows = [
        (1, "en", "s", "spark join vector pipeline"),
        (2, "en", "s", "spark join vector pipeline with many extra filler words here"),
        (3, "en", "s", "nothing relevant at all in this document"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, source string, text string")
    got = {r["doc_id"]: r["ql"] for r in query_likelihood_topk(df, k=3).collect()}

    toks = {i: rows[i - 1][3].split() for i in (1, 2, 3)}
    c_len = sum(len(t) for t in toks.values())
    cf = {
        term: sum(t.count(term) for t in toks.values())
        for term in ("spark", "join", "vector")
    }
    def score(d):
        s = 0.0
        for term in ("spark", "join", "vector"):
            if cf[term] > 0:
                s += math.log(
                    (toks[d].count(term) + _QL_MU * cf[term] / c_len)
                    / (len(toks[d]) + _QL_MU)
                )
        return s

    for d in (1, 2, 3):
        assert abs(got[d] - score(d)) < 1e-5, d
    assert got[1] > got[2] > got[3]
