"""Semantics of the r16 experimentation operators: Mann-Whitney U
against a pure-Python reference (midranks, tie correction), BH step-up
against a hand-run of the procedure, and position-based multi-touch
credits against hand-computed splits."""


from __future__ import annotations

import pytest

from datetime import datetime as dt, timedelta

from pyspark.sql import functions as F

from sql_data_warehouse_and_analytics_project_spark.operators.abstats import (
    bh_fdr_proportions,
    mann_whitney_u,
)
from sql_data_warehouse_and_analytics_project_spark.operators.attribution import (
    position_attribution,
)


def _mwu_reference(treat: list[int], ctrl: list[int]):
    """Textbook midrank Mann-Whitney with tie-corrected normal z."""
    pooled = sorted((v, 1) for v in treat) + sorted((v, 0) for v in ctrl)
    pooled.sort(key=lambda x: x[0])
    n1, n0 = len(treat), len(ctrl)
    n = n1 + n0
    # midranks
    r1 = 0.0
    i = 0
    ties = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j][0] == pooled[i][0]:
            j += 1
        c = j - i
        midrank = (i + 1 + j) / 2.0  # average of ranks i+1..j
        r1 += midrank * sum(1 for k in range(i, j) if pooled[k][1] == 1)
        ties += c**3 - c
        i = j
    u1 = r1 - n1 * (n1 + 1) / 2.0
    var = n1 * n0 / 12.0 * ((n + 1) - ties / (n * (n - 1)))
    z = (u1 - n1 * n0 / 2.0) / (var**0.5)
    return u1, z, 2.0 * u1 / (n1 * n0) - 1.0


@pytest.mark.slow
def test_mann_whitney_matches_pure_python_reference(spark):
    treat = [5, 7, 7, 9, 12, 12, 12, 30]
    ctrl = [1, 3, 5, 7, 8, 12, 2, 2]
    rows = [(1, v) for v in treat] + [(0, v) for v in ctrl]
    got = mann_whitney_u(
        spark.createDataFrame(rows, "t int, v bigint")
    ).collect()[0]
    u1, z, rb = _mwu_reference(treat, ctrl)
    assert got["n_treat"] == len(treat) and got["n_ctrl"] == len(ctrl)
    assert got["u_treat"] == round(u1, 6)
    assert abs(got["z"] - z) < 1e-6
    assert abs(got["rank_biserial"] - rb) < 1e-6


def test_mann_whitney_detects_planted_shift(spark):
    """A clean location shift must give |z| large and positive for the
    shifted treatment arm; swapping arms flips the sign exactly."""
    rows = [(1, 1000 + i) for i in range(40)] + [(0, i) for i in range(40)]
    got = mann_whitney_u(spark.createDataFrame(rows, "t int, v bigint")).collect()[0]
    assert got["u_treat"] == 1600.0  # every treat beats every ctrl: U1 = n1*n0
    assert got["rank_biserial"] == 1.0
    assert got["z"] > 7
    flipped = [(1 - t, v) for t, v in rows]
    got2 = mann_whitney_u(spark.createDataFrame(flipped, "t int, v bigint")).collect()[0]
    assert got2["z"] == -got["z"]


def test_bh_fdr_rejects_only_planted_outlier_segment(spark):
    """Nine conforming segments at the pooled rate + one extreme outlier:
    BH at FDR 0.05 must reject exactly the outlier, and the step-up must
    match a hand-run of the procedure on the operator's own p-values."""
    nations = [(i, f"NATION_{i:02d}") for i in range(10)]
    customers = [(i, i) for i in range(10)]  # custkey=i in nation i
    orders = []
    oid = 0
    # outlier must be subtle enough not to drag the POOLED rate far from
    # the conforming segments (the test is one-vs-pooled): 30% vs 20%
    # baseline pools to 21%, leaving conformers at |z| ~ 0.55 while the
    # outlier reads z ~ 4.9
    for nk in range(10):
        hi = 150 if nk == 7 else 100
        for j in range(500):
            oid += 1
            pri = "1-URGENT" if j < hi else "5-LOW"
            orders.append((oid, nk, pri))
    out = bh_fdr_proportions(
        spark.createDataFrame(orders, "o_orderkey bigint, o_custkey bigint, o_orderpriority string"),
        spark.createDataFrame(customers, "c_custkey bigint, c_nationkey bigint"),
        spark.createDataFrame(nations, "n_nationkey bigint, n_name string"),
    ).collect()
    rejected = {r["n_name"] for r in out if r["rejected"]}
    assert rejected == {"NATION_07"}
    # hand-run BH on the operator's p-values: k* = max rank with p <= thr
    ranked = sorted(out, key=lambda r: r["p_rank"])
    kstar = max(
        (r["p_rank"] for r in ranked if r["p_value"] <= r["bh_threshold"]),
        default=0,
    )
    assert all(r["rejected"] == (r["p_rank"] <= kstar) for r in ranked)
    assert ranked[0]["n_name"] == "NATION_07" and ranked[0]["p_value"] <= 1e-6


def test_ks_two_sample_matches_reference_and_detects_shape(spark):
    """KS must equal the textbook sup|F1−F0| on a crafted pair of
    samples, detect a pure VARIANCE difference (equal means) that
    Mann-Whitney scores near zero, and report D = 0 on identical
    samples."""
    from sql_data_warehouse_and_analytics_project_spark.operators.abstats import (
        ks_two_sample,
    )

    # planted: arm1 = {0, 100} (spread), arm0 = {50} (point mass) — equal
    # means; F-gap at v=0..49 is 0.5, at 50..99 is |0.5 - 1.0| = 0.5
    rows = [(1, 0)] * 10 + [(1, 100)] * 10 + [(0, 50)] * 20
    got = ks_two_sample(spark.createDataFrame(rows, "t int, v bigint")).collect()[0]
    assert got["d_stat"] == 0.5
    assert got["ks_at_value"] == 0  # first value attaining the sup
    assert got["rejected"]  # 0.5 > 1.358*sqrt(40/400) ~ 0.43

    mw = mann_whitney_u(spark.createDataFrame(rows, "t int, v bigint")).collect()[0]
    assert abs(mw["rank_biserial"]) < 1e-9  # rank test blind to the spread

    same = [(1, v) for v in (1, 2, 3, 4)] + [(0, v) for v in (1, 2, 3, 4)]
    got0 = ks_two_sample(spark.createDataFrame(same, "t int, v bigint")).collect()[0]
    assert got0["d_stat"] == 0.0 and not got0["rejected"]

    # pure-python reference on an asymmetric mixed sample
    a = [1, 1, 2, 5, 9, 9, 12]
    b = [0, 2, 2, 3, 9, 15]
    rows2 = [(1, v) for v in a] + [(0, v) for v in b]
    vals = sorted(set(a) | set(b))
    ref = max(
        abs(sum(1 for x in a if x <= v) / len(a) - sum(1 for x in b if x <= v) / len(b))
        for v in vals
    )
    got2 = ks_two_sample(spark.createDataFrame(rows2, "t int, v bigint")).collect()[0]
    assert got2["d_stat"] == round(ref, 6)


def test_multitouch_credits_split_exactly(spark):
    """Planted paths of length 1, 2, and 4: 'only' takes v, a pair takes
    v div 2 each, and a 4-path takes 40/20/20.../40 via exact integer
    floor division; clicks outside the horizon are excluded."""
    t0 = dt(2024, 5, 1, 12, 0)
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"

    def ev(eid, minutes, user, etype, value=0.0):
        return (eid, t0 + timedelta(minutes=minutes), user, etype, value, "{}")

    rows = [
        # user 1: single click -> 'only' gets full 10.0
        ev(1, -30, 1, "click"),
        ev(2, 0, 1, "purchase", 10.0),
        # user 2: two clicks -> 5.0 each
        ev(3, -40, 2, "click"),
        ev(4, -20, 2, "click"),
        ev(5, 0, 2, "purchase", 10.0),
        # user 3: four clicks -> 4.0 / 1.0 / 1.0 / 4.0 (vfp=10e6)
        ev(6, -50, 3, "click"),
        ev(7, -40, 3, "click"),
        ev(8, -30, 3, "click"),
        ev(9, -20, 3, "click"),
        ev(10, 0, 3, "purchase", 10.0),
        # user 4: click OUTSIDE the 3-day horizon -> no touch rows at all
        ev(11, -3 * 1440 - 1, 4, "click"),
        ev(12, 0, 4, "purchase", 10.0),
    ]
    out = {
        (str(r["day"]), r["position"]): (r["n_touches"], r["attributed_fp_sum"])
        for r in position_attribution(
            spark.createDataFrame(rows, schema)
        ).collect()
    }
    day = str(t0.date())
    assert out[(day, "only")] == (1, 10_000_000)
    # user 2 contributes 2 touches at 5M each; user 3 first+last at 4M each
    assert out[(day, "first")] == (2, 5_000_000 + 4_000_000)
    assert out[(day, "last")] == (2, 5_000_000 + 4_000_000)
    assert out[(day, "middle")] == (2, 2_000_000)
    assert sum(v for _, v in out.values()) == 30_000_000  # user 4 absent


def test_multitouch_total_credit_is_floor_bounded(spark):
    """For any path length the credited sum never exceeds the purchase
    value and falls short only by integer-floor remainders (< k
    micro-units)."""
    t0 = dt(2024, 5, 1, 12, 0)
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    rows = []
    eid = 0
    for k in range(1, 9):  # path lengths 1..8 for users 1..8
        for i in range(k):
            eid += 1
            rows.append((eid, t0 + timedelta(minutes=-60 + i), k, "click", 0.0, "{}"))
        eid += 1
        rows.append((eid, t0, k, "purchase", 9.999999, "{}"))
    df = position_attribution(spark.createDataFrame(rows, schema))
    total = df.agg(F.sum("attributed_fp_sum")).collect()[0][0]
    vfp = 9_999_999
    exact = 8 * vfp
    assert total <= exact
    assert exact - total < sum(k for k in range(1, 9))


def _arm(u: int) -> int:
    import hashlib

    return int(hashlib.md5(str(u).encode()).hexdigest()[:13], 16) % 2


def _cmh_events(spark, specs):
    """specs: list of (stratum_day, arm, n_users, n_converters). Builds
    one first-event per user pinned to the given epoch day (stratum =
    day % 7) plus purchases for the converters."""
    from datetime import datetime as dt, timedelta

    t0 = dt(2024, 1, 1)  # epoch day 19723; (19723 + d) % 7 cycles with d
    rows, eid, next_uid = [], 0, 0
    arm_pool = {0: [], 1: []}
    u = 0
    while len(arm_pool[0]) < 4000 or len(arm_pool[1]) < 4000:
        arm_pool[_arm(u)].append(u)
        u += 1
    for day, arm, n, conv in specs:
        for i in range(n):
            uid = arm_pool[arm].pop()
            ts = t0 + timedelta(days=day, hours=1)
            eid += 1
            rows.append((eid, ts, uid, "view", 0.0, "{}"))
            if i < conv:
                eid += 1
                rows.append((eid, ts + timedelta(hours=2), uid, "purchase", 5.0, "{}"))
    schema = ("event_id bigint, ts timestamp, user_id bigint, event_type string,"
              " value double, props string")
    return spark.createDataFrame(rows, schema)


def test_cmh_zero_under_pure_confounding_and_detects_real_effect(spark):
    """Pure confounding (within-stratum rates identical, arm composition
    skewed across a high- and a low-converting stratum): the MARGINAL
    rates differ but CMH's o_minus_e must be exactly 0.0 and or_mh 1.0.
    A genuine within-stratum effect must clear |z| > 2."""
    from sql_data_warehouse_and_analytics_project_spark.operators.abstats import (
        cmh_stratified_ab,
    )

    # stratum day0: 80% conversion, treat-heavy; day1: 20%, ctrl-heavy
    confounded = [
        (0, 1, 100, 80), (0, 0, 20, 16),
        (1, 1, 20, 4), (1, 0, 100, 20),
    ]
    got = cmh_stratified_ab(_cmh_events(spark, confounded)).collect()[0]
    assert got["n_strata"] == 2
    assert got["o_minus_e"] == 0.0
    assert got["or_mh"] == 1.0
    # marginal rates really do differ (the trap CMH corrects):
    # treat 84/120 = 0.70 vs ctrl 36/120 = 0.30

    effect = [
        (0, 1, 100, 60), (0, 0, 100, 30),
        (1, 1, 100, 50), (1, 0, 100, 25),
    ]
    got2 = cmh_stratified_ab(_cmh_events(spark, effect)).collect()[0]
    assert got2["z"] > 2
    assert got2["or_mh"] > 2.0


def test_delta_ratio_matches_pure_python_reference(spark):
    """Delta-method ratio readout vs a textbook computation on planted
    per-user (purchase value, click count) data with arms planted via
    the md5-parity helper."""
    from datetime import datetime as dt, timedelta

    from sql_data_warehouse_and_analytics_project_spark.operators.abtest import (
        delta_ratio_ab,
    )

    treat = [u for u in range(300) if _arm(u) == 1][:25]
    ctrl = [u for u in range(300) if _arm(u) == 0][:25]
    # (value, clicks) per user — treatment earns more per click
    data = {}
    for i, u in enumerate(treat):
        data[u] = (10.0 + 3.0 * (i % 5), 2 + i % 3)
    for i, u in enumerate(ctrl):
        data[u] = (4.0 + 2.0 * (i % 5), 2 + i % 3)

    t0 = dt(2024, 6, 1)
    rows, eid = [], 0
    for u, (val, clicks) in data.items():
        eid += 1
        rows.append((eid, t0, u, "purchase", val, "{}"))
        for c in range(clicks):
            eid += 1
            rows.append((eid, t0 + timedelta(minutes=c + 1), u, "click", 1.0, "{}"))
    schema = ("event_id bigint, ts timestamp, user_id bigint, event_type string,"
              " value double, props string")
    got = delta_ratio_ab(spark.createDataFrame(rows, schema)).collect()[0]

    def ref(users):
        import math

        xs = [int(data[u][0] * 1_000_000) for u in users]  # engine's floor fp
        ys = [data[u][1] for u in users]
        n = len(users)
        sx, sy = sum(xs), sum(ys)
        r_fp = sx / sy
        var_x = (n * sum(x * x for x in xs) - sx * sx) / (n * (n - 1))
        cov = (n * sum(x * y for x, y in zip(xs, ys)) - sx * sy) / (n * (n - 1))
        var_y = (n * sum(y * y for y in ys) - sy * sy) / (n * (n - 1))
        ybar = sy / n
        v = (var_x - 2 * r_fp * cov + r_fp * r_fp * var_y) / (n * ybar * ybar) / 1e12
        return r_fp / 1e6, v

    r1, v1 = ref(treat)
    r0, v0 = ref(ctrl)
    assert got["n_treat"] == 25 and got["n_ctrl"] == 25
    assert abs(got["ratio_treat"] - r1) < 1e-6
    assert abs(got["ratio_ctrl"] - r0) < 1e-6
    assert abs(got["se_diff"] - (v1 + v0) ** 0.5) < 1e-6
    assert got["z"] > 2  # the planted per-click uplift is real


@pytest.mark.slow
def test_mwu_and_ks_property_match_reference_on_random_samples(spark):
    """Hypothesis sweep (bounded examples — each runs a real Spark job):
    on arbitrary small integer samples with heavy ties, the engine's
    MWU (u, z, effect) and KS (D) must match the pure-Python textbook
    references to 6 dp."""
    from hypothesis import given, settings, HealthCheck
    from hypothesis import strategies as st

    from sql_data_warehouse_and_analytics_project_spark.operators.abstats import (
        ks_two_sample,
    )

    sample = st.lists(st.integers(min_value=-5, max_value=5), min_size=2, max_size=12)

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(a=sample, b=sample)
    def run(a, b):
        rows = [(1, v) for v in a] + [(0, v) for v in b]
        df = spark.createDataFrame(rows, "t int, v bigint")

        got = mann_whitney_u(df).collect()[0]
        try:
            u1, z, rb = _mwu_reference(a, b)
        except ZeroDivisionError:
            # all-tied pooled sample: variance 0 — the engine reports z NULL
            assert got["z"] is None
        else:
            assert got["u_treat"] == round(u1, 6)
            if got["z"] is not None:
                assert abs(got["z"] - z) < 1e-6
            assert abs(got["rank_biserial"] - rb) < 1e-6

        vals = sorted(set(a) | set(b))
        ref_d = max(
            abs(
                sum(1 for x in a if x <= v) / len(a)
                - sum(1 for x in b if x <= v) / len(b)
            )
            for v in vals
        )
        ks = ks_two_sample(df).collect()[0]
        assert ks["d_stat"] == round(ref_d, 6)

    run()


def test_markov_transitions_planted_sessions(spark):
    """Two planted sessions for one user (split by a >30 min gap) plus a
    second user: transition counts match the hand enumeration including
    __START__/__END__ boundary states, and each from_state's
    probabilities sum to 1."""
    from datetime import datetime as dt, timedelta

    from sql_data_warehouse_and_analytics_project_spark.operators.analytics_extras import (
        session_markov_transitions,
    )

    t0 = dt(2024, 7, 1, 9, 0)
    schema = ("event_id bigint, ts timestamp, user_id bigint, event_type string,"
              " value double, props string")

    def ev(eid, minutes, user, etype):
        return (eid, t0 + timedelta(minutes=minutes), user, etype, 1.0, "{}")

    rows = [
        # user 1, session A: view -> click -> purchase
        ev(1, 0, 1, "view"), ev(2, 5, 1, "click"), ev(3, 10, 1, "purchase"),
        # 40-minute gap -> session B: view -> view
        ev(4, 50, 1, "view"), ev(5, 55, 1, "view"),
        # user 2, one session: click
        ev(6, 0, 2, "click"),
    ]
    got = {
        (r["from_state"], r["to_state"]): (r["n_transitions"], r["p"])
        for r in session_markov_transitions(
            spark.createDataFrame(rows, schema)
        ).collect()
    }
    want_counts = {
        ("__START__", "view"): 2,
        ("__START__", "click"): 1,
        ("view", "click"): 1,
        ("view", "view"): 1,
        ("view", "__END__"): 1,
        ("click", "purchase"): 1,
        ("click", "__END__"): 1,
        ("purchase", "__END__"): 1,
    }
    assert {k: v[0] for k, v in got.items()} == want_counts
    assert got[("__START__", "view")][1] == round(2 / 3, 6)
    from collections import defaultdict

    by_from = defaultdict(float)
    for (f, _), (_, p) in got.items():
        by_from[f] += p
    assert all(abs(s - 1.0) < 1e-5 for s in by_from.values()), by_from


def test_qte_matches_numpy_style_order_statistics(spark):
    """QTE quantiles equal the lower order statistic ceil(p*n) on planted
    arms, and a planted tail-only effect shows qte = 0 at the median but
    a large p90 lift."""
    from sql_data_warehouse_and_analytics_project_spark.operators.abstats import (
        quantile_treatment_effects,
    )

    # arms share the bottom 80%: 1..80; treatment's top 20% is 10x
    treat = list(range(1, 81)) + [1000 + i for i in range(20)]
    ctrl = list(range(1, 81)) + [100 + i for i in range(20)]
    rows = [(1, v) for v in treat] + [(0, v) for v in ctrl]
    got = {
        r["pct_ppm"]: (r["q_treat"], r["q_ctrl"], r["qte"])
        for r in quantile_treatment_effects(
            spark.createDataFrame(rows, "t int, v bigint")
        ).collect()
    }

    def ref_q(xs, p_ppm):
        xs = sorted(xs)
        k = -(-(p_ppm * len(xs)) // 1_000_000)  # ceil, exact ints
        return xs[k - 1]

    for p in (100_000, 250_000, 500_000, 750_000, 900_000):
        assert got[p] == (ref_q(treat, p), ref_q(ctrl, p), ref_q(treat, p) - ref_q(ctrl, p)), p
    assert got[500_000][2] == 0      # median untouched
    assert got[900_000][2] == 900    # tail lift: 1010 - 110


def test_value_cumsums_equals_python_fold_across_partitionings(spark):
    """_value_cumsums (the two-pass range-partitioned exact cumsum behind
    MWU/KS/QTE/IV) must equal the driver-side python prefix sum for any
    table and ANY shuffle-partition count — 1 (everything in one range
    partition), 3 (offsets load-bearing), and the session default. Also
    pins the returned grand totals."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    from sql_data_warehouse_and_analytics_project_spark.operators.abstats import (
        _value_cumsums,
    )

    vals = [((i * 37) % 101 - 50, (i * 13) % 7, (i * 29) % 5) for i in range(200)]
    # distinct v (groupBy-shaped input), pseudo-random counts incl. zeros
    rows = sorted({v: (a, b) for v, a, b in vals}.items())
    data = [(v, a, b) for v, (a, b) in rows]
    want_cum, run_a, run_b = [], 0, 0
    for v, a, b in data:
        run_a += a
        run_b += b
        want_cum.append((v, run_a, run_b))

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts in ("1", "3", prev):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            df = spark.createDataFrame(data, "v long, c1 long, c0 long")
            stepped, tot = _value_cumsums(df, ["c1", "c0"])
            got = sorted(
                (r["v"], int(r["cum_c1"]), int(r["cum_c0"]))
                for r in stepped.collect()
            )
            assert got == want_cum, f"shuffle.partitions={parts}"
            assert (tot["c1"], tot["c0"]) == (run_a, run_b)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_dist_ntile_equals_spark_ntile_for_all_shapes(spark):
    """_dist_ntile must reproduce F.ntile bit-for-bit for every shape
    class: n < k (each row its own tile), n = k, n not divisible by k
    (first r tiles one larger), ties broken by the id column, and
    descending sort order."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sql_data_warehouse_and_analytics_project_spark.operators.olap_extras import (
        _dist_ntile,
    )

    for n, k in ((3, 5), (5, 5), (17, 4), (100, 7)):
        data = [(i, (i * 31) % 10) for i in range(n)]  # heavy ties in s
        df = spark.createDataFrame(data, "id long, s long")
        want = {
            (r["id"],): r["t"]
            for r in df.withColumn(
                "t", F.ntile(k).over(Window.orderBy(F.desc("s"), "id"))
            ).collect()
        }
        got = {
            (r["id"],): r["t"]
            for r in _dist_ntile(df, [F.desc("s"), F.col("id")], k, "t").collect()
        }
        assert got == want, (n, k)


def test_srm_check_balanced_and_planted_mismatch(spark):
    """SRM: a (hash-)balanced population must not alarm; a planted 80/20
    mismatch must (chi2 = (n1-n0)^2/n far past the p<0.001 bar); the
    chi-square matches the closed form on exact counts."""
    from sql_data_warehouse_and_analytics_project_spark.operators.abstats import (
        srm_check,
    )

    schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    )
    t0 = dt(2024, 8, 1)

    balanced = spark.createDataFrame(
        [(u, t0, u, "view", 0.0, "{}") for u in range(1, 2001)], schema
    )
    r = srm_check(balanced).collect()[0]
    assert r["n_treat"] + r["n_ctrl"] == 2000
    exp_chi2 = round((r["n_treat"] - r["n_ctrl"]) ** 2 / 2000, 6)
    assert r["chi2"] == exp_chi2
    assert r["srm_alarm"] is False  # md5 parity is unbiased

    # planted mismatch: keep every arm-0 user, every 4th arm-1 user
    rows = []
    for u in range(1, 4001):
        if _arm(u) == 0 or u % 4 == 0:
            rows.append((u, t0, u, "view", 0.0, "{}"))
    skewed = srm_check(spark.createDataFrame(rows, schema)).collect()[0]
    assert skewed["srm_alarm"] is True
    assert skewed["p_value"] < 0.001
