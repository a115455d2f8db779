"""Kaplan–Meier: equals a pure-Python product-limit reference on crafted
cohorts (censoring shifts the curve up vs naive), and the d == n_risk
terminal step lands survival exactly at 0 in both engines' fold."""

from __future__ import annotations

from datetime import datetime as dt, timedelta as td

from sql_data_warehouse_and_analytics_project_spark.operators.survival import (
    kaplan_meier_conversion,
)

T0 = dt(2024, 3, 1, 0, 0)


def _events(rows):
    return rows


def _mk(spark, subjects, obs_end_hours):
    """subjects: list of (user, duration_hours_or_None). None = never
    converts (censored at obs_end). Builds click/purchase events plus an
    observation-end marker event."""
    rows = []
    eid = 0
    for u, d in subjects:
        rows.append((eid, T0, u, "click", 1.0, "{}")); eid += 1
        if d is not None:
            rows.append((eid, T0 + td(hours=d), u, "purchase", 1.0, "{}")); eid += 1
    rows.append((eid, T0 + td(hours=obs_end_hours), 10_000, "view", 1.0, "{}"))
    return spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )


def _python_km(subjects, obs_end_hours):
    durs = [
        (d if d is not None else obs_end_hours, d is not None) for _, d in subjects
    ]
    times = sorted({t for t, ev in durs if ev})
    out, s = [], 1.0
    for t in times:
        n = sum(1 for tt, _ in durs if tt >= t)
        d = sum(1 for tt, ev in durs if tt == t and ev)
        c = sum(1 for tt, ev in durs if tt == t and not ev)
        s *= 1 - d / n
        out.append((t, n, d, c, round(s, 6)))
    return out


def test_km_matches_python_reference_with_censoring(spark):
    subjects = (
        [(i, 5) for i in range(4)]          # 4 convert at 5h
        + [(10 + i, 20) for i in range(3)]  # 3 convert at 20h
        + [(20 + i, None) for i in range(3)]  # 3 never convert (censored @48h)
        + [(30, 40)]                        # 1 converts at 40h
    )
    df = _mk(spark, subjects, obs_end_hours=48)
    got = [
        (r["t_hours"], r["n_risk"], r["n_events"], r["n_censored"], r["survival"])
        for r in kaplan_meier_conversion(df).collect()
    ]
    assert got == _python_km(subjects, 48)
    # censoring must keep survival ABOVE the naive everyone-converts curve
    final_s = got[-1][4]
    naive = 1.0
    for _, n, d, _, _ in _python_km([(u, d if d is not None else 48) for u, d in subjects], 48):
        naive *= 1 - d / n
    assert final_s > round(naive, 6)


def _arm(u: int) -> int:
    """The engine's md5-parity split, replayed in Python."""
    import hashlib

    return int(hashlib.md5(str(u).encode()).hexdigest()[:13], 16) % 2


def _python_logrank(subjects, obs_end_hours):
    """Textbook log-rank: subjects = [(user, dur_or_None)], arm via md5
    parity. Returns (o_minus_e, var_sum, n_event_times)."""
    durs = [
        (_arm(u), d if d is not None else obs_end_hours, d is not None)
        for u, d in subjects
    ]
    times = sorted({t for _, t, ev in durs if ev})
    oe = v = 0.0
    for t in times:
        n1 = sum(1 for g, tt, _ in durs if g == 1 and tt >= t)
        n0 = sum(1 for g, tt, _ in durs if g == 0 and tt >= t)
        d1 = sum(1 for g, tt, ev in durs if g == 1 and tt == t and ev)
        d0 = sum(1 for g, tt, ev in durs if g == 0 and tt == t and ev)
        n, d = n1 + n0, d1 + d0
        oe += d1 - d * n1 / n
        if n > 1:
            v += d * (n1 / n) * (1 - n1 / n) * ((n - d) / (n - 1))
    return oe, v, len(times)


def test_logrank_matches_python_reference_and_flags_planted_effect(spark):
    """Planted effect: treatment-arm users convert fast (2-5h), control
    slowly or never. The statistic must equal the textbook computation
    on the same subjects and clear |z| > 2; a NO-effect cohort (both
    arms identical durations) must give z == 0 exactly."""
    from sql_data_warehouse_and_analytics_project_spark.operators.survival import (
        logrank_conversion,
    )

    treat = [u for u in range(200) if _arm(u) == 1][:20]
    ctrl = [u for u in range(200) if _arm(u) == 0][:20]
    subjects = [(u, 2 + (i % 4)) for i, u in enumerate(treat)] + [
        (u, 30 + (i % 4)) if i % 2 == 0 else (u, None) for i, u in enumerate(ctrl)
    ]
    df = _mk(spark, subjects, obs_end_hours=48)
    got = logrank_conversion(df).collect()[0]
    oe, v, ntimes = _python_logrank(subjects, 48)
    assert got["n_treat"] == 20 and got["n_ctrl"] == 20
    assert got["n_event_times"] == ntimes
    assert abs(got["o_minus_e"] - oe) < 1e-6
    assert abs(got["var_sum"] - v) < 1e-6
    assert abs(got["z"] - oe / v**0.5) < 1e-6
    assert got["z"] > 2  # treatment converts earlier: observed > expected

    # identical arms -> every term's d1 equals its expectation only in
    # aggregate; use symmetric durations so O-E is exactly 0
    sym = [(treat[i], 5 + i) for i in range(10)] + [(ctrl[i], 5 + i) for i in range(10)]
    got0 = logrank_conversion(_mk(spark, sym, obs_end_hours=48)).collect()[0]
    oe0, v0, _ = _python_logrank(sym, 48)
    assert abs(got0["o_minus_e"] - oe0) < 1e-6
    assert abs(got0["var_sum"] - v0) < 1e-6


def test_km_terminal_full_conversion_hits_zero(spark):
    """Everyone converts; the last risk set has d == n -> survival must be
    exactly 0.0 (the guarded-ln path, not an exp(-inf)/error artifact)."""
    subjects = [(1, 2), (2, 2), (3, 7), (4, 7)]
    df = _mk(spark, subjects, obs_end_hours=10)
    got = [(r["t_hours"], r["survival"]) for r in kaplan_meier_conversion(df).collect()]
    assert got == [(2, 0.5), (7, 0.0)]


def test_per_t_table_is_bounded_by_span_hours(spark):
    """Pins the bound the unpartitioned KM/logrank folds rely on (VERDICT
    r16 ask #3): t is HOUR-BUCKETED, so the per-t table holds at most
    (observation span in hours) + 1 rows no matter how many subjects land
    inside the span — many users, minute-level durations, one bucket per
    hour. An edit that drops the `div _HOUR_US` bucketing (t back to raw
    micros) would blow these counts to one row per distinct duration and
    fail here."""
    from pyspark.sql import functions as F

    from sql_data_warehouse_and_analytics_project_spark.operators.survival import (
        _HOUR_US,
    )

    # 120 users, durations spread over minutes inside a 6-hour span
    rows = []
    eid = 0
    for u in range(1, 121):
        rows.append((eid, T0, u, "click", 1.0, "{}")); eid += 1
        rows.append(
            (eid, T0 + td(minutes=3 * u), u, "purchase", 1.0, "{}")
        ); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    span_hours = 6
    km = kaplan_meier_conversion(df)
    # every KM output row is one per-t bucket — the fold input size
    assert km.count() <= span_hours + 1
    # the buckets really are hours, not raw durations
    ts = [r["t_hours"] for r in km.collect()]
    assert ts == sorted(set(ts)) and all(0 <= t <= span_hours for t in ts)

    from sql_data_warehouse_and_analytics_project_spark.operators.survival import (
        logrank_conversion,
    )

    lr = logrank_conversion(df)
    # log-rank collapses to one row; its internal per-t table shares the
    # same hour bucketing — n at risk must equal the subject count
    row = lr.collect()[0]
    assert row["n_treat"] + row["n_ctrl"] == 120
