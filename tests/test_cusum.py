"""CUSUM change-point monitor: pure-python recursive-form replay (the
closed prefix-min form must equal Page's recursion), planted-shift alarm
with correct onset, and no alarms on a flat stream."""

from __future__ import annotations

import math
from datetime import datetime as dt, timedelta

from sql_data_warehouse_and_analytics_project_spark.operators.cusum import (
    cusum_hourly,
)

SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)
T0 = dt(2024, 7, 1)


def _mk(spark, per_hour_counts):
    rows, eid = [], 0
    for h, n in enumerate(per_hour_counts):
        for i in range(n):
            eid += 1
            rows.append((eid, T0 + timedelta(hours=h, minutes=i % 59), 1 + i % 7, "view", 0.0, "{}"))
    return spark.createDataFrame(rows, SCHEMA)


def _python_cusum(counts):
    """Page's RECURSION S_h = max(0, S_{h-1} + x - k), both sides — the
    textbook form the engine's closed prefix-min/max form must equal."""
    k = sum(counts) // len(counts)
    thr = math.ceil(5.0 * math.sqrt(k))
    s_pos = s_neg = 0
    out = []
    for x in counts:
        s_pos = max(0, s_pos + (x - k))
        s_neg = max(0, s_neg - (x - k))
        out.append((x, k, thr, s_pos, s_neg, s_pos > thr, s_neg > thr))
    return out


def test_cusum_closed_form_equals_page_recursion(spark):
    counts = [9, 11, 10, 8, 12, 10, 9, 14, 6, 10, 11, 9]
    got = cusum_hourly(_mk(spark, counts)).collect()
    want = _python_cusum(counts)
    assert len(got) == len(want)
    for r, (x, k, thr, sp, sn, au, ad) in zip(got, want):
        assert (
            r["n_events"], r["k_ref"], r["threshold"],
            r["s_pos"], r["s_neg"], r["alarm_up"], r["alarm_down"],
        ) == (x, k, thr, sp, sn, au, ad)


def test_cusum_planted_shift_alarms_after_onset_and_flat_stream_never(spark):
    """A +8/hour level shift at hour 12 of a 10/hour stream: with the
    global floor-mean reference (14), the low half drifts BELOW reference
    and the high half ABOVE it, so alarm_down belongs strictly to the low
    half and alarm_up strictly to the high half — each raised after its
    drift accumulates past the decision interval, then held. A flat
    stream never alarms either side."""
    base, shifted = [10] * 12, [18] * 12
    up = cusum_hourly(_mk(spark, base + shifted)).collect()
    assert not any(r["alarm_up"] for r in up[:12])
    assert any(r["alarm_up"] for r in up[12:])
    first = next(i for i, r in enumerate(up) if r["alarm_up"])
    assert all(r["alarm_up"] for r in up[first:])
    # the low half's down-drift decays at +4/hour once above reference:
    # s_neg = 48 − 4·(i+1) ≤ thr(19) from the 8th post-shift hour on
    assert not any(r["alarm_down"] for r in up[20:])

    down = cusum_hourly(_mk(spark, shifted + base)).collect()
    assert any(r["alarm_down"] for r in down[12:])
    assert not any(r["alarm_down"] for r in down[:12])

    flat = cusum_hourly(_mk(spark, [10] * 24)).collect()
    assert not any(r["alarm_up"] or r["alarm_down"] for r in flat)


def test_weekly_seasonality_planted_pattern_and_python_reference(spark):
    """A planted hour-of-week pattern (30/hour on the first day-of-week,
    10/hour elsewhere, two full weeks) must put rate_index high exactly on
    the planted hours and match a python variance-decomposition replay."""
    from sql_data_warehouse_and_analytics_project_spark.operators.analytics_extras import (
        weekly_seasonality,
    )

    counts = {}
    for week in range(2):
        for how in range(168):
            counts[week * 168 + how] = 30 if how < 24 else 10
    rows, eid = [], 0
    for hr, n in counts.items():
        for i in range(n):
            eid += 1
            rows.append((eid, T0 + timedelta(hours=hr, minutes=i % 59), 1, "view", 0.0, "{}"))
    # T0 is midnight; hr buckets align with epoch hours so how = hr0 + how
    got = weekly_seasonality(spark.createDataFrame(rows, SCHEMA)).collect()
    assert len(got) == 168
    hi = {r["how"] for r in got if r["rate_mean"] == 30.0}
    lo = {r["how"] for r in got if r["rate_mean"] == 10.0}
    assert len(hi) == 24 and len(lo) == 144 and hi.isdisjoint(lo)
    assert all(r["rate_index"] > 2.0 for r in got if r["how"] in hi)

    # python replay of the strength: groups are exact-constant here, so
    # SS_within = 0 and strength = 1 exactly
    assert all(r["seasonal_strength"] == 1.0 for r in got)


def test_power_mde_matches_closed_form(spark):
    """MDE equals the python closed form on exact counts, and shrinks
    with sample size (4x the users → half the MDE, same rates)."""
    import hashlib

    from sql_data_warehouse_and_analytics_project_spark.operators.abtest import (
        power_mde,
    )

    def arm(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:13], 16) % 2

    def mk(n_users):
        rows = []
        for u in range(1, n_users + 1):
            etype = "purchase" if u % 5 == 0 else "view"
            rows.append((u, T0, u, etype, 1.0, "{}"))
        return spark.createDataFrame(rows, SCHEMA)

    r = power_mde(mk(1000)).collect()[0]
    n1 = sum(1 for u in range(1, 1001) if arm(u) == 1)
    x1 = sum(1 for u in range(1, 1001) if arm(u) == 1 and u % 5 == 0)
    n0, x0 = 1000 - n1, 200 - x1
    assert (r["n_treat"], r["n_ctrl"], r["conv_treat"], r["conv_ctrl"]) == (n1, n0, x1, x0)
    p = (x1 + x0) / 1000
    se = math.sqrt(p * (1 - p) * (1 / n1 + 1 / n0))
    assert r["mde_abs"] == round((1.959964 + 0.841621) * se, 6)

    r4 = power_mde(mk(4000)).collect()[0]
    assert r4["mde_abs"] < 0.6 * r["mde_abs"]  # ~half, same rates
