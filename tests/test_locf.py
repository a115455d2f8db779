"""LOCF hourly gap-fill semantics on a planted sparse series."""

from __future__ import annotations

from datetime import datetime

from sql_data_warehouse_and_analytics_project_spark.operators import analytics_extras as ax


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string, value double"
    )


def test_locf_fills_gaps_and_flags_them(spark):
    h = lambda hr, mi=0: datetime(2024, 3, 1, hr, mi)
    rows = [
        (1, 1, h(0), "a", 10.0),
        (2, 1, h(0, 30), "a", 20.0),   # hour 0 avg = 15.0
        (3, 1, h(3), "a", 40.0),       # hours 1-2 are gaps carrying 15.0
        (4, 1, h(1), "b", 7.0),        # b starts at hour 1: leading gap at 0
    ]
    got = {
        (r["event_type"], r["hour_ts"].hour): (r["avg_value"], r["is_gap"])
        for r in ax.locf_hourly_fill(_events(spark, rows)).collect()
    }
    # dense spine hours 0..3 for both types
    assert len(got) == 8
    assert got[("a", 0)] == (15.0, False)
    assert got[("a", 1)] == (15.0, True)
    assert got[("a", 2)] == (15.0, True)
    assert got[("a", 3)] == (40.0, False)
    # leading gap before b's first observation: nothing to carry → NULL
    assert got[("b", 0)] == (None, True)
    assert got[("b", 1)] == (7.0, False)
    assert got[("b", 2)] == (7.0, True)
    assert got[("b", 3)] == (7.0, True)


def test_locf_null_values_are_excluded_from_averages(spark):
    h = lambda hr: datetime(2024, 3, 1, hr)
    rows = [
        (1, 1, h(0), "a", 10.0),
        (2, 1, h(0), "a", None),  # NULL measure must not drag the average
        (3, 1, h(1), "a", 30.0),
    ]
    got = {r["hour_ts"].hour: r["avg_value"] for r in ax.locf_hourly_fill(_events(spark, rows)).collect()}
    assert got[0] == 10.0 and got[1] == 30.0


def test_twap_weights_by_holding_time(spark):
    """Value 10 held for 18h then 100 held for 6h: plain AVG says 55,
    TWAP says 10·0.75 + 100·0.25 = 32.5. Midnight-start observation, so
    the full day is covered."""
    h = lambda hr: datetime(2024, 3, 1, hr)
    rows = [
        (1, 1, h(0), "a", 10.0),
        (2, 1, h(18), "a", 100.0),
    ]
    got = ax.twap_daily(_events(spark, rows)).collect()
    assert [(r["event_type"], str(r["day"]), r["n_events"], r["twap"]) for r in got] == [
        ("a", "2024-03-01", 2, 32.5)
    ]


def test_twap_first_observation_starts_its_own_clock(spark):
    """Observation at 12:00 held to midnight: the morning (no data) is
    NOT imputed — denominator is 12h, twap = the single value."""
    rows = [(1, 1, datetime(2024, 3, 1, 12), "a", 42.0)]
    [r] = ax.twap_daily(_events(spark, rows)).collect()
    assert r["twap"] == 42.0 and r["n_events"] == 1


def test_twap_ties_broken_by_event_id(spark):
    """Two observations at the same ts: the first (by event_id) gets
    zero weight — the (ts, event_id) total order pins which one holds."""
    h = datetime(2024, 3, 1, 0)
    rows = [(1, 1, h, "a", 10.0), (2, 1, h, "a", 30.0)]
    [r] = ax.twap_daily(_events(spark, rows)).collect()
    assert r["twap"] == 30.0


def test_autocorr_detects_planted_daily_cycle(spark):
    """Exactly 24-periodic counts → lag-24 autocorr = 1.0; a 48-periodic
    alternating-day series → −1.0; a constant series → NULL (zero
    variance)."""
    rows = []
    eid = 0
    for day in range(4):
        for hr in range(24):
            ts = datetime(2024, 3, 1 + day, hr)
            n_a = 5 if hr < 12 else 1                  # 24-periodic
            n_b = 5 if day % 2 == 0 else 1             # 48-periodic
            for _ in range(n_a):
                rows.append((eid, 1, ts, "cyc", 1.0)); eid += 1
            for _ in range(n_b):
                rows.append((eid, 1, ts, "alt", 1.0)); eid += 1
            rows.append((eid, 1, ts, "flat", 1.0)); eid += 1
    got = {r["event_type"]: r["autocorr"] for r in ax.hourly_autocorr(_events(spark, rows)).collect()}
    assert got["cyc"] == 1.0
    assert got["alt"] == -1.0
    assert got["flat"] is None


def test_peak_rate_planted_burst(spark):
    """Nine spread events plus a 5-event burst inside one hour: peak = 6
    (burst + the spread event the window catches) — hand-verified; the
    peak instant is the LAST burst event (trailing window), earliest such
    instant under ties."""
    rows = []
    eid = 0
    for hr in range(9):                      # one event every 2 hours
        rows.append((eid, 1, datetime(2024, 3, 1, hr * 2), "a", 1.0)); eid += 1
    for mi in range(5):                      # burst: 5 events 16:10..16:50
        rows.append((eid, 1, datetime(2024, 3, 1, 16, 10 * (mi + 1)), "a", 1.0)); eid += 1
    [r] = ax.peak_rate(_events(spark, rows)).collect()
    # window ending at 16:50 holds 16:00 + the 5 burst events = 6
    assert r["peak_events_1h"] == 6
    assert r["peak_at_ms"] == int(datetime(2024, 3, 1, 16, 50).timestamp() * 1000)


def test_peak_rate_window_excludes_exact_hour_boundary(spark):
    """RANGE 3599999 PRECEDING: an event exactly 1h earlier falls OUT of
    the trailing window (the window is (t-1h, t])."""
    rows = [
        (1, 1, datetime(2024, 3, 1, 10, 0), "a", 1.0),
        (2, 1, datetime(2024, 3, 1, 11, 0), "a", 1.0),
    ]
    [r] = ax.peak_rate(_events(spark, rows)).collect()
    assert r["peak_events_1h"] == 1
