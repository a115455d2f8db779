"""Planted-scale stress for the r14 temporal joins (the test_scale_stress
discipline applied to asof_join_backward and interval_overlap_counts):
drive both at ~20x the sf0.1 events volume with the pathologies that
break naive implementations — a hot key holding 30% of all rows for the
as-of join, and a join-then-rank/cartesian temptation for the interval
join — and assert (a) wall-clock grows sub-quadratically between half-
and full-size runs, (b) planted rows come back exactly right."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from sql_data_warehouse_and_analytics_project_spark.operators.temporal import (
    asof_join_backward,
    interval_overlap_counts,
)

_N_FULL = 2_000_000  # events rows; sf0.1 carries 100k


def _events(spark, n: int):
    """Deterministic synthetic event stream, generated distributed.
    user 0 is the hot key (~30% of rows); timestamps spread over 30 days
    with a deterministic non-monotonic shuffle (id*2654435761 mod range).
    Every 5th row is a purchase, rows ≡1,2 (mod 5) are clicks."""
    base = F.lit("2024-01-01 00:00:00").cast("timestamp")
    sec = (F.col("id") * 2654435761) % (30 * 24 * 3600)
    user = F.when(F.col("id") % 10 < 3, 0).otherwise(F.col("id") % 997)
    etype = (
        F.when(F.col("id") % 5 == 0, "purchase")
        .when(F.col("id") % 5 < 3, "click")
        .when(F.col("id") % 5 == 3, "error")
        .otherwise("view")
    )
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        (base + F.make_interval(secs=sec.cast("double"))).alias("ts"),
        user.cast("bigint").alias("user_id"),
        etype.alias("event_type"),
        ((F.col("id") % 1000).cast("double") / 10).alias("value"),
    )


def _timed_asof(events):
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("v"))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    t0 = time.perf_counter()
    n = asof_join_backward(
        purchases, clicks, "user_id", "user_id", "ts", "ts",
        payload=["ts", "v"], payload_alias=["m_ts", "m_v"], inner=False,
    ).count()
    return time.perf_counter() - t0, n


@pytest.mark.slow
def test_asof_join_survives_hot_key_scale(spark):
    half, full = _events(spark, _N_FULL // 2), _events(spark, _N_FULL)
    _timed_asof(_events(spark, 20_000))  # JIT warm
    t_half, n_half = _timed_asof(half)
    t_full, n_full = _timed_asof(full)
    # union-tag + one window is linear-ish in rows per key; a join-then-rank
    # rewrite would square on user 0 (600k x 600k candidate rows) and blow
    # far past this bound
    assert t_full <= 3.5 * t_half + 15.0, (t_half, t_full)
    # every purchase row survives the left as-of (row preservation)
    assert n_full == _N_FULL // 5
    assert n_half == _N_FULL // 10


@pytest.mark.slow
def test_interval_join_survives_scale(spark):
    def timed(events):
        errors = events.filter(F.col("event_type") == "error").select("ts")
        purchases = events.filter(F.col("event_type") == "purchase").select(
            "event_id", "ts"
        )
        t0 = time.perf_counter()
        out = interval_overlap_counts(purchases, errors, window_ms=60_000)
        n = out.count()
        return time.perf_counter() - t0, n, out

    timed(_events(spark, 20_000))  # JIT warm
    t_half, n_half, _ = timed(_events(spark, _N_FULL // 2))
    t_full, n_full, out = timed(_events(spark, _N_FULL))
    # bucketing keeps candidates ~ per-bucket density; the naive range
    # join (cartesian under Spark) would be ~400k x 2M and detonate
    assert t_full <= 3.5 * t_half + 15.0, (t_half, t_full)
    assert n_full == _N_FULL // 5 and n_half == _N_FULL // 10

    # planted correctness spot-check: pick one purchase and recount its
    # overlaps with an independent driver-side filter on the tiny slice
    row = out.orderBy("event_id").limit(1).collect()[0]
    events = _events(spark, _N_FULL)
    p_ms = F.unix_millis(F.lit(row["ts"]))
    want = (
        events.filter(F.col("event_type") == "error")
        .filter(
            (p_ms >= F.unix_millis("ts"))
            & (p_ms < F.unix_millis("ts") + F.lit(60_000))
        )
        .count()
    )
    assert row["n_overlaps"] == want
