"""Unit tests for the as-of join operator on crafted data: interleaved
timestamps, equal-timestamp ties (right row wins), keys with no right rows,
and outer semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sql_data_warehouse_and_analytics_project_spark.operators.temporal import asof_join_backward


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_backward_crafted(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-05 00:00:00")),   # after q1 → q1
            (2, "u1", _ts("2024-01-10 00:00:00")),   # exactly at q2 → q2 (tie: right wins)
            (3, "u1", _ts("2024-01-09 23:59:59")),   # just before q2 → q1
            (4, "u2", _ts("2024-01-01 00:00:00")),   # before u2's only quote → no match
            (5, "u3", _ts("2024-01-02 00:00:00")),   # key with no right rows → no match
        ],
        "id int, k string, t timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 00:00:00"), "q1"),
            ("u1", _ts("2024-01-10 00:00:00"), "q2"),
            ("u2", _ts("2024-06-01 00:00:00"), "q9"),
        ],
        "k string, t timestamp, quote string",
    )
    inner = asof_join_backward(
        left, right, "k", "k", "t", "t", "quote", "matched", inner=True
    )
    got = {r["id"]: r["matched"] for r in inner.collect()}
    assert got == {1: "q1", 2: "q2", 3: "q1"}

    outer = asof_join_backward(
        left, right, "k", "k", "t", "t", "quote", "matched", inner=False
    )
    got_outer = {r["id"]: r["matched"] for r in outer.collect()}
    assert got_outer == {1: "q1", 2: "q2", 3: "q1", 4: None, 5: None}


def test_asof_single_shuffle_plan(spark):
    """The as-of join is one hash shuffle on the key + one sort — no
    join-then-rank pair blowup, no extra exchanges."""
    from sql_data_warehouse_and_analytics_project_spark.plans import audit

    left = spark.range(100).select(
        F.col("id").alias("lid"), (F.col("id") % 10).alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("t"),
    )
    right = spark.range(50).select(
        (F.col("id") % 10).alias("k"), F.timestamp_seconds(F.col("id") * 97).alias("t"),
        F.col("id").alias("payload"),
    )
    out = asof_join_backward(left, right, "k", "k", "t", "t", "payload")
    plan = audit.executed_plan(out)
    assert audit.data_shuffle_count(plan) == 1, plan
    assert "Join" not in plan  # pure union + window, never a pairwise join


def test_asof_multi_payload_carries_matched_struct(spark):
    """Matched ts + value ride together; outer rows get NULLs in both."""
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-05 00:00:00")), (2, "u2", _ts("2024-01-01 00:00:00"))],
        "id int, k string, t timestamp",
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-03 00:00:00"), 42.5)],
        "k string, t timestamp, v double",
    )
    out = asof_join_backward(
        left, right, "k", "k", "t", "t",
        payload=["t", "v"], payload_alias=["m_t", "m_v"], inner=False,
    ).collect()
    got = {r["id"]: (r["m_t"], r["m_v"]) for r in out}
    assert got[1] == (_ts("2024-01-03 00:00:00"), 42.5)
    assert got[2] == (None, None)


def test_asof_inner_keeps_matched_null_payload_field(spark):
    """A matched right row whose payload FIELD is NULL must survive
    inner=True (the match existence test is on the struct, not a field)."""
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-05 00:00:00"))], "id int, k string, t timestamp"
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-03 00:00:00"), None)], "k string, t timestamp, v double"
    )
    out = asof_join_backward(
        left, right, "k", "k", "t", "t", payload="v", payload_alias="m_v", inner=True
    ).collect()
    assert len(out) == 1 and out[0]["m_v"] is None


def test_interval_overlap_counts_boundaries(spark):
    """Half-open [start, start+W): start included, end excluded; an
    interval straddling a bucket boundary still matches points in the
    next bucket; non-overlapping points come back with 0."""
    from sql_data_warehouse_and_analytics_project_spark.operators.temporal import (
        interval_overlap_counts,
    )

    W = 30 * 60 * 1000  # 30 min
    intervals = spark.createDataFrame(
        [(_ts("2024-01-01 00:10:00"),), (_ts("2024-01-01 00:20:00"),)], "ts timestamp"
    )
    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:10:00")),  # == start of i1 → in i1
            (2, _ts("2024-01-01 00:40:00")),  # end of i1 (excluded) → only i2
            (3, _ts("2024-01-01 00:39:59")),  # in both (crosses i1's bucket edge)
            (4, _ts("2024-01-01 02:00:00")),  # in none
            (5, _ts("2024-01-01 00:49:59")),  # last instant of i2
        ],
        "id int, ts timestamp",
    )
    got = {
        r["id"]: (r["n_overlaps"], r["last_overlap_start"])
        for r in interval_overlap_counts(points, intervals, W).collect()
    }
    assert got[1] == (1, _ts("2024-01-01 00:10:00"))
    assert got[2] == (1, _ts("2024-01-01 00:20:00"))
    assert got[3] == (2, _ts("2024-01-01 00:20:00"))
    assert got[4] == (0, None)
    assert got[5] == (1, _ts("2024-01-01 00:20:00"))

    import pytest as _pytest

    with _pytest.raises(ValueError):
        interval_overlap_counts(points, intervals, 0)


def test_interval_join_no_cartesian_plan(spark):
    """The physical plan must be an equi join on the bucket — never
    BroadcastNestedLoopJoin/CartesianProduct."""
    from sql_data_warehouse_and_analytics_project_spark.operators.temporal import (
        interval_overlap_counts,
    )

    intervals = spark.createDataFrame([(_ts("2024-01-01 00:10:00"),)], "ts timestamp")
    points = spark.createDataFrame([(1, _ts("2024-01-01 00:10:00"))], "id int, ts timestamp")
    plan = interval_overlap_counts(points, intervals, 60000)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ewma_hourly_hand_computed(spark):
    """3-point EWMA, weights 4/2/1 — hand-checked dense series including
    a missing hour (true zero) and the short-prefix normalization."""
    from sql_data_warehouse_and_analytics_project_spark.operators.analytics_extras import (
        ewma_hourly,
    )

    events = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:15:00"), "a", 8.0),
            (2, _ts("2024-01-01 00:45:00"), "a", 4.0),
            # hour 01 missing entirely → hv = 0
            (3, _ts("2024-01-01 02:30:00"), "a", 6.0),
        ],
        "event_id int, ts timestamp, event_type string, value double",
    )
    got = {
        r["hour_ts"].hour: (r["hourly_value"], r["ewma_value"])
        for r in ewma_hourly(events, points=3).collect()
    }
    # hour0: hv=12 → den=4           → 12*4/4 = 12
    # hour1: hv=0  → (0*4 + 12*2)/6  = 4
    # hour2: hv=6  → (6*4+0*2+12*1)/7 = 36/7
    assert got[0] == (12.0, 12.0)
    assert got[1] == (0.0, 4.0)
    assert got[2] == (6.0, round(36 / 7, 6))

    import pytest as _pytest

    with _pytest.raises(ValueError):
        ewma_hourly(events, points=0)


def test_grouping_sets_proper_subset_of_cube(spark):
    """GROUPING SETS ((a,b),(a),()) emits exactly those three grains —
    the (b)-only rows a CUBE would add are absent — and its present
    grains agree with the CUBE's row-for-row."""
    df = spark.createDataFrame(
        [("x", 1, 10.0), ("x", 2, 20.0), ("y", 1, 30.0)], "a string, b int, v double"
    )
    gs = (
        df.groupingSets([["a", "b"], ["a"], []], "a", "b")
        .agg(
            F.sum("v").alias("s"),
            F.grouping("a").alias("ga"),
            F.grouping("b").alias("gb"),
        )
        .collect()
    )
    cube = {
        (r["a"], r["b"], r["ga"], r["gb"]): r["s"]
        for r in df.cube("a", "b")
        .agg(F.sum("v").alias("s"), F.grouping("a").alias("ga"), F.grouping("b").alias("gb"))
        .collect()
    }
    grains = {(r["ga"], r["gb"]) for r in gs}
    assert grains == {(0, 0), (0, 1), (1, 1)}  # no (1, 0) = (b)-only grain
    assert len(gs) == 3 + 2 + 1
    for r in gs:
        assert cube[(r["a"], r["b"], r["ga"], r["gb"])] == r["s"]


def test_asof_forward_crafted(spark):
    """Forward mirror: earliest right at-or-after left; equal-ts right
    wins; no future right row -> NULL (outer) / dropped (inner)."""
    from sql_data_warehouse_and_analytics_project_spark.operators.temporal import (
        asof_join_forward,
    )

    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-05 00:00:00")),   # before q2 → q2
            (2, "u1", _ts("2024-01-10 00:00:00")),   # exactly at q2 → q2
            (3, "u1", _ts("2024-01-10 00:00:01")),   # after the last quote → none
            (4, "u2", _ts("2024-01-01 00:00:00")),   # u2's quote is later → q9
        ],
        "id int, k string, t timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 00:00:00"), "q1"),
            ("u1", _ts("2024-01-10 00:00:00"), "q2"),
            ("u2", _ts("2024-06-01 00:00:00"), "q9"),
        ],
        "k string, t timestamp, quote string",
    )
    outer = asof_join_forward(
        left, right, "k", "k", "t", "t", "quote", "matched", inner=False
    )
    got = {r["id"]: r["matched"] for r in outer.collect()}
    assert got == {1: "q2", 2: "q2", 3: None, 4: "q9"}
    inner = asof_join_forward(
        left, right, "k", "k", "t", "t", "quote", "matched", inner=True
    )
    assert {r["id"] for r in inner.collect()} == {1, 2, 4}


def test_asof_assert_unique_raises_on_equal_time_dupes(spark):
    """assert_unique=True fails the job on planted duplicate (key, time)
    right rows — the order-dependent-payload hazard — and passes
    untouched when the right side is unique (VERDICT r14 ask #3)."""
    import pytest as _pytest

    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-05 00:00:00"))], "id int, k string, t timestamp"
    )
    dup_right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 00:00:00"), "qa"),
            ("u1", _ts("2024-01-01 00:00:00"), "qb"),  # same (key, time)
        ],
        "k string, t timestamp, quote string",
    )
    bad = asof_join_backward(
        left, dup_right, "k", "k", "t", "t", "quote", "m", assert_unique=True
    )
    with _pytest.raises(Exception, match="not unique"):
        bad.collect()

    uniq_right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 00:00:00"), "qa"),
            ("u1", _ts("2024-01-02 00:00:00"), "qb"),
        ],
        "k string, t timestamp, quote string",
    )
    ok = asof_join_backward(
        left, uniq_right, "k", "k", "t", "t", "quote", "m", assert_unique=True
    )
    assert [r["m"] for r in ok.collect()] == ["qb"]

    from sql_data_warehouse_and_analytics_project_spark.operators.temporal import (
        asof_join_forward,
    )

    fwd_bad = asof_join_forward(
        spark.createDataFrame(
            [(1, "u1", _ts("2023-12-01 00:00:00"))], "id int, k string, t timestamp"
        ),
        dup_right, "k", "k", "t", "t", "quote", "m", assert_unique=True,
    )
    with _pytest.raises(Exception, match="not unique"):
        fwd_bad.collect()


def test_asof_reserved_temp_cols_rejected(spark):
    """An input frame already carrying a helper temp column must error
    loudly instead of silently producing wrong columns (ADVICE r14)."""
    import pytest as _pytest

    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-05 00:00:00"), 9)],
        "id int, k string, t timestamp, _pm int",
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01 00:00:00"), "q")], "k string, t timestamp, quote string"
    )
    with _pytest.raises(ValueError, match="reserved temp column"):
        asof_join_backward(left, right, "k", "k", "t", "t", "quote", "m")

    from sql_data_warehouse_and_analytics_project_spark.operators.temporal import (
        interval_overlap_counts,
    )

    pts = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:10:00"), 0)], "id int, ts timestamp, __bucket int"
    )
    iv = spark.createDataFrame([(_ts("2024-01-01 00:10:00"),)], "ts timestamp")
    with _pytest.raises(ValueError, match="reserved temp column"):
        interval_overlap_counts(pts, iv, 60000)


def test_interval_micros_exact_predicate(spark):
    """The exact containment predicate compares MICROSECONDS (ADVICE r14
    medium): same-millisecond boundary pairs classify by their µs values
    — start is included at µs precision, start+W is excluded even when
    the µs difference is below 1 ms — and the ms bucketing still routes
    every µs-exact pair into a shared bucket."""
    from sql_data_warehouse_and_analytics_project_spark.operators.temporal import (
        interval_overlap_counts,
    )

    W = 30 * 60 * 1000
    base = _ts("2024-01-01 00:10:00.000500")  # sub-ms start
    intervals = spark.createDataFrame([(base,)], "ts timestamp")
    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:10:00.000500")),  # == start (same µs) → in
            (2, _ts("2024-01-01 00:10:00.000200")),  # same ms, 300µs early → out
            (3, _ts("2024-01-01 00:40:00.000499")),  # 1µs before end → in
            (4, _ts("2024-01-01 00:40:00.000500")),  # == start+W (same ms) → out
        ],
        "id int, ts timestamp",
    )
    got = {
        r["id"]: r["n_overlaps"]
        for r in interval_overlap_counts(points, intervals, W).collect()
    }
    assert got == {1: 1, 2: 0, 3: 1, 4: 0}


def test_interval_rejoin_null_safe_point_columns(spark):
    """A point row with a NULL non-timestamp column must still rejoin its
    own aggregate (eqNullSafe rejoin, ADVICE r14): NULL payload + real
    overlaps must NOT collapse to n_overlaps=0."""
    from sql_data_warehouse_and_analytics_project_spark.operators.temporal import (
        interval_overlap_counts,
    )

    intervals = spark.createDataFrame([(_ts("2024-01-01 00:10:00"),)], "ts timestamp")
    points = spark.createDataFrame(
        [(1, None, _ts("2024-01-01 00:15:00")), (2, "x", _ts("2024-01-01 00:15:00"))],
        "id int, tag string, ts timestamp",
    )
    got = {
        r["id"]: (r["tag"], r["n_overlaps"])
        for r in interval_overlap_counts(points, intervals, 30 * 60 * 1000).collect()
    }
    assert got == {1: (None, 1), 2: ("x", 1)}
