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
