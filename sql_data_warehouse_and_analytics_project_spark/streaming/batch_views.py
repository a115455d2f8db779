"""Batch-equivalent views of the streaming aggregations over ``events``.

Structured Streaming jobs (see ``jobs.py``) share these exact aggregation
shapes; registering the batch forms here gives them the same DuckDB oracle
coverage as every other operator (stream/batch unification is the point of
the DataFrame API — the same logical plan runs under ``readStream``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tpch.load(spark, sf_dir, name)


_HOURLY_SQL = """
SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


@query("stream_events_hourly", oracle=_HOURLY_SQL, defer=True)
def stream_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-hour event aggregation — the batch twin of the streaming
    windowed aggregation job (streaming has no reference counterpart; it is
    the Structured-Streaming generalization of the watermark machinery at
    scripts/silver/proc_load_silver.sql:51-53, per SURVEY §2.9)."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .orderBy("window_start", "event_type")
    )


_ATTRIB_HORIZON_HOURS = 24  # the testdata's user/ts density needs a day-scale window

_ATTRIB_SQL = f"""
SELECT p.event_id AS purchase_id,
       p.user_id,
       v.event_id AS view_id,
       v.ts AS view_ts,
       p.ts AS purchase_ts,
       p.value AS purchase_value
FROM events v
JOIN events p
  ON v.event_type = 'view' AND p.event_type = 'purchase'
 AND v.user_id = p.user_id
 AND p.ts >= v.ts
 AND p.ts <= v.ts + INTERVAL {_ATTRIB_HORIZON_HOURS} HOUR
ORDER BY purchase_id, view_id
"""


@query("stream_purchase_attribution", oracle=_ATTRIB_SQL, defer=True)
def stream_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase→view attribution within a 24-hour horizon — the batch twin
    of the stream-stream interval join (``jobs.attribute_purchases``),
    which the replay test proves bit-equal under availableNow triggers."""
    from .jobs import attribute_purchases

    events = _t(spark, sf_dir, "events")
    return attribute_purchases(
        events.filter(F.col("event_type") == "view"),
        events.filter(F.col("event_type") == "purchase"),
        horizon_minutes=_ATTRIB_HORIZON_HOURS * 60,
    ).orderBy("purchase_id", "view_id")
