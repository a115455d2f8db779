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


@query("stream_events_hourly", oracle=_HOURLY_SQL)
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
