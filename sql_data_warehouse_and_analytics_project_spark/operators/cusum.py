"""CUSUM change-point monitor on the hourly event rate (Page 1954).

The events tier has outlier detectors (z-score, MAD, winsorized stats)
and smoothers (EWMA), but nothing that detects a SUSTAINED LEVEL SHIFT —
the canonical ops question "did the event rate change, and when?". The
standard sequential detector is Page's CUSUM: accumulate deviations from
a reference rate k and alarm when the accumulated drift exceeds a
decision interval h. The recursive form S_h = max(0, S_{h-1} + x_h − k)
has the closed prefix-minimum form used here (exact, window-expressible):

    P_h   = Σ_{i≤h} (x_i − k)            (P_0 = 0, exact bigints)
    S⁺_h  = P_h − min(0, min_{m≤h} P_m)   (upward shift)
    S⁻_h  = max(0, max_{m≤h} P_m) − P_h   (downward shift)

Engine discipline: x_h is the exact hourly event count
(``unix_micros div 3 600 000 000`` — the survival.py hour-bucket
discipline), k is the exact integer floor mean ``total div n_hours``
(broadcast one-row aggregate, no global window over anything unbounded),
and every P/S value is an exact bigint, so both engines agree
bit-for-bit; the only floats are the decision interval
h = ceil(5·sqrt(k)) (sqrt is IEEE-exactly-rounded) and nothing else.
The two cumulative folds run over the per-HOUR table — bounded by the
observation span in hours, never by event volume (the msprt/logrank
bound; enumerated in BENCH_NOTES_r17's window audit).

No reference counterpart — sequential-monitoring extension of the events
family (public method).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch

_HOUR_US = 3_600_000_000


def cusum_hourly(events: DataFrame) -> DataFrame:
    """(hr, n_events, k_ref, threshold, s_pos, s_neg, alarm_up,
    alarm_down): Page's CUSUM of the hourly event count against the
    integer floor-mean reference, both directions."""
    hourly = (
        events.select(F.expr(f"unix_micros(ts) div {_HOUR_US}").alias("hr"))
        .groupBy("hr")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    return cusum_from_hourly(hourly)


def cusum_from_hourly(hourly: DataFrame) -> DataFrame:
    """The CUSUM fold from an (hr, x) hourly-count table — shared by the
    batch query and the streaming monitor
    (``streaming.jobs.stream_cusum_monitor``), whose merged per-batch
    partials are a SUM monoid over exactly this shape; stream == batch
    by construction (pytest-pinned)."""
    ref = F.broadcast(
        hourly.agg(
            F.expr("sum(x) div count(1)").cast("bigint").alias("k"),
        )
    )
    w_cum = Window.orderBy("hr").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pre = hourly.crossJoin(ref).withColumn(
        "p", F.sum(F.col("x") - F.col("k")).over(w_cum)
    )
    stepped = pre.select(
        "hr",
        "x",
        "k",
        "p",
        F.least(F.lit(0).cast("bigint"), F.min("p").over(w_cum)).alias("pmin"),
        F.greatest(F.lit(0).cast("bigint"), F.max("p").over(w_cum)).alias("pmax"),
    )
    thr = F.ceil(F.lit(5.0) * F.sqrt(F.col("k").cast("double"))).cast("bigint")
    return stepped.select(
        F.col("hr").cast("bigint").alias("hr"),
        F.col("x").cast("bigint").alias("n_events"),
        F.col("k").cast("bigint").alias("k_ref"),
        thr.alias("threshold"),
        (F.col("p") - F.col("pmin")).cast("bigint").alias("s_pos"),
        (F.col("pmax") - F.col("p")).cast("bigint").alias("s_neg"),
        ((F.col("p") - F.col("pmin")) > thr).alias("alarm_up"),
        ((F.col("pmax") - F.col("p")) > thr).alias("alarm_down"),
    ).orderBy("hr")


_CUSUM_SQL = f"""
WITH hourly AS (
  SELECT epoch_us(ts) // {_HOUR_US} AS hr, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY hr
),
ref AS (SELECT CAST(SUM(x) // COUNT(*) AS BIGINT) AS k FROM hourly),
pre AS (
  SELECT hr, x, k,
         SUM(x - k) OVER (ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
  FROM hourly, ref
),
stepped AS (
  SELECT hr, x, k, p,
         LEAST(CAST(0 AS BIGINT),
               MIN(p) OVER (ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS pmin,
         GREATEST(CAST(0 AS BIGINT),
               MAX(p) OVER (ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS pmax
  FROM pre
)
SELECT CAST(hr AS BIGINT) AS hr,
       CAST(x AS BIGINT) AS n_events,
       CAST(k AS BIGINT) AS k_ref,
       CAST(CEIL(5.0 * SQRT(CAST(k AS DOUBLE))) AS BIGINT) AS threshold,
       CAST(p - pmin AS BIGINT) AS s_pos,
       CAST(pmax - p AS BIGINT) AS s_neg,
       (p - pmin) > CAST(CEIL(5.0 * SQRT(CAST(k AS DOUBLE))) AS BIGINT) AS alarm_up,
       (pmax - p) > CAST(CEIL(5.0 * SQRT(CAST(k AS DOUBLE))) AS BIGINT) AS alarm_down
FROM stepped
ORDER BY hr
"""


@query("events_cusum_hourly", oracle=_CUSUM_SQL)
def events_cusum_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM level-shift monitor on the hourly event rate —
    the sequential change-point sibling of events_zscore_outliers/EWMA.
    DuckDB replays the hour buckets, the prefix sums, the prefix
    min/max folds, and the sqrt decision interval."""
    return cusum_hourly(tpch.load(spark, sf_dir, "events"))
