"""Kaplan–Meier survival estimation: time-to-conversion with censoring.

Duration modeling is the events-tier family the engine lacked: "how long
after the first click does a user convert?" cannot be answered with a
plain mean because users who have NOT converted yet are right-censored
— dropping them biases the estimate optimistic, and treating their
observation window as a conversion time biases it pessimistic. The
Kaplan–Meier product-limit estimator (Kaplan & Meier 1958) is the
standard nonparametric answer: at each distinct event time t_i with
d_i conversions out of n_i subjects still at risk,

    S(t) = prod over t_i <= t of (1 − d_i / n_i),

with censored subjects leaving the risk set after their censoring time
(the subjects-at-risk convention: events at t precede censorings at t).

Engine discipline (the evalmetrics shapes):

- subjects collapse to ONE row per user (first click, first subsequent
  purchase, global observation end) in two partial-agg passes; the
  curve math then runs on the COMPACT per-duration count table — the
  windows never see corpus rows.
- durations are exact integer hours (micros div 3_600_000_000); risk
  sets and event/censor counts are exact bigints.
- the product is exp(Σ ln(1 − d/n)) folded over the ordered compact
  table with a MIRRORED parenthesization; a step with d == n (everyone
  remaining converts) makes the true survival exactly 0 — ln would be
  −inf in one engine and an error in the other, so the zero is carried
  by an explicit windowed flag and the ln argument is clamped to 1 for
  that row in BOTH engines (contributing 0 to the sum, masked by the
  flag).

Scale: two corpus aggregations + a broadcast 1-row observation-end
join; everything else is model-sized. No reference counterpart —
survival analysis extension (public estimator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch

_HOUR_US = 3_600_000_000


def kaplan_meier_conversion(events: DataFrame) -> DataFrame:
    """(t_hours, n_risk, n_events, n_censored, survival): the KM curve of
    hours from a user's FIRST click to their first subsequent purchase,
    right-censored at the corpus observation end. One row per distinct
    duration-hour that carries at least one event or censoring."""
    us = F.unix_micros("ts")
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min(us).alias("fc"))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", us.alias("pu")
    )
    fp = (
        purchases.join(clicks, "user_id")
        .filter(F.col("pu") >= F.col("fc"))
        .groupBy("user_id")
        .agg(F.min("pu").alias("fp"))
    )
    obs_end = F.broadcast(events.agg(F.max(us).alias("obs_end")))
    subjects = (
        clicks.join(fp, "user_id", "left")
        .crossJoin(obs_end)
        .select(
            F.when(
                F.col("fp").isNotNull(),
                F.expr(f"(fp - fc) div {_HOUR_US}"),
            )
            .otherwise(F.expr(f"(obs_end - fc) div {_HOUR_US}"))
            .cast("bigint")
            .alias("t"),
            F.col("fp").isNotNull().cast("int").alias("ev"),
        )
    )
    per_t = subjects.groupBy("t").agg(
        F.sum("ev").cast("bigint").alias("d"),
        F.sum(1 - F.col("ev")).cast("bigint").alias("c"),
    )
    w_all = Window.partitionBy()
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = per_t.select(
        "t",
        "d",
        "c",
        (
            F.sum(F.col("d") + F.col("c")).over(w_all)
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0))
        )
        .cast("bigint")
        .alias("n_risk"),
    )
    term = F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk").cast("double")
    zeroed = F.max((F.col("d") >= F.col("n_risk")).cast("int")).over(w_cum)
    logsum = F.sum(
        F.log(F.when(term > 0, term).otherwise(F.lit(1.0)))
    ).over(w_cum)
    return (
        ranked.select(
            F.col("t").alias("t_hours"),
            "n_risk",
            F.col("d").alias("n_events"),
            F.col("c").alias("n_censored"),
            F.round(
                F.when(zeroed == 1, F.lit(0.0)).otherwise(F.exp(logsum)), 6
            ).alias("survival"),
            "d",
        )
        .filter(F.col("d") > 0)
        .drop("d")
        .orderBy("t_hours")
    )


_KM_SQL = f"""
WITH clicks AS (
  SELECT user_id, MIN(epoch_us(ts)) AS fc
  FROM events WHERE event_type = 'click' GROUP BY user_id
),
fp AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS fp
  FROM events e JOIN clicks k ON e.user_id = k.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= k.fc
  GROUP BY e.user_id
),
obs AS (SELECT MAX(epoch_us(ts)) AS obs_end FROM events),
subjects AS (
  SELECT CASE WHEN fp.fp IS NOT NULL THEN (fp.fp - k.fc) // {_HOUR_US}
              ELSE (o.obs_end - k.fc) // {_HOUR_US} END AS t,
         CAST(fp.fp IS NOT NULL AS INT) AS ev
  FROM clicks k LEFT JOIN fp ON fp.user_id = k.user_id, obs o
),
per_t AS (
  SELECT t, CAST(SUM(ev) AS BIGINT) AS d, CAST(SUM(1 - ev) AS BIGINT) AS c
  FROM subjects GROUP BY t
),
ranked AS (
  SELECT t, d, c,
         CAST(SUM(d + c) OVER ()
              - COALESCE(SUM(d + c) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS n_risk
  FROM per_t
),
curve AS (
  SELECT t, d, c, n_risk,
         MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
           OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS zeroed,
         SUM(ln(CASE WHEN 1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) > 0
                     THEN 1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)
                     ELSE 1.0 END))
           OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS logsum
  FROM ranked
)
SELECT t AS t_hours, n_risk, d AS n_events, c AS n_censored,
       ROUND(CASE WHEN zeroed = 1 THEN 0.0 ELSE EXP(logsum) END, 6) AS survival
FROM curve
WHERE d > 0
ORDER BY t_hours
"""


@query("events_kaplan_meier", oracle=_KM_SQL, defer=True)
def events_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-conversion survival curve (first click → first subsequent
    purchase, right-censored at observation end) — DuckDB replays the
    subject collapse, risk sets, and the guarded product-limit fold."""
    return kaplan_meier_conversion(tpch.load(spark, sf_dir, "events"))
