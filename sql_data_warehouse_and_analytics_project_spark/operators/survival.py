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
    # BOUND (r17, VERDICT r16 ask #3): these unpartitioned folds run over
    # the per-t table, and t = (duration div _HOUR_US) is HOUR-BUCKETED —
    # the table holds at most (observation span in hours) + 1 rows, a
    # clock-bounded quantity independent of user/event count.
    # tests/test_survival.py::test_per_t_table_is_bounded_by_span_hours
    # pins this (drop the bucketing and it fails).
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


# --- log-rank test (r16): does treatment change time-to-conversion? ----------
#
# The KM curve describes ONE cohort; the experiment question is whether
# two cohorts' curves DIFFER. The standard answer is the log-rank test
# (Mantel 1966; Peto & Peto 1972): at each distinct event time t with
# n_t subjects at risk (n1_t in the treatment arm) and d_t events
# (d1_t in treatment),
#
#     O − E = Σ_t ( d1_t − d_t·n1_t/n_t )
#     V     = Σ_t  d_t·(n1_t/n_t)·(1 − n1_t/n_t)·(n_t − d_t)/(n_t − 1)
#     z = (O − E)/√V,   chi² = (O − E)²/V.
#
# Engine discipline: arms are the md5-parity split; all counts/risk sets
# are exact bigints; both float accumulations run as CUMULATIVE WINDOWS
# ordered by t (the KM logsum discipline — never an orderless SUM over
# doubles), so both engines fold identically and the statistic is
# bit-identical (the only transcendental is the final sqrt, which is
# IEEE-exactly-rounded). The n_t = 1 variance step is pinned to 0 in
# both engines (its numerator factor n_t − d_t is 0 whenever the 0/0
# could arise). Scale shape: the same two corpus collapses as KM; the
# windows run over the per-distinct-hour count table only.


def logrank_conversion(events: DataFrame) -> DataFrame:
    """One row (n_treat, n_ctrl, n_event_times, o_minus_e, var_sum, z,
    chi2): log-rank test of time-to-conversion between the md5-parity
    arms, censored at observation end (same subjects as the KM curve)."""
    from .dedup import _md5_long

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
            (_md5_long(F.col("user_id").cast("string"), 13) % 2)
            .cast("int")
            .alias("g"),
            F.when(F.col("fp").isNotNull(), F.expr(f"(fp - fc) div {_HOUR_US}"))
            .otherwise(F.expr(f"(obs_end - fc) div {_HOUR_US}"))
            .cast("bigint")
            .alias("t"),
            F.col("fp").isNotNull().cast("int").alias("ev"),
        )
    )
    per_t = subjects.groupBy("t").agg(
        F.sum(F.when(F.col("g") == 1, F.col("ev")).otherwise(0)).cast("bigint").alias("d1"),
        F.sum(F.when(F.col("g") == 1, 1 - F.col("ev")).otherwise(0)).cast("bigint").alias("c1"),
        F.sum(F.when(F.col("g") == 0, F.col("ev")).otherwise(0)).cast("bigint").alias("d0"),
        F.sum(F.when(F.col("g") == 0, 1 - F.col("ev")).otherwise(0)).cast("bigint").alias("c0"),
    )
    # BOUND (r17, VERDICT r16 ask #3): these unpartitioned folds run over
    # the per-t table, and t = (duration div _HOUR_US) is HOUR-BUCKETED —
    # the table holds at most (observation span in hours) + 1 rows, a
    # clock-bounded quantity independent of user/event count.
    # tests/test_survival.py::test_per_t_table_is_bounded_by_span_hours
    # pins this (drop the bucketing and it fails).
    w_all = Window.partitionBy()
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    leave1 = F.col("d1") + F.col("c1")
    leave0 = F.col("d0") + F.col("c0")
    ranked = per_t.select(
        "t",
        "d1",
        "d0",
        (F.sum(leave1).over(w_all) - F.coalesce(F.sum(leave1).over(w_prev), F.lit(0)))
        .cast("bigint")
        .alias("n1"),
        (F.sum(leave0).over(w_all) - F.coalesce(F.sum(leave0).over(w_prev), F.lit(0)))
        .cast("bigint")
        .alias("n0"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    nt = F.col("n1") + F.col("n0")
    dt = F.col("d1") + F.col("d0")
    p1 = d("n1") / nt.cast("double")
    term_oe = d("d1") - dt.cast("double") * p1
    term_v = F.when(
        nt > 1,
        dt.cast("double")
        * p1
        * (F.lit(1.0) - p1)
        * ((nt - dt).cast("double") / (nt - 1).cast("double")),
    ).otherwise(F.lit(0.0))
    # cumulative-window folds ordered by t; the last row carries the sums
    folded = (
        ranked.filter(dt > 0)
        .withColumn("oe", F.sum(term_oe).over(w_cum))
        .withColumn("v", F.sum(term_v).over(w_cum))
        .withColumn("ntimes", F.count(F.lit(1)).over(w_cum))
        .withColumn("mx", F.max("t").over(w_all))
        .filter(F.col("t") == F.col("mx"))
    )
    totals = F.broadcast(
        subjects.agg(
            F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).cast("bigint").alias("n_treat"),
            F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).cast("bigint").alias("n_ctrl"),
        )
    )
    return folded.crossJoin(totals).select(
        "n_treat",
        "n_ctrl",
        F.col("ntimes").cast("bigint").alias("n_event_times"),
        F.round("oe", 6).alias("o_minus_e"),
        F.round("v", 6).alias("var_sum"),
        F.round(F.col("oe") / F.nullif(F.sqrt(F.col("v")), F.lit(0.0)), 6).alias("z"),
        F.round(
            F.col("oe") * F.col("oe") / F.nullif(F.col("v"), F.lit(0.0)), 6
        ).alias("chi2"),
    )


_LOGRANK_SQL = f"""
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
  SELECT ('0x' || substr(md5(CAST(k.user_id AS VARCHAR)), 1, 13))::BIGINT % 2 AS g,
         CASE WHEN fp.fp IS NOT NULL THEN (fp.fp - k.fc) // {_HOUR_US}
              ELSE (o.obs_end - k.fc) // {_HOUR_US} END AS t,
         CAST(fp.fp IS NOT NULL AS INT) AS ev
  FROM clicks k LEFT JOIN fp ON fp.user_id = k.user_id, obs o
),
per_t AS (
  SELECT t,
         CAST(SUM(CASE WHEN g = 1 THEN ev ELSE 0 END) AS BIGINT) AS d1,
         CAST(SUM(CASE WHEN g = 1 THEN 1 - ev ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN g = 0 THEN ev ELSE 0 END) AS BIGINT) AS d0,
         CAST(SUM(CASE WHEN g = 0 THEN 1 - ev ELSE 0 END) AS BIGINT) AS c0
  FROM subjects GROUP BY t
),
ranked AS (
  SELECT t, d1, d0,
         CAST(SUM(d1 + c1) OVER ()
              - COALESCE(SUM(d1 + c1) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS n1,
         CAST(SUM(d0 + c0) OVER ()
              - COALESCE(SUM(d0 + c0) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS n0
  FROM per_t
),
folded AS (
  SELECT t,
         SUM(CAST(d1 AS DOUBLE)
             - CAST(d1 + d0 AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE)))
           OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS oe,
         SUM(CASE WHEN n1 + n0 > 1
                  THEN CAST(d1 + d0 AS DOUBLE)
                       * (CAST(n1 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE))
                       * (1.0 - CAST(n1 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE))
                       * (CAST(n1 + n0 - d1 - d0 AS DOUBLE) / CAST(n1 + n0 - 1 AS DOUBLE))
                  ELSE 0.0 END)
           OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v,
         COUNT(*) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ntimes,
         MAX(t) OVER () AS mx
  FROM ranked WHERE d1 + d0 > 0
),
totals AS (
  SELECT CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_treat,
         CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ctrl
  FROM subjects
)
SELECT n_treat, n_ctrl,
       CAST(ntimes AS BIGINT) AS n_event_times,
       ROUND(oe, 6) AS o_minus_e,
       ROUND(v, 6) AS var_sum,
       ROUND(oe / NULLIF(SQRT(v), 0.0), 6) AS z,
       ROUND(oe * oe / NULLIF(v, 0.0), 6) AS chi2
FROM folded f, totals WHERE f.t = f.mx
"""


@query("events_logrank_ab", oracle=_LOGRANK_SQL)
def events_logrank_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test of time-to-conversion between the md5-parity arms —
    the experiment companion of events_kaplan_meier. DuckDB replays the
    subject collapse, per-arm risk sets, and both window folds."""
    return logrank_conversion(tpch.load(spark, sf_dir, "events"))
