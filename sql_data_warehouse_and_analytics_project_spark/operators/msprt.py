"""Always-valid sequential A/B readout: mixture SPRT (mSPRT).

The batch A/B tier (CUPED, MWU, KS, CMH, delta-ratio, QTE) answers
"is there an effect?" on a FIXED sample; a live experiment dashboard is
read continuously, and repeatedly eyeballing a fixed-horizon p-value
inflates the false-positive rate without bound (the peeking problem).
The standard fix is the mixture sequential probability ratio test
(Robbins 1970's mixture martingale; Johari, Koomen, Pekelis & Walsh
2017's "always-valid inference" formulation): the mixture likelihood
ratio Λ_n is a nonnegative martingale under H0, so by Ville's
inequality P(sup_n Λ_n ≥ 1/α) ≤ α and

    p_n = min(1, min_{m ≤ n} 1/Λ_m)

is an always-valid p-value — valid at EVERY look simultaneously, so the
monitor can be consulted after any ingest batch with no alpha spending.

For the two-proportion stream here (trial = event, success = purchase,
arm = the repo's md5-parity user split) with a normal mixture prior
N(0, τ²) over the lift θ = p1 − p0, the likelihood ratio after n
observations with plug-in variance V_n = p̂(1−p̂)·(1/n1 + 1/n0) is

    log Λ_n = ½·ln(V_n / (V_n + τ²)) + θ̂_n²·τ² / (2·V_n·(V_n + τ²))

Engine discipline: all counts are exact cumulative bigints folded over
the per-HOUR bucket table (`unix_micros div 3600 000 000` — integer
day-number arithmetic identical in both engines, the survival.py
discipline), so the unpartitioned cumulative windows run over a table
bounded by the OBSERVATION SPAN IN HOURS, never by event or user
count. θ̂/V/log Λ derive from the exact counts through ONE mirrored
parenthesization; ln/exp are the two libm calls (the BH/perplexity
tolerance class). Degenerate hours (an arm still empty, or p̂ ∈ {0,1}
making V = 0) NULLIF log Λ to NULL in both engines; their per-look
p-value is LEAST(1, exp(−NULL)) = 1 — Spark and DuckDB both skip the
NULL argument of LEAST — i.e. a look with no evidence contributes
p = 1, never a rejection, exactly the always-valid convention.

Streaming twin: ``streaming.jobs.sink_stream_msprt_counts`` lands the
per-(hour, arm) trial/success partials per ingest batch (a sum-merge
monoid, idempotent per-batch overwrite) and
``streaming.jobs.stream_msprt_monitor`` merges them and calls the SAME
``msprt_boundary`` fold — stream == batch by construction,
pytest-pinned per ingest batch (tests/test_streaming.py).

No reference counterpart — experimentation-tier extension (public
methods).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch

_HOUR_US = 3_600_000_000
_TAU2 = 1e-4  # mixture prior variance over the lift (τ = 1% absolute)
_ALPHA = 0.05


def msprt_counts(events: DataFrame) -> DataFrame:
    """(hr, t, n, x): per hour-bucket and md5-parity arm, the exact
    trial count (events) and success count (purchases)."""
    from .dedup import _md5_long

    return (
        events.select(
            F.expr(f"unix_micros(ts) div {_HOUR_US}").alias("hr"),
            (_md5_long(F.col("user_id").cast("string"), 13) % 2)
            .cast("int")
            .alias("t"),
            (F.col("event_type") == "purchase").cast("int").alias("s"),
        )
        .groupBy("hr", "t")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("s").cast("bigint").alias("x"),
        )
    )


def msprt_boundary(counts: DataFrame) -> DataFrame:
    """(hr, n_treat, n_ctrl, x_treat, x_ctrl, theta_hat, log_lambda,
    p_always_valid, rejected) per hour: the mSPRT boundary over the
    cumulative exact counts of a (hr, t, n, x) table.

    The two unpartitioned cumulative windows (count fold, running-min
    p-value) run over the per-hour table — bounded by the observation
    span in hours, not by event volume (the survival.py per-t bound)."""
    hourly = counts.groupBy("hr").agg(
        F.sum(F.when(F.col("t") == 1, F.col("n")).otherwise(0)).cast("bigint").alias("n1h"),
        F.sum(F.when(F.col("t") == 0, F.col("n")).otherwise(0)).cast("bigint").alias("n0h"),
        F.sum(F.when(F.col("t") == 1, F.col("x")).otherwise(0)).cast("bigint").alias("x1h"),
        F.sum(F.when(F.col("t") == 0, F.col("x")).otherwise(0)).cast("bigint").alias("x0h"),
    )
    w_cum = Window.orderBy("hr").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = hourly.select(
        "hr",
        F.sum("n1h").over(w_cum).alias("n1"),
        F.sum("n0h").over(w_cum).alias("n0"),
        F.sum("x1h").over(w_cum).alias("x1"),
        F.sum("x0h").over(w_cum).alias("x0"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    theta = d("x1") / F.nullif(d("n1"), F.lit(0.0)) - d("x0") / F.nullif(
        d("n0"), F.lit(0.0)
    )
    pp = (d("x1") + d("x0")) / (d("n1") + d("n0"))
    v = F.nullif(
        (pp * (F.lit(1.0) - pp))
        * (F.lit(1.0) / F.nullif(d("n1"), F.lit(0.0))
           + F.lit(1.0) / F.nullif(d("n0"), F.lit(0.0))),
        F.lit(0.0),
    )
    tau2 = F.lit(_TAU2)
    log_lam = F.lit(0.5) * F.log(v / (v + tau2)) + (theta * theta) * tau2 / (
        F.lit(2.0) * v * (v + tau2)
    )
    stepped = cum.withColumn("theta_hat", theta).withColumn("log_lambda", log_lam)
    # per-look p = min(1, 1/Λ); always-valid p = running min over looks
    # (NULL degenerate looks are skipped by MIN in both engines)
    p_look = F.least(F.lit(1.0), F.exp(-F.col("log_lambda")))
    w_min = Window.orderBy("hr").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = stepped.withColumn("p_av", F.min(p_look).over(w_min))
    return out.select(
        F.col("hr").cast("bigint").alias("hr"),
        F.col("n1").cast("bigint").alias("n_treat"),
        F.col("n0").cast("bigint").alias("n_ctrl"),
        F.col("x1").cast("bigint").alias("x_treat"),
        F.col("x0").cast("bigint").alias("x_ctrl"),
        F.round("theta_hat", 6).alias("theta_hat"),
        F.round("log_lambda", 6).alias("log_lambda"),
        F.round("p_av", 6).alias("p_always_valid"),
        F.coalesce(F.col("p_av") <= F.lit(_ALPHA), F.lit(False)).alias("rejected"),
    ).orderBy("hr")


_MSPRT_SQL = f"""
WITH ev AS (
  SELECT epoch_us(ts) // {_HOUR_US} AS hr,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))::BIGINT % 2 AS t,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS s
  FROM events
),
hourly AS (
  SELECT hr,
         CAST(SUM(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1h,
         CAST(SUM(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0h,
         CAST(SUM(CASE WHEN t = 1 THEN s ELSE 0 END) AS BIGINT) AS x1h,
         CAST(SUM(CASE WHEN t = 0 THEN s ELSE 0 END) AS BIGINT) AS x0h
  FROM ev GROUP BY hr
),
cum AS (
  SELECT hr,
         SUM(n1h) OVER (ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n1,
         SUM(n0h) OVER (ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n0,
         SUM(x1h) OVER (ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS x1,
         SUM(x0h) OVER (ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS x0
  FROM hourly
),
stepped AS (
  SELECT hr, n1, n0, x1, x0,
         CAST(x1 AS DOUBLE) / NULLIF(CAST(n1 AS DOUBLE), 0.0)
           - CAST(x0 AS DOUBLE) / NULLIF(CAST(n0 AS DOUBLE), 0.0) AS theta_hat,
         0.5 * LN(
           NULLIF(((CAST(x1 AS DOUBLE) + CAST(x0 AS DOUBLE)) / (CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE))
                   * (1.0 - (CAST(x1 AS DOUBLE) + CAST(x0 AS DOUBLE)) / (CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE))))
                  * (1.0 / NULLIF(CAST(n1 AS DOUBLE), 0.0) + 1.0 / NULLIF(CAST(n0 AS DOUBLE), 0.0)), 0.0)
           / (NULLIF(((CAST(x1 AS DOUBLE) + CAST(x0 AS DOUBLE)) / (CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE))
                      * (1.0 - (CAST(x1 AS DOUBLE) + CAST(x0 AS DOUBLE)) / (CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE))))
                     * (1.0 / NULLIF(CAST(n1 AS DOUBLE), 0.0) + 1.0 / NULLIF(CAST(n0 AS DOUBLE), 0.0)), 0.0)
              + {_TAU2}))
         + ((CAST(x1 AS DOUBLE) / NULLIF(CAST(n1 AS DOUBLE), 0.0)
             - CAST(x0 AS DOUBLE) / NULLIF(CAST(n0 AS DOUBLE), 0.0))
            * (CAST(x1 AS DOUBLE) / NULLIF(CAST(n1 AS DOUBLE), 0.0)
               - CAST(x0 AS DOUBLE) / NULLIF(CAST(n0 AS DOUBLE), 0.0))) * {_TAU2}
           / (2.0 * NULLIF(((CAST(x1 AS DOUBLE) + CAST(x0 AS DOUBLE)) / (CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE))
                            * (1.0 - (CAST(x1 AS DOUBLE) + CAST(x0 AS DOUBLE)) / (CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE))))
                           * (1.0 / NULLIF(CAST(n1 AS DOUBLE), 0.0) + 1.0 / NULLIF(CAST(n0 AS DOUBLE), 0.0)), 0.0)
              * (NULLIF(((CAST(x1 AS DOUBLE) + CAST(x0 AS DOUBLE)) / (CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE))
                         * (1.0 - (CAST(x1 AS DOUBLE) + CAST(x0 AS DOUBLE)) / (CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE))))
                        * (1.0 / NULLIF(CAST(n1 AS DOUBLE), 0.0) + 1.0 / NULLIF(CAST(n0 AS DOUBLE), 0.0)), 0.0)
                 + {_TAU2})) AS log_lambda
  FROM cum
),
looked AS (
  SELECT *,
         MIN(LEAST(1.0, EXP(-log_lambda)))
           OVER (ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_av
  FROM stepped
)
SELECT CAST(hr AS BIGINT) AS hr,
       CAST(n1 AS BIGINT) AS n_treat,
       CAST(n0 AS BIGINT) AS n_ctrl,
       CAST(x1 AS BIGINT) AS x_treat,
       CAST(x0 AS BIGINT) AS x_ctrl,
       ROUND(theta_hat, 6) AS theta_hat,
       ROUND(log_lambda, 6) AS log_lambda,
       ROUND(p_av, 6) AS p_always_valid,
       COALESCE(p_av <= {_ALPHA}, FALSE) AS rejected
FROM looked
ORDER BY hr
"""


@query("eval_msprt_ab", oracle=_MSPRT_SQL)
def eval_msprt_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mSPRT always-valid sequential monitor of purchase conversion,
    treatment vs control by the md5-parity split, one decision row per
    observed hour — the peeking-safe readout the streaming monitor
    serves live. DuckDB replays the hour buckets, the cumulative exact
    counts, the mixture log-likelihood ratio, and the running-min
    always-valid p-value."""
    return msprt_boundary(msprt_counts(tpch.load(spark, sf_dir, "events")))
