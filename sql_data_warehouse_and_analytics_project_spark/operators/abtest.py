"""A/B experiment readout with CUPED variance reduction.

The experimentation half of eval infrastructure: a raw treatment/control
comparison of a noisy metric needs enormous samples; CUPED (Deng, Xu,
Kohavi & Walker, WSDM 2013) removes the variance explained by a
PRE-EXPERIMENT covariate — Y_adj = Y − θ·(X − X̄) with θ = cov(X,Y)/var(X)
pooled across arms — shrinking the metric's variance by the squared
pre/post correlation while leaving the treatment-effect estimate
unbiased (assignment is independent of X).

Engine discipline: units collapse to ONE row per user (one conditional
partial-agg pass: X = period-1 click value, Y = period-2 purchase
value, both 1e6 fixed-point bigints; the period split is the exact
midpoint of the observed micros range); all second-moment sums
(Σx², Σxy, Σy²) accumulate in decimal(38,0) (Spark) / HUGEINT (DuckDB)
— exact past int64 — and every float (θ, means, variances) derives from
those exact sums through ONE mirrored parenthesization, so both engines
round identically. Treatment assignment is the md5-parity hash split
(the conformal/split-leakage convention). Scale: one corpus pass + a
2-row arm rollup; nothing downstream sees corpus rows.

Output: one row per arm with the raw and CUPED-adjusted post-period
mean and sample variance, plus the pooled θ and the variance-reduction
ratio — the numbers an experiment dashboard renders.

No reference counterpart — experimentation-tier extension (public
method).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch

_FP = 1_000_000


def cuped_ab_readout(events: DataFrame) -> DataFrame:
    """(treatment, n_users, mean_post, mean_post_cuped, var_post,
    var_post_cuped, theta, var_reduction) per md5-parity arm."""
    from .dedup import _md5_long

    us = F.unix_micros("ts")
    ev = events.select(
        "user_id",
        us.alias("us"),
        "event_type",
        F.floor(F.col("value") * F.lit(float(_FP))).cast("bigint").alias("vfp"),
    )
    bounds = F.broadcast(
        ev.agg(F.min("us").alias("t0"), F.max("us").alias("t1"))
    )
    per_user = (
        ev.crossJoin(bounds)
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    (F.col("us") <= F.expr("(t0 + t1) div 2"))
                    & (F.col("event_type") == "click"),
                    F.col("vfp"),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("x"),
            F.sum(
                F.when(
                    (F.col("us") > F.expr("(t0 + t1) div 2"))
                    & (F.col("event_type") == "purchase"),
                    F.col("vfp"),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("y"),
        )
        .select(
            (_md5_long(F.col("user_id").cast("string"), 13) % 2).cast("int").alias("t"),
            F.col("x").cast("decimal(38,0)").alias("x"),
            F.col("y").cast("decimal(38,0)").alias("y"),
        )
    )
    arm = per_user.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    pooled = F.broadcast(
        arm.agg(
            F.sum("n").alias("pn"),
            F.sum("sx").alias("psx"),
            F.sum("sy").alias("psy"),
            F.sum("sxx").alias("psxx"),
            F.sum("sxy").alias("psxy"),
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    # var(X) = 0 (constant covariate) degenerates CUPED to no adjustment:
    # theta = 0, identically in both engines
    theta = F.coalesce(
        (d("pn") * d("psxy") - d("psx") * d("psy"))
        / F.nullif(d("pn") * d("psxx") - d("psx") * d("psx"), F.lit(0.0)),
        F.lit(0.0),
    )
    j = arm.crossJoin(pooled).withColumn("theta", theta)
    fp2 = float(_FP) * float(_FP)
    mean_post = d("sy") / d("n") / F.lit(float(_FP))
    xbar_all = d("psx") / d("pn")
    mean_adj = (
        d("sy") / d("n") - F.col("theta") * (d("sx") / d("n") - xbar_all)
    ) / F.lit(float(_FP))
    var_y = (d("n") * d("syy") - d("sy") * d("sy")) / (
        d("n") * (d("n") - F.lit(1.0))
    ) / F.lit(fp2)
    cov_a = (d("n") * d("sxy") - d("sx") * d("sy")) / (
        d("n") * (d("n") - F.lit(1.0))
    ) / F.lit(fp2)
    var_x = (d("n") * d("sxx") - d("sx") * d("sx")) / (
        d("n") * (d("n") - F.lit(1.0))
    ) / F.lit(fp2)
    var_adj = var_y - F.lit(2.0) * F.col("theta") * cov_a + F.col("theta") * F.col("theta") * var_x
    return (
        j.select(
            F.col("t").alias("treatment"),
            F.col("n").alias("n_users"),
            F.round(mean_post, 6).alias("mean_post"),
            F.round(mean_adj, 6).alias("mean_post_cuped"),
            F.round(var_y, 6).alias("var_post"),
            F.round(var_adj, 6).alias("var_post_cuped"),
            F.round(F.col("theta"), 6).alias("theta"),
            F.round(
                F.lit(1.0) - var_adj / F.nullif(var_y, F.lit(0.0)), 6
            ).alias("var_reduction"),
        )
        .orderBy("treatment")
    )


_CUPED_SQL = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_type,
         CAST(FLOOR(value * {_FP}.0) AS BIGINT) AS vfp
  FROM events
),
bounds AS (SELECT MIN(us) AS t0, MAX(us) AS t1 FROM ev),
per_user AS (
  SELECT (('0x' || substr(md5(CAST(e.user_id AS VARCHAR)), 1, 13))::BIGINT % 2) AS t,
         CAST(SUM(CASE WHEN e.us <= (b.t0 + b.t1) // 2 AND e.event_type = 'click'
                       THEN e.vfp ELSE 0 END) AS HUGEINT) AS x,
         CAST(SUM(CASE WHEN e.us > (b.t0 + b.t1) // 2 AND e.event_type = 'purchase'
                       THEN e.vfp ELSE 0 END) AS HUGEINT) AS y
  FROM ev e, bounds b
  GROUP BY e.user_id
),
arm AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
  FROM per_user GROUP BY t
),
pooled AS (
  SELECT SUM(n) AS pn, SUM(sx) AS psx, SUM(sy) AS psy,
         SUM(sxx) AS psxx, SUM(sxy) AS psxy
  FROM arm
),
j AS (
  SELECT a.*, p.pn, p.psx, p.psy, p.psxx, p.psxy,
         COALESCE((CAST(p.pn AS DOUBLE) * CAST(p.psxy AS DOUBLE)
          - CAST(p.psx AS DOUBLE) * CAST(p.psy AS DOUBLE))
         / NULLIF(CAST(p.pn AS DOUBLE) * CAST(p.psxx AS DOUBLE)
                  - CAST(p.psx AS DOUBLE) * CAST(p.psx AS DOUBLE), 0.0), 0.0) AS theta
  FROM arm a, pooled p
)
SELECT t AS treatment, n AS n_users,
       ROUND(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / {_FP}.0, 6) AS mean_post,
       ROUND((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
              - theta * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
                         - CAST(psx AS DOUBLE) / CAST(pn AS DOUBLE))) / {_FP}.0, 6) AS mean_post_cuped,
       ROUND((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) / {_FP}.0e6, 6) AS var_post,
       ROUND(((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) / {_FP}.0e6)
             - 2.0 * theta * ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) / {_FP}.0e6)
             + theta * theta * ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) / {_FP}.0e6), 6) AS var_post_cuped,
       ROUND(theta, 6) AS theta,
       ROUND(1.0 - (((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) / {_FP}.0e6)
             - 2.0 * theta * ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) / {_FP}.0e6)
             + theta * theta * ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) / {_FP}.0e6))
             / NULLIF(((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) / {_FP}.0e6), 0.0), 6) AS var_reduction
FROM j
ORDER BY treatment
"""


@query("eval_cuped_ab", oracle=_CUPED_SQL)
def eval_cuped_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED A/B readout over the events table: md5-parity arms,
    period-1 click value as the covariate, period-2 purchase value as
    the metric — raw vs adjusted means/variances and the pooled theta,
    every float derived from exact decimal/HUGEINT sums."""
    return cuped_ab_readout(tpch.load(spark, sf_dir, "events"))


# --- delta-method ratio metric readout (r16) -----------------------------------
#
# Ratio metrics (revenue per click, CTR, cost per conversion) are
# ratios of SUMS across users, so the naive per-user-ratio variance is
# wrong (users with zero denominators, unit weighting) — the standard
# readout is the delta method on the ratio of means (Deng, Knoblich &
# Lu, KDD 2018 "Applying the Delta Method in Metric Analytics"):
#
#     R = X̄/Ȳ,   Var(R) ≈ (σx² − 2R·σxy + R²·σy²) / (n·Ȳ²)
#
# per arm, with the A/B difference z = (R1 − R0)/sqrt(V1 + V0).
#
# Engine discipline: per-user (x = purchase value fixed-point, y =
# click count) exact bigints; (Σx, Σy, Σx², Σxy, Σy²) in
# decimal(38,0)/HUGEINT; every float derives from the exact sums via
# one mirrored parenthesization (sqrt is IEEE-exact; no libm). Scale:
# one corpus collapse to per-user rows, a 2-row arm rollup, nothing
# else.


def delta_ratio_ab(events: DataFrame) -> DataFrame:
    """One row (n_treat, n_ctrl, ratio_treat, ratio_ctrl, diff,
    se_diff, z): delta-method revenue-per-click readout of the
    md5-parity arms (x = user purchase value, y = user click count)."""
    from .dedup import _md5_long

    per_user = (
        events.groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * F.lit(float(_FP))).cast("bigint"),
                ).otherwise(F.lit(0))
            )
            .cast("decimal(38,0)")
            .alias("x"),
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("decimal(38,0)")
            .alias("y"),
        )
        .select(
            (_md5_long(F.col("user_id").cast("string"), 13) % 2)
            .cast("int")
            .alias("t"),
            "x",
            "y",
        )
    )
    arm = per_user.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    # NULLIF-guard every denominator (ADVICE r16 #1): a degenerate arm
    # (n = 1, or zero clicks so ybar = 0) must yield NULL in BOTH engines —
    # unguarded, Spark's Divide nulls on zero while DuckDB's IEEE doubles
    # produce ±inf/NaN, a cross-engine parity hazard
    nm1 = F.nullif(d("n") * (d("n") - F.lit(1.0)), F.lit(0.0))
    ratio = d("sx") / F.nullif(d("sy"), F.lit(0.0)) / F.lit(float(_FP))
    var_x = (d("n") * d("sxx") - d("sx") * d("sx")) / nm1
    cov_xy = (d("n") * d("sxy") - d("sx") * d("sy")) / nm1
    var_y = (d("n") * d("syy") - d("sy") * d("sy")) / nm1
    ybar = d("sy") / d("n")
    r_fp = d("sx") / F.nullif(d("sy"), F.lit(0.0))
    var_r = (
        (var_x - F.lit(2.0) * r_fp * cov_xy + r_fp * r_fp * var_y)
        / F.nullif(d("n") * ybar * ybar, F.lit(0.0))
        / F.lit(float(_FP) * float(_FP))
    )
    per_arm = arm.select("t", "n", ratio.alias("r"), var_r.alias("v"))
    t1 = per_arm.filter(F.col("t") == 1).select(
        F.col("n").alias("n_treat"), F.col("r").alias("r1"), F.col("v").alias("v1")
    )
    t0 = per_arm.filter(F.col("t") == 0).select(
        F.col("n").alias("n_ctrl"), F.col("r").alias("r0"), F.col("v").alias("v0")
    )
    return t1.crossJoin(t0).select(
        "n_treat",
        "n_ctrl",
        F.round("r1", 6).alias("ratio_treat"),
        F.round("r0", 6).alias("ratio_ctrl"),
        F.round(F.col("r1") - F.col("r0"), 6).alias("diff"),
        F.round(F.sqrt(F.col("v1") + F.col("v0")), 6).alias("se_diff"),
        F.round(
            (F.col("r1") - F.col("r0"))
            / F.nullif(F.sqrt(F.col("v1") + F.col("v0")), F.lit(0.0)),
            6,
        ).alias("z"),
    )


_DELTA_SQL = f"""
WITH per_user AS (
  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))::BIGINT % 2 AS t,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(FLOOR(value * {_FP}.0) AS BIGINT) ELSE 0 END) AS HUGEINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS HUGEINT) AS y
  FROM events GROUP BY user_id
),
arm AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
  FROM per_user GROUP BY t
),
stats AS (
  SELECT t, n,
         CAST(sx AS DOUBLE) / NULLIF(CAST(sy AS DOUBLE), 0.0) / {_FP}.0 AS r,
         ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            / NULLIF(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0), 0.0)
          - 2.0 * (CAST(sx AS DOUBLE) / NULLIF(CAST(sy AS DOUBLE), 0.0))
            * ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / NULLIF(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0), 0.0))
          + (CAST(sx AS DOUBLE) / NULLIF(CAST(sy AS DOUBLE), 0.0))
            * (CAST(sx AS DOUBLE) / NULLIF(CAST(sy AS DOUBLE), 0.0))
            * ((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
               / NULLIF(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0), 0.0)))
         / NULLIF(CAST(n AS DOUBLE) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)), 0.0)
         / ({_FP}.0 * {_FP}.0) AS v
  FROM arm
)
SELECT t1.n AS n_treat, t0.n AS n_ctrl,
       ROUND(t1.r, 6) AS ratio_treat,
       ROUND(t0.r, 6) AS ratio_ctrl,
       ROUND(t1.r - t0.r, 6) AS diff,
       ROUND(SQRT(t1.v + t0.v), 6) AS se_diff,
       ROUND((t1.r - t0.r) / NULLIF(SQRT(t1.v + t0.v), 0.0), 6) AS z
FROM (SELECT * FROM stats WHERE t = 1) t1, (SELECT * FROM stats WHERE t = 0) t0
"""


@query("eval_delta_ratio_ab", oracle=_DELTA_SQL)
def eval_delta_ratio_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method revenue-per-click A/B readout of the md5-parity
    arms — the ratio-metric sibling of eval_cuped_ab. DuckDB replays the
    per-user collapse, the exact second moments, and the mirrored
    variance derivation."""
    return delta_ratio_ab(tpch.load(spark, sf_dir, "events"))


# --- post-hoc minimum detectable effect (r17) ----------------------------------
#
# The SRM check says whether the randomizer worked; the MDE says whether
# the experiment was big enough to SEE anything — a null readout on an
# underpowered test is "we couldn't tell", not "no effect". Standard
# two-proportion closed form (public: any power-analysis text):
#
#   MDE_abs = (z_{1−α/2} + z_{power}) · sqrt( p̂(1−p̂)·(1/n1 + 1/n0) )
#
# at α = 0.05 two-sided and 80% power, i.e. z constants 1.959964 and
# 0.841621 (fixed literals in BOTH engines — no quantile function, no
# libm beyond sqrt). Unit counts and conversions are exact bigints from
# one distinct-user collapse; everything downstream is a 1-row rollup.

_Z_ALPHA = 1.959964  # Φ⁻¹(0.975)
_Z_POWER = 0.841621  # Φ⁻¹(0.80)


def power_mde(events: DataFrame) -> DataFrame:
    """One row (n_treat, n_ctrl, conv_treat, conv_ctrl, pooled_rate, se,
    mde_abs, mde_rel): post-hoc minimum detectable absolute/relative
    conversion lift at alpha=0.05 / power=0.8 for the md5-parity split."""
    from .dedup import _md5_long

    units = events.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv")
    ).select(
        (_md5_long(F.col("user_id").cast("string"), 13) % 2).cast("int").alias("t"),
        "conv",
    )
    agg = units.agg(
        F.sum(F.when(F.col("t") == 1, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("t") == 0, 1).otherwise(0)).cast("bigint").alias("n0"),
        F.sum(F.when(F.col("t") == 1, F.col("conv")).otherwise(0)).cast("bigint").alias("x1"),
        F.sum(F.when(F.col("t") == 0, F.col("conv")).otherwise(0)).cast("bigint").alias("x0"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    pooled = (d("x1") + d("x0")) / F.nullif(d("n1") + d("n0"), F.lit(0.0))
    se = F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (F.lit(1.0) / F.nullif(d("n1"), F.lit(0.0))
           + F.lit(1.0) / F.nullif(d("n0"), F.lit(0.0)))
    )
    mde = F.lit(_Z_ALPHA + _Z_POWER) * se
    return agg.select(
        F.col("n1").alias("n_treat"),
        F.col("n0").alias("n_ctrl"),
        F.col("x1").alias("conv_treat"),
        F.col("x0").alias("conv_ctrl"),
        F.round(pooled, 6).alias("pooled_rate"),
        F.round(se, 6).alias("se"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(mde / F.nullif(pooled, F.lit(0.0)), 6).alias("mde_rel"),
    )


_MDE_SQL = f"""
WITH units AS (
  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))::BIGINT % 2 AS t,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
agg AS (
  SELECT CAST(SUM(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN t = 1 THEN conv ELSE 0 END) AS BIGINT) AS x1,
         CAST(SUM(CASE WHEN t = 0 THEN conv ELSE 0 END) AS BIGINT) AS x0
  FROM units
)
SELECT n1 AS n_treat, n0 AS n_ctrl, x1 AS conv_treat, x0 AS conv_ctrl,
       ROUND((CAST(x1 AS DOUBLE) + CAST(x0 AS DOUBLE))
             / NULLIF(CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE), 0.0), 6) AS pooled_rate,
       ROUND(SQRT(((CAST(x1 AS DOUBLE) + CAST(x0 AS DOUBLE)) / NULLIF(CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE), 0.0))
                  * (1.0 - (CAST(x1 AS DOUBLE) + CAST(x0 AS DOUBLE)) / NULLIF(CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE), 0.0))
                  * (1.0 / NULLIF(CAST(n1 AS DOUBLE), 0.0) + 1.0 / NULLIF(CAST(n0 AS DOUBLE), 0.0))), 6) AS se,
       ROUND({_Z_ALPHA + _Z_POWER}
             * SQRT(((CAST(x1 AS DOUBLE) + CAST(x0 AS DOUBLE)) / NULLIF(CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE), 0.0))
                    * (1.0 - (CAST(x1 AS DOUBLE) + CAST(x0 AS DOUBLE)) / NULLIF(CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE), 0.0))
                    * (1.0 / NULLIF(CAST(n1 AS DOUBLE), 0.0) + 1.0 / NULLIF(CAST(n0 AS DOUBLE), 0.0))), 6) AS mde_abs,
       ROUND({_Z_ALPHA + _Z_POWER}
             * SQRT(((CAST(x1 AS DOUBLE) + CAST(x0 AS DOUBLE)) / NULLIF(CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE), 0.0))
                    * (1.0 - (CAST(x1 AS DOUBLE) + CAST(x0 AS DOUBLE)) / NULLIF(CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE), 0.0))
                    * (1.0 / NULLIF(CAST(n1 AS DOUBLE), 0.0) + 1.0 / NULLIF(CAST(n0 AS DOUBLE), 0.0)))
             / NULLIF((CAST(x1 AS DOUBLE) + CAST(x0 AS DOUBLE))
                      / NULLIF(CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE), 0.0), 0.0), 6) AS mde_rel
FROM agg
"""


@query("eval_power_mde", oracle=_MDE_SQL)
def eval_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-hoc minimum detectable conversion lift at alpha=0.05 /
    power=0.8 — the experiment-design companion of eval_srm_check: a
    null A/B readout only means something if the observed MDE is below
    the effect size the team cares about. DuckDB replays the collapse
    and the closed form."""
    return power_mde(tpch.load(spark, sf_dir, "events"))


# --- TOST equivalence (r18) ----------------------------------------------------
#
# The flip side of the MDE readout: shipping a refactor needs "the arms
# are the SAME to within a margin", and a non-significant difference
# test does not establish that. The standard instrument is TOST — two
# one-sided tests (Schuirmann 1987): declare equivalence at level alpha
# iff BOTH H01: d <= -delta and H02: d >= +delta are rejected, i.e.
# p_tost = max(p_lower, p_upper) < alpha. Normal-approximation z tests
# on the conversion-rate difference with the unpooled SE; the one-sided
# tail probabilities ride the SAME shared A&S 7.1.26 erf fold as the
# rest of the tier (abstats._p_two_sided), Horner order mirrored in the
# SQL twin, so both engines compute identical doubles before the 6-dp
# round. Counts are exact bigints; everything else is model-sized.

_TOST_DELTA = 0.02  # equivalence margin: ±2pp absolute conversion lift
_TOST_ALPHA = 0.05


def _p_upper(z):
    """One-sided upper-tail 1 − Φ(z) for SIGNED z from the shared
    two-sided A&S fold: 1 − Φ(z) = p2(|z|)/2 for z ≥ 0, else
    1 − p2(|z|)/2."""
    from .abstats import _p_two_sided

    half = _p_two_sided(F.abs(z)) / F.lit(2.0)
    return F.when(z >= 0, half).otherwise(F.lit(1.0) - half)


def _sql_p_upper(z: str) -> str:
    from .abstats import _sql_p_two_sided

    half = f"({_sql_p_two_sided(f'ABS({z})')} / 2.0)"
    return f"(CASE WHEN ({z}) >= 0 THEN {half} ELSE 1.0 - {half} END)"


def tost_equivalence(
    events: DataFrame, delta: float = _TOST_DELTA, alpha: float = _TOST_ALPHA
) -> DataFrame:
    """One row (n_treat, n_ctrl, rate_treat, rate_ctrl, diff, se,
    z_lower, z_upper, p_tost, equivalent): TOST equivalence of the
    md5-parity arms' conversion rates at margin ±delta."""
    from .dedup import _md5_long

    units = events.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv")
    ).select(
        (_md5_long(F.col("user_id").cast("string"), 13) % 2).cast("int").alias("t"),
        "conv",
    )
    agg = units.agg(
        F.sum(F.when(F.col("t") == 1, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("t") == 0, 1).otherwise(0)).cast("bigint").alias("n0"),
        F.sum(F.when(F.col("t") == 1, F.col("conv")).otherwise(0)).cast("bigint").alias("x1"),
        F.sum(F.when(F.col("t") == 0, F.col("conv")).otherwise(0)).cast("bigint").alias("x0"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    p1 = d("x1") / F.nullif(d("n1"), F.lit(0.0))
    p0 = d("x0") / F.nullif(d("n0"), F.lit(0.0))
    diff = p1 - p0
    se = F.sqrt(
        p1 * (F.lit(1.0) - p1) / F.nullif(d("n1"), F.lit(0.0))
        + p0 * (F.lit(1.0) - p0) / F.nullif(d("n0"), F.lit(0.0))
    )
    z_lo = (diff + F.lit(delta)) / F.nullif(se, F.lit(0.0))
    z_up = (diff - F.lit(delta)) / F.nullif(se, F.lit(0.0))
    # reject H01 (d <= -delta) when z_lo is LARGE: p_lower = 1 - Φ(z_lo);
    # reject H02 (d >= +delta) when z_up is SMALL: p_upper = Φ(z_up)
    p_lower = _p_upper(z_lo)
    p_upper = F.lit(1.0) - _p_upper(z_up)
    p_tost = F.greatest(p_lower, p_upper)
    return agg.select(
        F.col("n1").alias("n_treat"),
        F.col("n0").alias("n_ctrl"),
        F.round(p1, 6).alias("rate_treat"),
        F.round(p0, 6).alias("rate_ctrl"),
        F.round(diff, 6).alias("diff"),
        F.round(se, 6).alias("se"),
        F.round(z_lo, 6).alias("z_lower"),
        F.round(z_up, 6).alias("z_upper"),
        F.round(p_tost, 6).alias("p_tost"),
        F.coalesce(p_tost < F.lit(alpha), F.lit(False)).alias("equivalent"),
    )


def _tost_sql() -> str:
    p1 = "(CAST(x1 AS DOUBLE) / NULLIF(CAST(n1 AS DOUBLE), 0.0))"
    p0 = "(CAST(x0 AS DOUBLE) / NULLIF(CAST(n0 AS DOUBLE), 0.0))"
    diff = f"({p1} - {p0})"
    se = (
        f"SQRT({p1} * (1.0 - {p1}) / NULLIF(CAST(n1 AS DOUBLE), 0.0)"
        f" + {p0} * (1.0 - {p0}) / NULLIF(CAST(n0 AS DOUBLE), 0.0))"
    )
    z_lo = f"(({diff} + {_TOST_DELTA}) / NULLIF({se}, 0.0))"
    z_up = f"(({diff} - {_TOST_DELTA}) / NULLIF({se}, 0.0))"
    p_tost = f"GREATEST({_sql_p_upper(z_lo)}, 1.0 - {_sql_p_upper(z_up)})"
    return f"""
WITH units AS (
  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))::BIGINT % 2 AS t,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
agg AS (
  SELECT CAST(SUM(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN t = 1 THEN conv ELSE 0 END) AS BIGINT) AS x1,
         CAST(SUM(CASE WHEN t = 0 THEN conv ELSE 0 END) AS BIGINT) AS x0
  FROM units
)
SELECT n1 AS n_treat, n0 AS n_ctrl,
       ROUND({p1}, 6) AS rate_treat,
       ROUND({p0}, 6) AS rate_ctrl,
       ROUND({diff}, 6) AS diff,
       ROUND({se}, 6) AS se,
       ROUND({z_lo}, 6) AS z_lower,
       ROUND({z_up}, 6) AS z_upper,
       ROUND({p_tost}, 6) AS p_tost,
       COALESCE({p_tost} < {_TOST_ALPHA}, FALSE) AS equivalent
FROM agg
"""


@query("eval_tost_equivalence_ab", oracle=_tost_sql(), defer=True)
def eval_tost_equivalence_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence readout of the md5-parity arms' conversion rates
    at margin ±2pp (Schuirmann 1987) — the ship-the-refactor companion
    of eval_power_mde: a null difference test never establishes
    sameness; two rejected one-sided tests do. DuckDB replays the
    unit collapse, both one-sided z tests, and the shared A&S erf
    p-values."""
    return tost_equivalence(tpch.load(spark, sf_dir, "events"))
