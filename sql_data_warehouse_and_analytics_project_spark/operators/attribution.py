"""Multi-touch attribution: position-based (U-shaped) credit over the
click path preceding each purchase.

The as-of family answers LAST-touch attribution
(``events_asof_last_click``; the streaming sink finalizes it); real
marketing analytics also needs MULTI-touch credit — the standard
position-based (a.k.a. U-shaped) model gives the first and last click
40% each and splits the remaining 20% across the middle clicks
(single-click paths take 100%, two-click paths 50/50).

Dropped-mass invariant (ADVICE r16 #2, stated, not silent): a purchase
with NO click in the horizon window contributes ZERO rows here — summed
``attributed_usd`` reconciles against *attributable* purchase revenue
(purchases with ≥1 horizon click), NOT total purchase revenue. The
model intentionally scores touchpoints; untouched conversions have no
touchpoint to credit. ``tests/test_abstats.py`` pins the invariant:
attributed mass = Σ vfp over exactly the purchases with a horizon
click, minus the documented integer-floor remainders.

Engine discipline: purchase values are 1e6 fixed-point bigints and each
click's credited amount is an exact INTEGER floor division of that
fixed-point value (first/last: 2·v div 5; two-click: v div 2; middle:
v div (5·(k−2))) — so every downstream aggregate is an exact bigint sum
and both engines agree bit-for-bit with no float folds anywhere. The
floor remainder (at most a few micro-units per purchase) is the
documented cost of exactness, not a bug.

Scale shape: purchases join clicks on user_id (an equi shuffle; per-user
event counts are bounded in any real event stream) with the horizon
filter applied inside the join; the per-purchase path windows partition
by purchase id (bounded by the horizon click count); output is a
per-day × position rollup. No corpus-wide window, no cartesian.

No reference counterpart — marketing-analytics extension of the
temporal/as-of family (public model).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch

_FP = 1_000_000
_HORIZON_DAYS = 3


def position_attribution(
    events: DataFrame, horizon_days: int = _HORIZON_DAYS
) -> DataFrame:
    """(day, position, n_touches, attributed_fp_sum, attributed_usd):
    per purchase-day and path position ('only'/'first'/'middle'/'last'),
    the exact fixed-point credit mass assigned by the U-shaped model to
    clicks in the half-open window (purchase_ts − horizon, purchase_ts]."""
    horizon_us = horizon_days * 86_400 * 1_000_000
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("pts"),
        F.floor(F.col("value") * F.lit(float(_FP))).cast("bigint").alias("vfp"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("cts"),
    )
    # horizon-bucketed join (the interval_overlap_counts pattern): a bare
    # user-keyed join is per-user ALL-PAIRS before the time filter — a
    # hot user (bot traffic) goes quadratic across its whole history. A
    # click at bucket cb = floor(cts/H) can only serve purchases in
    # buckets {cb, cb+1} (window is (pts − H, pts]), so the 2-bucket
    # explode bounds fan-out to horizon-local activity; the exact µs
    # predicate then decides containment.
    cb = F.floor(F.unix_micros("cts") / F.lit(horizon_us))
    clicks_exp = clicks.withColumn("__b", F.explode(F.array(cb, cb + 1)))
    purchases_b = purchases.withColumn(
        "__b", F.floor(F.unix_micros("pts") / F.lit(horizon_us))
    )
    touched = purchases_b.join(clicks_exp, ["u", "__b"]).filter(
        (F.unix_micros("cts") <= F.unix_micros("pts"))
        & (F.unix_micros("cts") > F.unix_micros("pts") - F.lit(horizon_us))
    ).drop("__b")
    wp = Window.partitionBy("pid")
    wo = wp.orderBy("cts", "cid")
    path = touched.withColumn("rn", F.row_number().over(wo)).withColumn(
        "k", F.count(F.lit(1)).over(wp)
    )
    position = (
        F.when(F.col("k") == 1, F.lit("only"))
        .when(F.col("rn") == 1, F.lit("first"))
        .when(F.col("rn") == F.col("k"), F.lit("last"))
        .otherwise(F.lit("middle"))
    )
    credit_fp = (
        F.when(F.col("k") == 1, F.col("vfp"))
        .when(F.col("k") == 2, F.expr("vfp div 2"))
        .when(
            (F.col("rn") == 1) | (F.col("rn") == F.col("k")),
            F.expr("(vfp * 2) div 5"),
        )
        .otherwise(F.expr("vfp div (5 * (k - 2))"))
    )
    return (
        path.select(
            F.to_date("pts").alias("day"),
            position.alias("position"),
            credit_fp.cast("bigint").alias("credit_fp"),
        )
        .groupBy("day", "position")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum("credit_fp").cast("bigint").alias("attributed_fp_sum"),
        )
        .select(
            "day",
            "position",
            "n_touches",
            "attributed_fp_sum",
            F.round(
                F.col("attributed_fp_sum").cast("double") / F.lit(float(_FP)), 6
            ).alias("attributed_usd"),
        )
        .orderBy("day", "position")
    )


_MTA_SQL = f"""
WITH purchases AS (
  SELECT event_id AS pid, user_id AS u, ts AS pts,
         CAST(FLOOR(value * {float(_FP)}) AS BIGINT) AS vfp
  FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT event_id AS cid, user_id AS u, ts AS cts
  FROM events WHERE event_type = 'click'
),
path AS (
  -- INNER join by design: a purchase with no click in the horizon has no
  -- touchpoint to credit and contributes zero rows — attributed_usd
  -- reconciles against ATTRIBUTABLE revenue only (module docstring,
  -- ADVICE r16 #2)
  SELECT p.pid, p.pts, p.vfp, c.cid, c.cts,
         ROW_NUMBER() OVER (PARTITION BY p.pid ORDER BY c.cts, c.cid) AS rn,
         COUNT(*) OVER (PARTITION BY p.pid) AS k
  FROM purchases p JOIN clicks c ON p.u = c.u
  WHERE c.cts <= p.pts AND c.cts > p.pts - INTERVAL {_HORIZON_DAYS} DAY
),
credited AS (
  SELECT CAST(pts AS DATE) AS day,
         CASE WHEN k = 1 THEN 'only'
              WHEN rn = 1 THEN 'first'
              WHEN rn = k THEN 'last'
              ELSE 'middle' END AS position,
         CASE WHEN k = 1 THEN vfp
              WHEN k = 2 THEN vfp // 2
              WHEN rn = 1 OR rn = k THEN (vfp * 2) // 5
              ELSE vfp // (5 * (k - 2)) END AS credit_fp
  FROM path
)
SELECT day, position,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(credit_fp) AS BIGINT) AS attributed_fp_sum,
       ROUND(CAST(SUM(credit_fp) AS DOUBLE) / {float(_FP)}, 6) AS attributed_usd
FROM credited
GROUP BY day, position
ORDER BY day, position
"""


@query("events_multitouch_attribution", oracle=_MTA_SQL)
def events_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution of purchase
    value across the 3-day click path, rolled up per day × position —
    the multi-touch sibling of events_asof_last_click. DuckDB replays
    the windowed path join, the exact integer credit splits, and the
    rollup."""
    return position_attribution(tpch.load(spark, sf_dir, "events"))
