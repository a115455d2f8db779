"""Advanced analytics operators beyond the reference surface, oracle-checked.

The reference's analytics scripts (SURVEY §2.12) stop at GROUP BY, basic
windows, and UNION ALL. Real warehouse users also reach for:

- sessionization (gaps-and-islands) over an event stream
- funnel analysis (staged min-timestamp per user)
- top-N per group (windowed rank over an aggregate)
- CUBE grouping (all 2^k subtotal combinations in one shuffle)
- scalar-subquery comparison against a global aggregate
- date-spine densification (fill missing months with zeros)
- percent_rank / cume_dist distribution windows

Each is a single- or two-shuffle declarative plan: sessionization is the
canonical lag→flag→cumsum pattern (one shuffle on user_id, all three
windows share it); the date spine is generated with `sequence`+`explode`
on the driver-side literal range (no scan); the global-average comparison
broadcasts a 1-row aggregate instead of a self-join. All scale linearly
with input — no per-row Python, no collect().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tpch.load(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Sessionization: gaps-and-islands with a 30-minute inactivity timeout.
# Batch twin of streaming session windows (streaming/jobs.py); the same
# semantics the reference's watermark machinery (SURVEY §2.9 C1) would need
# if its fact table were events.
# ---------------------------------------------------------------------------

_SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts, event_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sessions
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


@query("events_sessionize", oracle=_SESSIONIZE_SQL, headline=True, defer=True)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization: a session breaks after 30 idle
    minutes. lag → boundary flag → running count assigns session ids in one
    shuffle (both windows share the user_id partitioning); per-session
    rollup adds a second groupBy on the same key, which AQE coalesces."""
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    gap_s = F.col("ts").cast("long") - prev.cast("long")
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(prev.isNull() | (gap_s > 30 * 60), 1).otherwise(0).alias("new_session"),
    )
    sessions = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        sessions.groupBy("user_id", F.col("session_seq").cast("bigint").alias("session_seq"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_seq")
    )


# ---------------------------------------------------------------------------
# Funnel: signup → view → click → purchase, ordered min-timestamp stages.
# ---------------------------------------------------------------------------

_FUNNEL_SQL = """
WITH stages AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events
  GROUP BY user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS reached_signup,
       CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_view > t_signup
                THEN 1 ELSE 0 END) AS BIGINT) AS reached_view,
       CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_view > t_signup AND t_click > t_view
                THEN 1 ELSE 0 END) AS BIGINT) AS reached_click,
       CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_view > t_signup AND t_click > t_view
                     AND t_purchase > t_click
                THEN 1 ELSE 0 END) AS BIGINT) AS reached_purchase
FROM stages
"""


@query("events_funnel", oracle=_FUNNEL_SQL, defer=True)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup→view→click→purchase: one conditional-min
    aggregation per user (single shuffle, map-side partial agg), then a
    driver-sized scalar rollup. NULL-safe: a missing stage breaks the chain
    because NULL comparisons are falsy in both engines."""
    events = _t(spark, sf_dir, "events")

    def stage(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts"))).alias(f"t_{t}")

    stages = events.groupBy("user_id").agg(
        stage("signup"), stage("view"), stage("click"), stage("purchase")
    )
    c_signup = F.col("t_signup").isNotNull()
    c_view = c_signup & (F.col("t_view") > F.col("t_signup"))
    c_click = c_view & (F.col("t_click") > F.col("t_view"))
    c_purchase = c_click & (F.col("t_purchase") > F.col("t_click"))

    def cnt(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(name)

    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        cnt(c_signup, "reached_signup"),
        cnt(c_view, "reached_view"),
        cnt(c_click, "reached_click"),
        cnt(c_purchase, "reached_purchase"),
    )


# ---------------------------------------------------------------------------
# Funnel conversion latency (r13): per stage transition, how LONG converting
# users took — the time dimension events_funnel's pure counts lack (a funnel
# that converts 40% in seconds is a different product than one converting
# 40% over weeks). Positional median with the integer floor((n+1)/2) /
# floor((n+2)/2) rank idiom (the r13 ADVICE fix, averaging BOTH middles for
# even counts) and p90 = value at rank ceil(0.9·n) = (9n+9)//10 — all rank
# math integer, all deltas integer epoch-ms (the truncating epoch functions;
# DuckDB's rounding epoch()::BIGINT cast is the documented trap), so both
# engines pick identical rows. Scale shape: one conditional-min groupBy per
# user (the funnel shuffle), then per-stage windows over CONVERTED users
# only — three small partitions, shuffle bounded by converting users.
# ---------------------------------------------------------------------------

_FUNNEL_LAT_SQL = """
WITH stages AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events
  GROUP BY user_id
),
deltas AS (
  SELECT 'signup_to_view' AS stage, epoch_ms(t_view) - epoch_ms(t_signup) AS d
  FROM stages WHERE t_signup IS NOT NULL AND t_view > t_signup
  UNION ALL
  SELECT 'view_to_click', epoch_ms(t_click) - epoch_ms(t_view)
  FROM stages WHERE t_view IS NOT NULL AND t_click > t_view
  UNION ALL
  SELECT 'click_to_purchase', epoch_ms(t_purchase) - epoch_ms(t_click)
  FROM stages WHERE t_click IS NOT NULL AND t_purchase > t_click
),
ranked AS (
  SELECT stage, d,
         row_number() OVER (PARTITION BY stage ORDER BY d) AS rn,
         COUNT(*) OVER (PARTITION BY stage) AS n
  FROM deltas
)
SELECT stage,
       CAST(MAX(n) AS BIGINT) AS n_converted,
       AVG(CASE WHEN rn = (n + 1) // 2 OR rn = (n + 2) // 2
                THEN CAST(d AS DOUBLE) END) AS median_ms,
       MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN CAST(d AS DOUBLE) END) AS p90_ms
FROM ranked
GROUP BY stage
ORDER BY stage
"""


@query("events_funnel_latency", oracle=_FUNNEL_LAT_SQL, defer=True)
def events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(stage, n_converted, median_ms, p90_ms) per funnel transition among
    users who converted in order — positional median (both middles
    averaged, integer rank math) and rank-ceil p90 over integer epoch-ms
    deltas, engine-identical row selection."""
    events = _t(spark, sf_dir, "events")

    def stage(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts"))).alias(f"t_{t}")

    stages = events.groupBy("user_id").agg(
        stage("signup"), stage("view"), stage("click"), stage("purchase")
    )

    def leg(name: str, a: str, b: str):
        return stages.filter(
            F.col(f"t_{a}").isNotNull() & (F.col(f"t_{b}") > F.col(f"t_{a}"))
        ).select(
            F.lit(name).alias("stage"),
            (F.unix_millis(f"t_{b}") - F.unix_millis(f"t_{a}")).alias("d"),
        )

    deltas = (
        leg("signup_to_view", "signup", "view")
        .unionByName(leg("view_to_click", "view", "click"))
        .unionByName(leg("click_to_purchase", "click", "purchase"))
    )
    w = Window.partitionBy("stage").orderBy("d")
    ranked = deltas.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("stage"))
    )
    is_mid = (F.col("rn") == F.floor((F.col("n") + 1) / 2)) | (
        F.col("rn") == F.floor((F.col("n") + 2) / 2)
    )
    is_p90 = F.col("rn") == F.floor((9 * F.col("n") + 9) / 10)
    return (
        ranked.groupBy("stage")
        .agg(
            F.max("n").cast("bigint").alias("n_converted"),
            F.avg(F.when(is_mid, F.col("d").cast("double"))).alias("median_ms"),
            F.max(F.when(is_p90, F.col("d").cast("double"))).alias("p90_ms"),
        )
        .orderBy("stage")
    )


# ---------------------------------------------------------------------------
# Top-N per group: top-3 parts by revenue within each brand.
# ---------------------------------------------------------------------------

_TOPN_SQL = """
WITH rev AS (
  SELECT p.p_brand, l.l_partkey,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS revenue
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand, l.l_partkey
)
SELECT p_brand, l_partkey, CAST(revenue AS DOUBLE) AS revenue, CAST(rnk AS INT) AS rnk
FROM (SELECT p_brand, l_partkey, revenue,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                 ORDER BY revenue DESC, l_partkey) AS rnk
      FROM rev)
WHERE rnk <= 3
ORDER BY p_brand, rnk
"""


@query("olap_topn_per_group", oracle=_TOPN_SQL, defer=True)
def olap_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 revenue parts per brand: aggregate then row_number per brand.
    The partitioned window never needs a global sort — each brand ranks
    inside its own shuffle partition, so this scales to any brand count
    (unlike the reference's global TOP-N at 06_ranking_analysis.sql:17)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    rev = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_brand", "l_partkey")
        .agg(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).alias("revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("revenue"), "l_partkey")
    return (
        rev.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
        .withColumn("revenue", F.col("revenue").cast("double"))
        .orderBy("p_brand", "rnk")
    )


# ---------------------------------------------------------------------------
# CUBE: all subtotal combinations of (order priority, order year).
# ---------------------------------------------------------------------------

_CUBE_SQL = """
SELECT CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE o_orderpriority END
           AS priority,
       CASE WHEN GROUPING(yr) = 1 THEN -1 ELSE yr END AS order_year,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM (SELECT o_orderpriority, YEAR(CAST(o_orderdate AS DATE)) AS yr, o_totalprice
      FROM orders)
GROUP BY CUBE(o_orderpriority, yr)
ORDER BY priority, order_year
"""


@query("olap_cube_priority_year", oracle=_CUBE_SQL, defer=True)
def olap_cube_priority_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(priority, year): all four grouping combinations from one Expand
    + single-shuffle aggregation (Catalyst multiplies rows 4× map-side; at
    100 TB prefer ROLLUP or explicit GROUPING SETS if some combos are
    unused). GROUPING() distinguishes real NULLs from subtotal rows."""
    orders = _t(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderpriority",
        F.year(F.col("o_orderdate").cast("date")).alias("yr"),
        "o_totalprice",
    )
    return (
        base.cube("o_orderpriority", "yr")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
            F.grouping("o_orderpriority").alias("_g_pri"),
            F.grouping("yr").alias("_g_yr"),
        )
        .select(
            F.when(F.col("_g_pri") == 1, "ALL").otherwise(F.col("o_orderpriority")).alias("priority"),
            F.when(F.col("_g_yr") == 1, -1).otherwise(F.col("yr")).alias("order_year"),
            "n_orders",
            "total_price",
        )
        .orderBy("priority", "order_year")
    )


# ---------------------------------------------------------------------------
# Scalar subquery: customers spending > 1.5× the global average.
# ---------------------------------------------------------------------------

_ABOVE_AVG_SQL = """
WITH spend AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total_spend
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, CAST(total_spend AS DOUBLE) AS total_spend
FROM spend
WHERE CAST(total_spend AS DOUBLE)
      > 1.5 * (SELECT AVG(CAST(total_spend AS DOUBLE)) FROM spend)
ORDER BY o_custkey
"""


@query("olap_above_avg_spenders", oracle=_ABOVE_AVG_SQL, defer=True)
def olap_above_avg_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery comparison: per-customer spend vs 1.5× global mean.
    The 1-row global aggregate joins back by broadcast cross-join — no
    second pass over the data and no single-partition window, so the plan
    is the same two-stage shape at any scale."""
    orders = _t(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total_spend")
    )
    global_avg = spend.agg(
        F.avg(F.col("total_spend").cast("double")).alias("_avg_spend")
    )
    return (
        spend.join(F.broadcast(global_avg))
        .filter(F.col("total_spend").cast("double") > 1.5 * F.col("_avg_spend"))
        .select("o_custkey", F.col("total_spend").cast("double").alias("total_spend"))
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# Date-spine densification: monthly revenue with zero-filled gaps.
# ---------------------------------------------------------------------------

_SPINE_SQL = """
WITH spine AS (
  SELECT CAST(gs AS DATE) AS month_start
  FROM generate_series(DATE '1995-01-01', DATE '2001-08-01', INTERVAL 1 MONTH) AS t(gs)
),
monthly AS (
  SELECT CAST(DATE_TRUNC('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
)
SELECT s.month_start,
       CAST(COALESCE(m.revenue, 0) AS DOUBLE) AS revenue,
       COALESCE(m.n_orders, 0) AS n_orders
FROM spine s LEFT JOIN monthly m ON s.month_start = m.month_start
ORDER BY s.month_start
"""


@query("olap_date_spine_monthly", oracle=_SPINE_SQL, defer=True)
def olap_date_spine_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue densified over a generated date spine — months with
    no orders appear as zero rows (time-series consumers need the gaps).
    The spine is `sequence()`+`explode` over literals: built at plan time,
    ~80 rows, broadcast side of the join; the fact side keeps its one
    groupBy shuffle."""
    orders = _t(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit("1995-01-01")),
                F.to_date(F.lit("2001-08-01")),
                F.expr("interval 1 month"),
            )
        ).alias("month_start")
    )
    monthly = (
        orders.groupBy(
            F.date_trunc("month", F.col("o_orderdate").cast("date")).cast("date").alias("month_start")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    return (
        F.broadcast(spine)
        .join(monthly, "month_start", "left")
        .select(
            "month_start",
            F.coalesce("revenue", F.lit(0)).cast("decimal(18,2)").cast("double").alias("revenue"),
            F.coalesce("n_orders", F.lit(0)).cast("bigint").alias("n_orders"),
        )
        .orderBy("month_start")
    )


# ---------------------------------------------------------------------------
# Distribution windows: percent_rank / cume_dist of supplier balances.
# ---------------------------------------------------------------------------

_PCTRANK_SQL = """
SELECT n.n_name AS nation, s.s_suppkey,
       CAST(CAST(s.s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal,
       CAST(PERCENT_RANK() OVER (PARTITION BY n.n_name
            ORDER BY s.s_acctbal, s.s_suppkey) AS DOUBLE) AS pct_rank,
       CAST(CUME_DIST() OVER (PARTITION BY n.n_name
            ORDER BY s.s_acctbal, s.s_suppkey) AS DOUBLE) AS cume_dist
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
ORDER BY nation, s_suppkey
"""


@query("olap_percent_rank_suppliers", oracle=_PCTRANK_SQL, defer=True)
def olap_percent_rank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist of supplier account balance within nation —
    both ride the same partitioned sort, one window exchange total. The
    suppkey tiebreak makes ranks deterministic across engines."""
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy("s_acctbal", "s_suppkey")
    return (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            "s_suppkey",
            F.col("s_acctbal").cast("decimal(18,2)").cast("double").alias("acctbal"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume_dist"),
        )
        .orderBy("nation", "s_suppkey")
    )


# ---------------------------------------------------------------------------
# Explicit ROWS-frame window: 3-month trailing moving average of revenue.
# ---------------------------------------------------------------------------

_MOVAVG_SQL = """
WITH monthly AS (
  SELECT CAST(DATE_TRUNC('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
  FROM orders GROUP BY 1
)
SELECT month_start, CAST(revenue AS DOUBLE) AS revenue,
       CAST(AVG(CAST(revenue AS DOUBLE)) OVER (ORDER BY month_start
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS revenue_ma3
FROM monthly
ORDER BY month_start
"""


@query("olap_moving_avg_3m", oracle=_MOVAVG_SQL, defer=True)
def olap_moving_avg_3m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-month trailing moving average with an explicit ROWS frame — the
    bounded-frame spec the reference never uses (its running totals ride
    the default RANGE frame, SURVEY §2.5 W4). The window runs over the
    pre-aggregated monthly series (~one row per month), so the unpartitioned
    sort is driver-trivial at any fact scale — aggregate first, window
    second is the scale rule for global time-series frames."""
    orders = _t(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            F.date_trunc("month", F.col("o_orderdate").cast("date")).cast("date").alias("month_start")
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue"))
    )
    w = Window.orderBy("month_start").rowsBetween(-2, Window.currentRow)
    return (
        monthly.select(
            "month_start",
            F.col("revenue").cast("double").alias("revenue"),
            F.avg(F.col("revenue").cast("double")).over(w).alias("revenue_ma3"),
        )
        .orderBy("month_start")
    )


# --- Numeric profiling: fixed-width histogram -------------------------------
#
# The profiling report a data platform publishes per numeric column. The
# naive distribution shape (ntile over a global ORDER BY value) is a
# single-partition corpus sort; the scale shape is the threshold-join
# pattern: ONE (min, max) aggregate row broadcasts back and every row bins
# itself with pure arithmetic — zero windows, one partial-agg count. The
# bin expression (floor((v - lo) / step), clamped) runs the identical IEEE
# double ops in both engines, so assignments are engine-exact.

_HIST_BINS = 10

_HISTOGRAM_SQL = f"""
WITH mm AS (
  SELECT MIN(value) AS lo, MAX(value) AS hi FROM events WHERE value IS NOT NULL
),
binned AS (
  SELECT event_type,
         CASE WHEN hi = lo THEN 0
              ELSE least({_HIST_BINS - 1},
                         CAST(floor((value - lo) / ((hi - lo) / {_HIST_BINS}.0)) AS BIGINT))
         END AS bin,
         lo, ((hi - lo) / {_HIST_BINS}.0) AS step
  FROM events CROSS JOIN mm
  WHERE value IS NOT NULL
)
SELECT event_type,
       CAST(bin AS BIGINT) AS bin,
       ROUND(lo + bin * step, 6) AS bin_lo,
       CAST(COUNT(*) AS BIGINT) AS n
FROM binned
GROUP BY event_type, bin, lo, step
ORDER BY event_type, bin
"""


def value_histogram(
    df: DataFrame, group: str, measure: str, bins: int = _HIST_BINS
) -> DataFrame:
    """(group, bin, bin_lo, n): fixed-width histogram of ``measure`` per
    ``group`` over the global [min, max] range — one broadcast min/max row,
    arithmetic binning, one counting groupBy; no window, no sort of data
    rows (the output order-by touches group×bins rows)."""
    m = F.col(measure)
    mm = F.broadcast(
        df.filter(m.isNotNull()).agg(F.min(m).alias("lo"), F.max(m).alias("hi"))
    )
    step = (F.col("hi") - F.col("lo")) / float(bins)
    # degenerate range (constant-valued measure): step would be 0 and the
    # bin expression 0.0/0.0 — engines diverge on floor(NaN), so pin every
    # row to bin 0 (a single full bin at lo) instead
    bin_col = F.when(F.col("hi") == F.col("lo"), F.lit(0).cast("bigint")).otherwise(
        F.least(F.lit(bins - 1), F.floor((m - F.col("lo")) / step).cast("bigint"))
    )
    return (
        df.filter(m.isNotNull())
        .crossJoin(mm)
        .select(
            group,
            bin_col.alias("bin"),
            F.round(F.col("lo") + bin_col * step, 6).alias("bin_lo"),
        )
        .groupBy(group, "bin", "bin_lo")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(group, "bin")
    )


@query("events_value_histogram", oracle=_HISTOGRAM_SQL, defer=True)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width 10-bin histogram of event value per event type — the
    numeric-column profile of the data-card family."""
    return value_histogram(_t(spark, sf_dir, "events"), "event_type", "value")


# --- Per-user outlier detection (z-score via exact moments) ------------------
#
# Outlier flagging against a per-group baseline normally reaches for
# stddev() — but a distributed float stddev folds partition-ordered sums,
# so the result (and any threshold decision near the boundary) is not
# reproducible across engines or even runs. The exact-moments trick: the
# per-group count / sum / sum-of-squares accumulate as DECIMALS (exact,
# order-independent), the float math (mean, variance, sqrt, z) runs on
# those identical inputs — so every z-score is bit-reproducible. Shape:
# one partial-agg groupBy to a KB-sized per-user moment frame, broadcast
# back; no window touches data rows.

_Z_MIN_EVENTS = 5
_Z_THRESHOLD = 2.5

_ZSCORE_SQL = f"""
WITH mom AS (
  SELECT user_id,
         CAST(COUNT(value) AS BIGINT) AS n,
         CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(value * value AS DECIMAL(38,8))) AS DOUBLE) AS s2
  FROM events WHERE value IS NOT NULL GROUP BY user_id
),
st AS (
  SELECT user_id,
         s1 / n AS mean,
         sqrt(greatest(0.0, s2 / n - (s1 / n) * (s1 / n))) AS std
  FROM mom WHERE n >= {_Z_MIN_EVENTS}
)
SELECT e.event_id, e.user_id, e.value,
       ROUND((e.value - st.mean) / st.std, 6) AS zscore
FROM events e JOIN st ON e.user_id = st.user_id
WHERE e.value IS NOT NULL AND st.std > 0
  AND abs((e.value - st.mean) / st.std) >= {_Z_THRESHOLD}
ORDER BY e.event_id
"""


def zscore_outliers(
    df: DataFrame,
    group: str,
    measure: str,
    min_rows: int = _Z_MIN_EVENTS,
    threshold: float = _Z_THRESHOLD,
    id_col: str = "event_id",
) -> DataFrame:
    """Rows whose ``measure`` sits ≥ ``threshold`` standard deviations from
    their ``group`` mean, with bit-reproducible z-scores (see module note
    on the exact-moments discipline). ``id_col`` names the row identifier
    carried into the output."""
    m = F.col(measure)
    rows = df.filter(m.isNotNull())
    mom = rows.groupBy(group).agg(
        F.count(measure).cast("bigint").alias("n"),
        F.sum(m.cast("decimal(28,8)")).cast("double").alias("s1"),
        F.sum((m * m).cast("decimal(38,8)")).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    st = (
        mom.filter(F.col("n") >= min_rows)
        .select(
            group,
            mean.alias("mean"),
            F.sqrt(F.greatest(F.lit(0.0), F.col("s2") / F.col("n") - mean * mean)).alias(
                "std"
            ),
        )
    )
    z = (m - F.col("mean")) / F.col("std")
    return (
        rows.join(F.broadcast(st), group)
        .filter((F.col("std") > 0) & (F.abs(z) >= threshold))
        .select(id_col, group, measure, F.round(z, 6).alias("zscore"))
        .orderBy(id_col)
    )


@query("events_zscore_outliers", oracle=_ZSCORE_SQL, defer=True)
def events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value is ≥ 2.5 σ from the user's own mean — per-entity
    anomaly flagging with engine-exact scores."""
    return zscore_outliers(_t(spark, sf_dir, "events"), "user_id", "value")


# --- MAD robust outliers (r13) ------------------------------------------------
#
# The robust twin of zscore_outliers: mean/σ are themselves dragged by
# the outliers they hunt (masking); median / median-absolute-deviation
# have a 50% breakdown point. Flag |v − median| > k·MAD per group with
# k = 3 (≈ 2σ on normal data via the 1.4826 consistency factor, which
# is deliberately NOT applied — k is a tunable, keeping every number an
# exact median of observed values).
#
# Determinism: positional medians via the integer both-middles idiom
# (row_number ordered by (value, id); rn = floor((n+1)/2) / floor((n+2)/2)
# ≡ DuckDB (n+1)//2 — the r13 ADVICE fix, reused twice: once for the
# median, once for the MAD). The outlier comparison uses the UNROUNDED
# mad; only outputs are rounded. Scale: exact per-group medians cost one
# sort-shuffle per ranking pass (two total) — the honest price of exact
# order statistics; the approximate path at 100 TB is the mergeable
# histogram sketch (approx.hist_quantiles_by).


def mad_outliers(
    df: DataFrame,
    group: str,
    measure: str,
    id_col: str = "event_id",
    k: float = 3.0,
    mode: str = "exact",
    w: int = 4,
) -> DataFrame:
    """(group, n_events, med, mad, n_outliers) per group: median, median
    absolute deviation, and how many rows sit beyond k·MAD.

    ``mode="exact"`` (default, oracle-parity) computes exact positional
    medians — one sort-shuffle per ranking pass, the honest price of
    exact order statistics. ``mode="scale"`` is the 100 TB path (r13
    VERDICT ask #3): both medians come from the mergeable fixed-bin
    histogram sketch (``approx.hist_bins_by`` / ``hist_quantiles_by``
    with bin width ``w``), so every pass is a partial-aggregating
    groupBy over ≤256 cells per group — no per-group sort, no window
    over data rows, skew-immune. Error is bounded by one bin: the
    estimated median/MAD sit within ``w`` of exact, so the outlier
    count can differ only for rows whose deviation lies within
    ``(k+1)·w`` of the k·MAD boundary (pytest-pinned tolerance in
    tests/test_mad.py)."""
    if mode == "scale":
        return _mad_outliers_scale(df, group, measure, k=k, w=w)
    if mode != "exact":
        raise ValueError(f"mode must be 'exact' or 'scale', got {mode!r}")
    m = F.col(measure)
    rows = df.filter(m.isNotNull()).select(group, id_col, measure)
    wg = Window.partitionBy(group)
    w1 = Window.partitionBy(group).orderBy(measure, id_col)

    def both_middles(ranked: DataFrame, val: str) -> DataFrame:
        return (
            ranked.filter(
                (F.col("rn") == F.floor((F.col("n") + 1) / 2))
                | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
            )
            .groupBy(group)
            .agg(F.avg(val).alias(f"{val}_med"))
        )

    ranked = rows.select(
        group, measure, F.row_number().over(w1).alias("rn"), F.count(F.lit(1)).over(wg).alias("n")
    )
    med = both_middles(ranked, measure).withColumnRenamed(f"{measure}_med", "med")
    dev = rows.join(F.broadcast(med), group).select(
        group, id_col, measure, "med", F.abs(m - F.col("med")).alias("ad")
    )
    w2 = Window.partitionBy(group).orderBy("ad", id_col)
    dranked = dev.select(
        group, "ad", F.row_number().over(w2).alias("rn"), F.count(F.lit(1)).over(wg).alias("n")
    )
    mad = both_middles(dranked, "ad").withColumnRenamed("ad_med", "mad")
    return (
        dev.join(F.broadcast(mad), group)
        .groupBy(group)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.min("med"), 6).alias("med"),
            F.round(F.min("mad"), 6).alias("mad"),
            F.sum((F.col("ad") > F.lit(k) * F.col("mad")).cast("bigint"))
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy(group)
    )


def _mad_outliers_scale(
    df: DataFrame, group: str, measure: str, k: float = 3.0, w: int = 4
) -> DataFrame:
    """Sketch-backed MAD outliers (same output schema as the exact mode):
    per-group approximate median via the grouped histogram sketch, exact
    deviations against it, approximate MAD via a second sketch over the
    deviations, exact outlier count against the sketched threshold. Two
    linear passes, each collapsing map-side to ≤256 bins per group before
    its only shuffle — the shape that survives 1000 executors and a
    billion-row group where the exact mode's per-group sort cannot."""
    from .approx import hist_bins_by, hist_quantiles_by

    m = F.col(measure)
    rows = df.filter(m.isNotNull()).select(group, measure)
    med = hist_quantiles_by(
        hist_bins_by(rows, group, measure, w=w), qs=(0.5,), w=w
    ).select(F.col("grp").alias(group), F.col("estimate").alias("med"))
    dev = rows.join(F.broadcast(med), group).select(
        group, measure, "med", F.abs(m - F.col("med")).alias("ad")
    )
    mad = hist_quantiles_by(
        hist_bins_by(dev, group, "ad", w=w), qs=(0.5,), w=w
    ).select(F.col("grp").alias(group), F.col("estimate").alias("mad"))
    return (
        dev.join(F.broadcast(mad), group)
        .groupBy(group)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.min("med"), 6).alias("med"),
            F.round(F.min("mad"), 6).alias("mad"),
            F.sum((F.col("ad") > F.lit(k) * F.col("mad")).cast("bigint"))
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy(group)
    )


_MAD_SQL = """
WITH rows_ AS (
  SELECT event_type, event_id, value FROM events WHERE value IS NOT NULL
),
ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM rows_
),
med AS (
  SELECT event_type, AVG(value) AS med FROM ranked
  WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
  GROUP BY event_type
),
dev AS (
  SELECT r.event_type, r.event_id, r.value, m.med, abs(r.value - m.med) AS ad
  FROM rows_ r JOIN med m USING (event_type)
),
dranked AS (
  SELECT event_type, ad,
         row_number() OVER (PARTITION BY event_type ORDER BY ad, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM dev
),
mad AS (
  SELECT event_type, AVG(ad) AS mad FROM dranked
  WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
  GROUP BY event_type
)
SELECT d.event_type AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(MIN(d.med), 6) AS med,
       ROUND(MIN(md.mad), 6) AS mad,
       CAST(SUM(CASE WHEN d.ad > 3.0 * md.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad md USING (event_type)
GROUP BY d.event_type
ORDER BY event_type
"""


@query("events_mad_outliers", oracle=_MAD_SQL, defer=True)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-event-type outlier counts via median/MAD — the
    masking-immune twin of events_zscore_outliers."""
    return mad_outliers(_t(spark, sf_dir, "events"), "event_type", "value")


# --- weekly cohort retention (r12) -------------------------------------------
#
# The classic product-analytics matrix: users grouped by first-activity
# week (cohort), each cohort's distinct actives counted at every week
# offset, normalized by cohort size. Scale shape: ONE distinct over
# (user, week) — partial-agg prunes duplicate events map-side — then a
# groupBy(user) for the cohort anchor, a 1:1 join back on user, and a
# small (cohorts x offsets) aggregate; both engines truncate weeks to ISO
# Monday so the offsets are exact multiples of 7 days.

_COHORT_SQL = """
WITH ev AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
firstwk AS (SELECT user_id, MIN(wk) AS cohort_wk FROM ev GROUP BY user_id),
ret AS (
  SELECT CAST(f.cohort_wk AS DATE) AS cohort_week,
         CAST(date_diff('day', CAST(f.cohort_wk AS DATE), CAST(e.wk AS DATE)) // 7
              AS BIGINT) AS week_offset,
         CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
  FROM ev e JOIN firstwk f USING (user_id)
  GROUP BY 1, 2
),
base AS (SELECT cohort_week, n_users AS cohort_size FROM ret WHERE week_offset = 0)
SELECT r.cohort_week, r.week_offset, r.n_users,
       ROUND(CAST(r.n_users AS DOUBLE) / CAST(b.cohort_size AS DOUBLE), 6)
         AS retention
FROM ret r JOIN base b USING (cohort_week)
ORDER BY cohort_week, week_offset
"""


@query("events_cohort_retention", oracle=_COHORT_SQL, defer=True)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: per first-activity-week cohort, the share
    of its users active at each later week offset — see the section note
    for the shuffle budget."""
    events = _t(spark, sf_dir, "events")
    ev = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    firstwk = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    ret = (
        ev.join(firstwk, "user_id")
        .groupBy(
            F.col("cohort_wk").cast("date").alias("cohort_week"),
            (F.datediff(F.col("wk").cast("date"), F.col("cohort_wk").cast("date")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
    )
    base = ret.filter(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_users").alias("cohort_size")
    )
    return (
        ret.join(base, "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_users",
            F.round(
                F.col("n_users").cast("double") / F.col("cohort_size").cast("double"),
                6,
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# --- OHLC time-series resample (r12) -----------------------------------------
#
# The time-series bar primitive: per (event_type, hour), the Open / High /
# Low / Close of `value` with the (ts, event_id) total order pinning
# open/close deterministically in both engines (min_by/arg_min on a
# composite key). One partial-agg groupBy at bar grain — min/max/min_by/
# max_by all combine map-side, so the shuffle carries one row per bar.
# Order-key packing: the key only has to be total WITHIN one hourly bar,
# so it packs milliseconds-within-hour (0..3599999, 22 bits) << 41 plus
# event_id — max ~7.9e18 < int64 max for ANY timestamp (no 2038 epoch
# overflow; full-epoch << 32 wrapped silently in Spark and raised in
# DuckDB). Millis come from the INTEGER epoch-ms functions on both engines
# (unix_millis / epoch_ms, both truncating): DuckDB's epoch(ts) is a
# DOUBLE whose BIGINT cast ROUNDS, flipping the order of events within
# ~0.5 s of an hour boundary vs Spark's truncating cast.
# Domain assumption: ts >= 1970-01-01 and 0 <= event_id < 2^41.

_OHLC_SQL = """
WITH keyed AS (
  SELECT event_type, date_trunc('hour', ts) AS bar_ts, value,
         ((epoch_ms(ts) % 3600000) << 41) + event_id AS ordk
  FROM events
)
SELECT event_type, bar_ts,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(arg_min(value, ordk), 6) AS open,
       ROUND(MAX(value), 6) AS high,
       ROUND(MIN(value), 6) AS low,
       ROUND(arg_max(value, ordk), 6) AS close
FROM keyed
GROUP BY event_type, bar_ts
ORDER BY event_type, bar_ts
"""


@query("events_ohlc_hourly", oracle=_OHLC_SQL, defer=True)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars of event value per event type — open/close pinned
    by the (ts, event_id) total order, one partial-agg groupBy at bar
    grain (the shuffle carries one row per bar)."""
    events = _t(spark, sf_dir, "events")
    # millis-within-hour << 41 | event_id: total order inside one bar,
    # overflow-free for any timestamp (see _OHLC_SQL note for the domain
    # assumption on event_id and the epoch-ms truncation rationale).
    ordk = F.shiftleft(F.pmod(F.unix_millis("ts"), F.lit(3600000)), 41) + F.col(
        "event_id"
    )
    keyed = events.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bar_ts"),
        "value",
        ordk.alias("ordk"),
    )
    return (
        keyed.groupBy("event_type", "bar_ts")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.min_by("value", "ordk"), 6).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.round(F.max_by("value", "ordk"), 6).alias("close"),
        )
        .orderBy("event_type", "bar_ts")
    )


# --- LOCF gap-fill over an hourly spine (r13) ----------------------------------
#
# The interpolation leg the spine family lacked: olap_date_spine_monthly
# GENERATES dense time axes; this FILLS them — per event type, an hourly
# spine from the corpus min to max hour, hours with no events carrying
# the last observed hourly average forward (LOCF). The standard prep for
# downstream models that assume a dense regular series.
#
# Determinism: hourly averages go through the exact-moments discipline
# (SUM over DECIMAL(28,8), one division — the zscore_outliers idiom);
# last(ignorenulls) picks single already-rounded values so the fill
# itself adds no float work. Scale shape: one partial-agg groupBy at
# (type, hour) grain, the spine is |types| × |hours| rows built from ONE
# sequence() literal range (KB for years of hours), and the fill is a
# type-partitioned window — distributes across types, state = one value.


def locf_hourly_fill(events: DataFrame) -> DataFrame:
    """(event_type, hour_ts, avg_value, is_gap): dense hourly series per
    type, gaps carried forward from the last observed hour."""
    hourly = (
        events.filter(F.col("value").isNotNull())
        .groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
        )
        .agg(
            (
                F.sum(F.col("value").cast("decimal(28,8)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("raw_avg")
        )
        .select("event_type", "hour_ts", F.round("raw_avg", 6).alias("obs_avg"))
    )
    bounds = hourly.agg(
        F.min("hour_ts").alias("lo"), F.max("hour_ts").alias("hi")
    )
    spine = (
        hourly.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour_ts"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("hour_ts")
    joined = spine.join(hourly, ["event_type", "hour_ts"], "left")
    return (
        joined.select(
            "event_type",
            "hour_ts",
            F.last("obs_avg", ignorenulls=True).over(w).alias("avg_value"),
            F.col("obs_avg").isNull().alias("is_gap"),
        )
        .orderBy("event_type", "hour_ts")
    )


_LOCF_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE), 6) AS obs_avg
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type, date_trunc('hour', ts)
),
bounds AS (SELECT MIN(hour_ts) AS lo, MAX(hour_ts) AS hi FROM hourly),
spine AS (
  SELECT t.event_type, s.h AS hour_ts
  FROM (SELECT DISTINCT event_type FROM hourly) t
  CROSS JOIN bounds b,
  LATERAL (SELECT UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS h) s
)
SELECT s.event_type, s.hour_ts,
       last_value(h.obs_avg IGNORE NULLS)
         OVER (PARTITION BY s.event_type ORDER BY s.hour_ts) AS avg_value,
       h.obs_avg IS NULL AS is_gap
FROM spine s
LEFT JOIN hourly h ON h.event_type = s.event_type AND h.hour_ts = s.hour_ts
ORDER BY s.event_type, s.hour_ts
"""


@query("events_locf_hourly", oracle=_LOCF_SQL, defer=True)
def events_locf_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly average-value series per event type with
    last-observation-carried-forward gap fill — the interpolation leg of
    the time-spine family."""
    return locf_hourly_fill(_t(spark, sf_dir, "events"))


# --- daily TWAP (r13) -----------------------------------------------------------
#
# Time-WEIGHTED average value: a plain AVG treats a value held for 20
# hours and one held for 2 minutes identically; TWAP integrates the
# step function — each observation holds until the next one (last one
# holds to day end), weight = exact integer ms from the truncating
# epoch-ms functions. Exactness end to end: value enters as 1e6
# fixed-point bigint (floor of a double — identical both engines), each
# v_fp·w term ≤ max(v_fp)·86.4e6 and the per-day terms sum to ≤
# max(v_fp)·Σw = max(v_fp)·86.4e6 « 2^63 (weights PARTITION the day, so
# the bound does not grow with event count); ONE division at the end.
# Scale shape: one (type, day)-partitioned lead window + one groupBy at
# the same grain — the window shuffle is reused by the aggregate.


def twap_daily(events: DataFrame) -> DataFrame:
    """(event_type, day, n_events, twap) per type and day: the
    time-weighted mean of value, each observation held until the next
    (last until midnight)."""
    rows = events.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        "ts",
        "event_id",
        F.floor(F.col("value") * F.lit(1000000.0)).cast("bigint").alias("v_fp"),
    )
    w = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    nxt = F.coalesce(
        F.lead("ts").over(w), F.col("day") + F.expr("INTERVAL 1 DAY")
    )
    seg = rows.select(
        "event_type",
        "day",
        "v_fp",
        (F.unix_millis(nxt) - F.unix_millis(F.col("ts"))).alias("w_ms"),
    )
    return (
        seg.groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("v_fp") * F.col("w_ms")).cast("bigint").alias("_num"),
            F.sum("w_ms").cast("bigint").alias("_den"),
        )
        .select(
            "event_type",
            F.col("day").cast("date").alias("day"),
            "n_events",
            F.round(
                F.col("_num").cast("double")
                / (F.lit(1000000.0) * F.col("_den").cast("double")),
                6,
            ).alias("twap"),
        )
        .orderBy("event_type", "day")
    )


_TWAP_SQL = """
WITH rows_ AS (
  SELECT event_type, date_trunc('day', ts) AS day, ts, event_id,
         CAST(FLOOR(value * 1000000.0) AS BIGINT) AS v_fp
  FROM events WHERE value IS NOT NULL
),
seg AS (
  SELECT event_type, day, v_fp,
         epoch_ms(COALESCE(
           lead(ts) OVER (PARTITION BY event_type, day ORDER BY ts, event_id),
           day + INTERVAL 1 DAY)) - epoch_ms(ts) AS w_ms
  FROM rows_
)
SELECT event_type, CAST(day AS DATE) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(CAST(SUM(v_fp * w_ms) AS DOUBLE)
             / (1000000.0 * CAST(SUM(w_ms) AS DOUBLE)), 6) AS twap
FROM seg
GROUP BY event_type, day
ORDER BY event_type, day
"""


@query("events_twap_daily", oracle=_TWAP_SQL, defer=True)
def events_twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily time-weighted average event value per type — the step-series
    integral a plain AVG misrepresents."""
    return twap_daily(_t(spark, sf_dir, "events"))


# --- 24-hour seasonality: lag autocorrelation (r13) -----------------------------
#
# Does the event stream have a daily rhythm? Pearson autocorrelation of
# the hourly COUNT series at lag 24, per event type — near +1 means a
# strong diurnal cycle, near 0 an arrhythmic stream. Counts are exact
# bigints and the series pairs (y_t, y_{t−24}) come from one lag window
# over the DENSE hourly spine (missing hours count 0 — a true zero, not
# a gap), so every correlation input is an identical integer in both
# engines: r = (n·S_xy − S_x·S_y) / (√(n·S_xx − S_x²)·√(n·S_yy − S_y²)),
# bigints cast to double BEFORE the products (the pca.py convention).
# Scale shape: one (type, hour) partial-agg groupBy, the spine from one
# sequence() range, one type-partitioned lag window over the KB-per-type
# hourly table, one groupBy(type) fold.


def hourly_autocorr(events: DataFrame, lag: int = 24) -> DataFrame:
    """(event_type, n_pairs, autocorr) per type: Pearson correlation of
    hourly counts against the series ``lag`` hours earlier."""
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    bounds = hourly.agg(F.min("hour_ts").alias("lo"), F.max("hour_ts").alias("hi"))
    spine = (
        hourly.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour_ts"),
        )
    )
    dense = spine.join(hourly, ["event_type", "hour_ts"], "left").select(
        "event_type", "hour_ts", F.coalesce("cnt", F.lit(0)).cast("bigint").alias("y")
    )
    w = Window.partitionBy("event_type").orderBy("hour_ts")
    paired = dense.select(
        "event_type", "y", F.lag("y", lag).over(w).alias("x")
    ).filter(F.col("x").isNotNull())
    stats = paired.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (F.col(c).cast("double") for c in ("sxx", "syy", "sxy"))
    num = nd * sxy - sx * sy
    den = F.sqrt(nd * sxx - sx * sx) * F.sqrt(nd * syy - sy * sy)
    return stats.select(
        "event_type",
        F.col("n").alias("n_pairs"),
        F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("autocorr"),
    ).orderBy("event_type")


_AUTOCORR_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
bounds AS (SELECT MIN(hour_ts) AS lo, MAX(hour_ts) AS hi FROM hourly),
spine AS (
  SELECT t.event_type, s.h AS hour_ts
  FROM (SELECT DISTINCT event_type FROM hourly) t
  CROSS JOIN bounds b,
  LATERAL (SELECT UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS h) s
),
dense AS (
  SELECT s.event_type, s.hour_ts, CAST(COALESCE(h.cnt, 0) AS BIGINT) AS y
  FROM spine s LEFT JOIN hourly h
    ON h.event_type = s.event_type AND h.hour_ts = s.hour_ts
),
paired AS (
  SELECT event_type, y,
         lag(y, 24) OVER (PARTITION BY event_type ORDER BY hour_ts) AS x
  FROM dense
  QUALIFY x IS NOT NULL
),
stats AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM paired GROUP BY event_type
)
SELECT event_type, n AS n_pairs,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / NULLIF(sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0.0),
             6) AS autocorr
FROM stats
ORDER BY event_type
"""


@query("events_autocorr_24h", oracle=_AUTOCORR_SQL, defer=True)
def events_autocorr_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-seasonality detector: lag-24 Pearson autocorrelation of the
    dense hourly event-count series, per event type."""
    return hourly_autocorr(_t(spark, sf_dir, "events"))


# --- peak burst rate (r13) --------------------------------------------------------
#
# Capacity-planning question the tumbling hourly counts blur: what was
# the WORST trailing-hour burst, at any instant? Per event, the count of
# same-type events in the sliding (t − 1h, t] window via a RANGE frame
# over integer epoch-ms (RANGE 3599999 PRECEDING — value-based, so it
# needs no spine and handles irregular timestamps exactly); then per
# type the max and the earliest instant achieving it. All integers; the
# only shuffle is the type-partitioned window the rollup reuses.


def peak_rate(events: DataFrame, window_ms: int = 3600000) -> DataFrame:
    """(event_type, peak_events_1h, peak_at_ms): the maximum trailing-
    ``window_ms`` event count per type and the earliest instant it was hit."""
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_millis(F.col("ts")))
        .rangeBetween(-(window_ms - 1), 0)
    )
    rated = events.select(
        "event_type",
        F.unix_millis(F.col("ts")).alias("t_ms"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("rate"),
    )
    # "earliest instant of the max rate" without a packed -rate·2^k + t_ms
    # order key (whose rate < 2^21 / t_ms < 2^41 bounds would wrap silently
    # in Spark and raise in DuckDB when exceeded — r13 ADVICE): a second
    # window over the SAME partitioning (no extra shuffle; the Exchange is
    # reused) marks the per-type max, then the groupBy takes MIN(t_ms)
    # among the rows that achieve it.
    wmax = Window.partitionBy("event_type")
    return (
        rated.withColumn("mx", F.max("rate").over(wmax))
        .filter(F.col("rate") == F.col("mx"))
        .groupBy("event_type")
        .agg(
            F.max("rate").cast("bigint").alias("peak_events_1h"),
            F.min("t_ms").cast("bigint").alias("peak_at_ms"),
        )
        .orderBy("event_type")
    )


_PEAK_SQL = """
WITH rated AS (
  SELECT event_type, epoch_ms(ts) AS t_ms,
         CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY epoch_ms(ts)
              RANGE BETWEEN 3599999 PRECEDING AND CURRENT ROW) AS BIGINT) AS rate
  FROM events
),
marked AS (
  SELECT event_type, t_ms, rate,
         MAX(rate) OVER (PARTITION BY event_type) AS mx
  FROM rated
)
SELECT event_type,
       CAST(MAX(rate) AS BIGINT) AS peak_events_1h,
       CAST(MIN(t_ms) AS BIGINT) AS peak_at_ms
FROM marked
WHERE rate = mx
GROUP BY event_type
ORDER BY event_type
"""


@query("events_peak_rate", oracle=_PEAK_SQL, defer=True)
def events_peak_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worst trailing-hour burst per event type (value-based RANGE frame
    over epoch-ms) and the earliest instant it occurred."""
    return peak_rate(_t(spark, sf_dir, "events"))


# --- trailing EWMA over the dense hourly series (r14) ------------------------------
#
# Exponentially-weighted smoothing with DYADIC weights 2^-d over the
# trailing 12 points of the dense hourly value series (missing hours are
# true zeros, as in autocorr's spine). Powers of two keep BOTH the
# numerator and denominator exact BIGINTs — num = Σ hv·2^(11-d),
# den = Σ 2^(11-d) — so the only float op is the final divide on
# identical integers in every engine: the twap_daily fixed-point
# discipline extended to weighted smoothing. The 12 lag terms share one
# type-partitioned window over the KB-per-type hourly table; the corpus
# shuffles once into the hourly groupBy and never again. Rows earlier
# than 11 hours into the series normalize over the weights present.

_EWMA_POINTS = 12  # trailing points; the d-hours-ago point weighs 2^-d


def ewma_hourly(events: DataFrame, points: int = _EWMA_POINTS) -> DataFrame:
    """(event_type, hour_ts, hourly_value, ewma_value): dense hourly
    total value per type smoothed by a trailing ``points``-term EWMA
    with dyadic weights (see the section note)."""
    if not 1 <= points <= 32:
        raise ValueError(f"points must be in [1, 32], got {points}")
    hourly = (
        events.filter(F.col("value").isNotNull())
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hour_ts"))
        .agg(
            F.sum(F.floor(F.col("value") * F.lit(1000000.0)).cast("bigint"))
            .cast("bigint")
            .alias("hv")
        )
    )
    bounds = hourly.agg(F.min("hour_ts").alias("lo"), F.max("hour_ts").alias("hi"))
    spine = (
        hourly.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias(
                "hour_ts"
            ),
        )
    )
    dense = spine.join(hourly, ["event_type", "hour_ts"], "left").select(
        "event_type", "hour_ts", F.coalesce("hv", F.lit(0)).cast("bigint").alias("hv")
    )
    w = Window.partitionBy("event_type").orderBy("hour_ts")
    num = sum(
        F.coalesce(F.lag("hv", d).over(w) * F.lit(1 << (points - 1 - d)), F.lit(0))
        for d in range(points)
    ).cast("bigint")
    den = sum(
        F.when(
            F.lag("hv", d).over(w).isNotNull(), F.lit(1 << (points - 1 - d))
        ).otherwise(F.lit(0))
        for d in range(points)
    ).cast("bigint")
    return dense.select(
        "event_type",
        "hour_ts",
        F.round(F.col("hv").cast("double") / F.lit(1000000.0), 6).alias("hourly_value"),
        F.round(
            num.cast("double") / (den.cast("double") * F.lit(1000000.0)), 6
        ).alias("ewma_value"),
    ).orderBy("event_type", "hour_ts")


def _ewma_sql(points: int = _EWMA_POINTS) -> str:
    num_terms = " + ".join(
        f"COALESCE(lag(hv, {d}) OVER w * {1 << (points - 1 - d)}, 0)"
        for d in range(points)
    )
    den_terms = " + ".join(
        f"CASE WHEN lag(hv, {d}) OVER w IS NOT NULL THEN {1 << (points - 1 - d)} ELSE 0 END"
        for d in range(points)
    )
    return f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts,
         CAST(SUM(CAST(FLOOR(value * 1000000.0) AS BIGINT)) AS BIGINT) AS hv
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type, date_trunc('hour', ts)
),
bounds AS (SELECT MIN(hour_ts) AS lo, MAX(hour_ts) AS hi FROM hourly),
spine AS (
  SELECT t.event_type, s.h AS hour_ts
  FROM (SELECT DISTINCT event_type FROM hourly) t
  CROSS JOIN bounds b,
  LATERAL (SELECT UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS h) s
),
dense AS (
  SELECT s.event_type, s.hour_ts, CAST(COALESCE(h.hv, 0) AS BIGINT) AS hv
  FROM spine s LEFT JOIN hourly h
    ON h.event_type = s.event_type AND h.hour_ts = s.hour_ts
),
smoothed AS (
  SELECT event_type, hour_ts, hv,
         CAST({num_terms} AS BIGINT) AS num,
         CAST({den_terms} AS BIGINT) AS den
  FROM dense
  WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts)
)
SELECT event_type, hour_ts,
       ROUND(CAST(hv AS DOUBLE) / 1000000.0, 6) AS hourly_value,
       ROUND(CAST(num AS DOUBLE) / (CAST(den AS DOUBLE) * 1000000.0), 6) AS ewma_value
FROM smoothed
ORDER BY event_type, hour_ts
"""


@query("events_ewma_hourly", oracle=_ewma_sql(), defer=True)
def events_ewma_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 12-point EWMA (dyadic weights, exact-integer numerator
    and denominator) of the dense hourly value series per event type."""
    return ewma_hourly(_t(spark, sf_dir, "events"))


# --- GROUPING SETS (r14) ------------------------------------------------------
#
# The 100 TB-preferred form the CUBE note above points at: enumerate
# ONLY the subtotal combinations a report needs — here (segment, year),
# (segment), and the grand total, deliberately OMITTING the (year)-only
# set — so the Expand multiplies each input row 3×, not CUBE's 4×
# (2^k generally). Same single-shuffle partial-agg plan otherwise;
# GROUPING() flags distinguish subtotal rows from real NULLs.

_GSETS_SQL = """
SELECT CASE WHEN GROUPING(c_mktsegment) = 1 THEN 'ALL' ELSE c_mktsegment END
           AS segment,
       CASE WHEN GROUPING(yr) = 1 THEN -1 ELSE yr END AS order_year,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM (SELECT c.c_mktsegment, YEAR(CAST(o.o_orderdate AS DATE)) AS yr, o.o_totalprice
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
GROUP BY GROUPING SETS ((c_mktsegment, yr), (c_mktsegment), ())
ORDER BY segment, order_year
"""


@query("olap_grouping_sets_segment_year", oracle=_GSETS_SQL, defer=True)
def olap_grouping_sets_segment_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS ((segment, year), (segment), ()) over orders
    enriched with the broadcast customer dimension — the explicit-subset
    subtotal operator (see the section note)."""
    orders = _t(spark, sf_dir, "orders")
    cust = F.broadcast(
        _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    )
    base = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "c_mktsegment",
        F.year(F.col("o_orderdate").cast("date")).alias("yr"),
        "o_totalprice",
    )
    return (
        base.groupingSets(
            [["c_mktsegment", "yr"], ["c_mktsegment"], []],
            "c_mktsegment",
            "yr",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
            F.grouping("c_mktsegment").alias("_g_seg"),
            F.grouping("yr").alias("_g_yr"),
        )
        .select(
            F.when(F.col("_g_seg") == 1, "ALL")
            .otherwise(F.col("c_mktsegment"))
            .alias("segment"),
            F.when(F.col("_g_yr") == 1, -1).otherwise(F.col("yr")).alias("order_year"),
            "n_orders",
            "total_price",
        )
        .orderBy("segment", "order_year")
    )


# --- winsorized statistics (r14) ------------------------------------------------
#
# Heavy-tail preprocessing: clamp each type's values at its exact
# interpolated p01/p99 before averaging — the robust mean a spiky
# `value` column needs (the MAD/z-score outlier DETECTORS above flag
# rows; winsorization is the TREATMENT that keeps them bounded).
# Percentiles are exact linear interpolation (Spark percentile ≡ DuckDB
# quantile_cont, 6-dp-rounded — the perplexity_buckets threshold idiom);
# clamping and the means run in 1e6 fixed point so every sum is a
# partition-order-exact bigint, with the thresholds floored to the same
# fixed point in both engines. Scale shape: one per-type percentile agg
# (Spark's percentile is a partial-aggregating sketchless exact impl
# over the per-type groups), broadcast back, one clamped partial-agg
# pass — two corpus scans, no window.


def winsorized_stats(events: DataFrame, lo: float = 0.01, hi: float = 0.99) -> DataFrame:
    """(event_type, n_events, p_lo, p_hi, mean_raw, mean_winsorized,
    n_clamped) per type — see the section note."""
    if not 0.0 <= lo < hi <= 1.0:
        raise ValueError(f"need 0 <= lo < hi <= 1, got ({lo}, {hi})")
    rows = events.filter(F.col("value").isNotNull()).select(
        "event_type", F.floor(F.col("value") * F.lit(1000000.0)).cast("bigint").alias("v")
    )
    th = rows.groupBy("event_type").agg(
        F.floor(
            F.round(F.percentile(F.col("v").cast("double"), F.lit(lo)), 6)
        ).cast("bigint").alias("t_lo"),
        F.floor(
            F.round(F.percentile(F.col("v").cast("double"), F.lit(hi)), 6)
        ).cast("bigint").alias("t_hi"),
    )
    clamped = F.greatest(F.least(F.col("v"), F.col("t_hi")), F.col("t_lo"))
    return (
        rows.join(F.broadcast(th), "event_type")
        .groupBy("event_type", "t_lo", "t_hi")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("v").cast("bigint").alias("_sr"),
            F.sum(clamped).cast("bigint").alias("_sw"),
            F.sum(F.when(clamped != F.col("v"), 1).otherwise(0)).cast("bigint").alias("n_clamped"),
        )
        .select(
            "event_type",
            "n_events",
            F.round(F.col("t_lo").cast("double") / F.lit(1000000.0), 6).alias("p_lo"),
            F.round(F.col("t_hi").cast("double") / F.lit(1000000.0), 6).alias("p_hi"),
            F.round(
                F.col("_sr").cast("double") / (F.col("n_events").cast("double") * F.lit(1000000.0)), 6
            ).alias("mean_raw"),
            F.round(
                F.col("_sw").cast("double") / (F.col("n_events").cast("double") * F.lit(1000000.0)), 6
            ).alias("mean_winsorized"),
            "n_clamped",
        )
        .orderBy("event_type")
    )


_WINSOR_SQL = """
WITH rows_ AS (
  SELECT event_type, CAST(FLOOR(value * 1000000.0) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL
),
th AS (
  SELECT event_type,
         CAST(FLOOR(ROUND(quantile_cont(CAST(v AS DOUBLE), 0.01), 6)) AS BIGINT) AS t_lo,
         CAST(FLOOR(ROUND(quantile_cont(CAST(v AS DOUBLE), 0.99), 6)) AS BIGINT) AS t_hi
  FROM rows_ GROUP BY event_type
)
SELECT r.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(CAST(t_lo AS DOUBLE) / 1000000.0, 6) AS p_lo,
       ROUND(CAST(t_hi AS DOUBLE) / 1000000.0, 6) AS p_hi,
       ROUND(CAST(SUM(v) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 1000000.0), 6) AS mean_raw,
       ROUND(CAST(SUM(greatest(least(v, t_hi), t_lo)) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * 1000000.0), 6) AS mean_winsorized,
       CAST(SUM(CASE WHEN greatest(least(v, t_hi), t_lo) <> v THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clamped
FROM rows_ r JOIN th USING (event_type)
GROUP BY r.event_type, t_lo, t_hi
ORDER BY r.event_type
"""


@query("events_winsorized_stats", oracle=_WINSOR_SQL)
def events_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (p01/p99-clamped) vs raw mean value per event type —
    the robust-mean treatment beside the MAD/z-score detectors."""
    return winsorized_stats(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Session Markov transition matrix (r16): P(next event type | current),
# within the same 30-minute sessions as events_sessionize, with explicit
# START/END states. The first-order behavioral model funnel dashboards and
# Markov attribution build on — transition COUNTS are exact bigints off one
# lag window (sharing the sessionize shuffle), probabilities are one
# rounded division per row of the <= (k+1)^2-state matrix (k = distinct
# event types), normalized per from_state over that KB-sized table.
# ---------------------------------------------------------------------------

_MARKOV_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
),
stepped AS (
  SELECT COALESCE(LAG(event_type) OVER w, '__START__') AS from_state,
         event_type AS to_state,
         ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
                            ORDER BY ts DESC, event_id DESC) AS rn_last,
         event_type
  FROM sess
  WINDOW w AS (PARTITION BY user_id, session_seq ORDER BY ts, event_id)
),
transitions AS (
  SELECT from_state, to_state FROM stepped
  UNION ALL
  SELECT event_type, '__END__' FROM stepped WHERE rn_last = 1
),
counts AS (
  SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS n_transitions
  FROM transitions GROUP BY from_state, to_state
)
SELECT from_state, to_state, n_transitions,
       ROUND(CAST(n_transitions AS DOUBLE)
             / CAST(SUM(n_transitions) OVER (PARTITION BY from_state) AS DOUBLE),
             6) AS p
FROM counts
ORDER BY from_state, to_state
"""


def session_markov_transitions(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(from_state, to_state, n_transitions, p): first-order Markov
    transition matrix over event types within inactivity-gap sessions,
    with __START__/__END__ boundary states; p normalized per
    from_state."""
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w_u))
    flagged = events.select(
        "user_id", "ts", "event_id", "event_type",
        F.when(
            F.lag("ts").over(w_u).isNull()
            | (gap > F.lit(gap_minutes * 60 * 1_000_000)),
            1,
        ).otherwise(0).alias("new_session"),
    )
    sess = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(
            w_u.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    w_s = Window.partitionBy("user_id", "session_seq").orderBy("ts", "event_id")
    w_s_desc = Window.partitionBy("user_id", "session_seq").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    stepped = sess.select(
        F.coalesce(F.lag("event_type").over(w_s), F.lit("__START__")).alias(
            "from_state"
        ),
        F.col("event_type").alias("to_state"),
        F.row_number().over(w_s_desc).alias("rn_last"),
        "event_type",
    )
    transitions = stepped.select("from_state", "to_state").unionAll(
        stepped.filter(F.col("rn_last") == 1).select(
            F.col("event_type").alias("from_state"),
            F.lit("__END__").alias("to_state"),
        )
    )
    counts = transitions.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_transitions")
    )
    # (k+1)^2-row matrix only — the per-from_state normalization window
    # never touches event rows
    w_from = Window.partitionBy("from_state")
    return counts.select(
        "from_state",
        "to_state",
        "n_transitions",
        F.round(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(w_from).cast("double"),
            6,
        ).alias("p"),
    ).orderBy("from_state", "to_state")


@query("events_markov_transitions", oracle=_MARKOV_SQL)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level Markov transition matrix of event types (START/END
    bounded, 30-minute sessions) — the behavioral-model layer above
    events_sessionize. DuckDB replays sessionization, the lag pairing,
    and the normalization."""
    return session_markov_transitions(_t(spark, sf_dir, "events"))


# --- weekly seasonality profile (r17) ------------------------------------------
#
# The events tier has trend tools (EWMA, Theil-Sen, CUSUM) but no
# SEASONALITY readout — the hour-of-week profile every capacity plan and
# anomaly baseline starts from. Exact-integer discipline: hourly counts
# (the survival.py hour-bucket) group by hour-of-week = hr % 168 (epoch
# arithmetic, identical in both engines — NOT dayofweek(), whose origin
# differs); per-bucket Σx and Σx² stay exact bigints, and the seasonal
# strength 1 − SS_within/SS_total derives from those exact sums through
# one mirrored parenthesization. Every fold input is bounded: the hourly
# table by the observation span, the profile by 168 rows.

_WEEK_HOURS = 168


def weekly_seasonality(events: DataFrame) -> DataFrame:
    """(how, n_hours, n_events, rate_mean, rate_index, seasonal_strength):
    hour-of-week activity profile with the variance-decomposition
    seasonal strength (shared across rows)."""
    hour_us = 3_600_000_000
    hourly = (
        events.select(F.expr(f"unix_micros(ts) div {hour_us}").alias("hr"))
        .groupBy("hr")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    prof = hourly.groupBy((F.col("hr") % _WEEK_HOURS).alias("how")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    tot = F.broadcast(
        prof.agg(
            F.sum("n_hours").cast("bigint").alias("h"),
            F.sum("sx").cast("bigint").alias("tx"),
            F.sum("sxx").cast("bigint").alias("txx"),
            # SS_within = Σ_g (sxx_g − sx_g²/n_g); fold the per-group float
            # terms here so the 168-row profile is the only window input
            F.sum(
                F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
                / F.col("n_hours").cast("double")
            ).alias("ss_within"),
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    ss_total = d("txx") - d("tx") * d("tx") / d("h")
    strength = F.lit(1.0) - F.col("ss_within") / F.nullif(ss_total, F.lit(0.0))
    return (
        prof.crossJoin(tot)
        .select(
            F.col("how").cast("bigint").alias("how"),
            "n_hours",
            F.col("sx").alias("n_events"),
            F.round(d("sx") / d("n_hours"), 6).alias("rate_mean"),
            F.round(
                (d("sx") / d("n_hours")) / F.nullif(d("tx") / d("h"), F.lit(0.0)), 6
            ).alias("rate_index"),
            F.round(strength, 6).alias("seasonal_strength"),
        )
        .orderBy("how")
    )


_SEASON_SQL = f"""
WITH hourly AS (
  SELECT epoch_us(ts) // 3600000000 AS hr, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY hr
),
prof AS (
  SELECT hr % {_WEEK_HOURS} AS how,
         CAST(COUNT(*) AS BIGINT) AS n_hours,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM hourly GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_hours) AS BIGINT) AS h,
         CAST(SUM(sx) AS BIGINT) AS tx,
         CAST(SUM(sxx) AS BIGINT) AS txx,
         SUM(CAST(sxx AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n_hours AS DOUBLE)) AS ss_within
  FROM prof
)
SELECT CAST(p.how AS BIGINT) AS how,
       p.n_hours,
       p.sx AS n_events,
       ROUND(CAST(p.sx AS DOUBLE) / CAST(p.n_hours AS DOUBLE), 6) AS rate_mean,
       ROUND((CAST(p.sx AS DOUBLE) / CAST(p.n_hours AS DOUBLE))
             / NULLIF(CAST(t.tx AS DOUBLE) / CAST(t.h AS DOUBLE), 0.0), 6) AS rate_index,
       ROUND(1.0 - t.ss_within
             / NULLIF(CAST(t.txx AS DOUBLE)
                      - CAST(t.tx AS DOUBLE) * CAST(t.tx AS DOUBLE) / CAST(t.h AS DOUBLE), 0.0), 6)
         AS seasonal_strength
FROM prof p, tot t
ORDER BY how
"""


@query("events_weekly_seasonality", oracle=_SEASON_SQL)
def events_weekly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-week activity profile with variance-decomposition seasonal
    strength — the seasonality baseline beside EWMA/Theil-Sen/CUSUM.
    DuckDB replays the hour buckets, the 168-row profile, and the SS
    decomposition."""
    return weekly_seasonality(tpch.load(spark, sf_dir, "events"))


# --- burstiness (r18) ----------------------------------------------------------
#
# Goh & Barabási 2008: the burstiness coefficient B = (σ−μ)/(σ+μ) of
# inter-event times separates Poisson-like traffic (B ≈ 0) from bursty
# human/bot activity (B → 1) and clockwork producers (B → −1) — the
# standard first look at whether an event stream's timing is organic,
# and a cheap bot/replay signal for a training-data pipeline.
#
# Scale shape: gaps come from a lag over Window.partitionBy(user_id,
# event_type) — per-user-stream cardinality, never a global sort — and
# everything after is one exact-integer groupBy: gaps in micros are
# bigints, their squares accumulate in decimal(38,0) (a 60-day span in
# micros squared is ~2.7e31, past int64), and the closed form
# σ² = (n·Σx² − (Σx)²)/n² touches doubles only in the final division.


def burstiness(events: DataFrame) -> DataFrame:
    """(event_type, n_gaps, mean_gap_s, std_gap_s, burstiness): the
    Goh-Barabási coefficient of within-user inter-event times, per
    event type."""
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = (
        events.select(
            "event_type",
            (
                F.unix_micros("ts")
                - F.unix_micros(F.lag("ts").over(w))
            ).alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    agg = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum("gap_us").cast("decimal(38,0)").alias("s1"),
        F.sum(F.col("gap_us").cast("decimal(38,0)") * F.col("gap_us")).alias("s2"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    n = d("n_gaps")
    mean = d("s1") / F.nullif(n, F.lit(0.0))
    var = (n * d("s2") - d("s1") * d("s1")) / F.nullif(n * n, F.lit(0.0))
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    b = (std - mean) / F.nullif(std + mean, F.lit(0.0))
    return agg.select(
        "event_type",
        "n_gaps",
        F.round(mean / F.lit(1e6), 6).alias("mean_gap_s"),
        F.round(std / F.lit(1e6), 6).alias("std_gap_s"),
        F.round(b, 6).alias("burstiness"),
    ).orderBy("event_type")


_BURST_SQL = """
WITH gaps AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id
         ) AS gap_us
  FROM events
),
agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_gaps,
         CAST(SUM(gap_us) AS HUGEINT) AS s1,
         SUM(CAST(gap_us AS HUGEINT) * gap_us) AS s2
  FROM gaps WHERE gap_us IS NOT NULL
  GROUP BY event_type
)
SELECT event_type, n_gaps,
       ROUND((CAST(s1 AS DOUBLE) / NULLIF(CAST(n_gaps AS DOUBLE), 0.0)) / 1e6, 6) AS mean_gap_s,
       ROUND(SQRT(GREATEST(
               (CAST(n_gaps AS DOUBLE) * CAST(s2 AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
               / NULLIF(CAST(n_gaps AS DOUBLE) * CAST(n_gaps AS DOUBLE), 0.0),
               0.0)) / 1e6, 6) AS std_gap_s,
       ROUND((SQRT(GREATEST(
                (CAST(n_gaps AS DOUBLE) * CAST(s2 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                / NULLIF(CAST(n_gaps AS DOUBLE) * CAST(n_gaps AS DOUBLE), 0.0),
                0.0))
              - CAST(s1 AS DOUBLE) / NULLIF(CAST(n_gaps AS DOUBLE), 0.0))
             / NULLIF(SQRT(GREATEST(
                (CAST(n_gaps AS DOUBLE) * CAST(s2 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                / NULLIF(CAST(n_gaps AS DOUBLE) * CAST(n_gaps AS DOUBLE), 0.0),
                0.0))
              + CAST(s1 AS DOUBLE) / NULLIF(CAST(n_gaps AS DOUBLE), 0.0), 0.0), 6) AS burstiness
FROM agg
ORDER BY event_type
"""


@query("events_burstiness", oracle=_BURST_SQL, defer=True)
def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh-Barabási burstiness of within-user inter-event times per
    event type — Poisson-like traffic reads ≈0, bursty organic/bot
    activity → 1, clockwork producers → −1. DuckDB replays the keyed
    lag, the exact-integer moment sums, and the closed form."""
    return burstiness(tpch.load(spark, sf_dir, "events"))
