"""Temporal join operators: as-of join and banded range join.

Neither exists in the reference (its only joins are equi joins, SURVEY
§2.3) and Spark has no native ASOF JOIN — these are the canonical custom
operators a time-series consumer of the warehouse needs, implemented as
compositions of built-in DataFrame ops (SURVEY §7 custom-operator tier a;
no Python UDFs):

- :func:`asof_join_backward` — for each left row, the latest right row with
  ``right_time <= left_time`` per key. NOT a join-then-rank (which would
  materialize every (left × matching-right) pair before pruning): both
  sides are tagged and unioned, sorted per key by time, and the match is
  ``last(payload, ignorenulls=True)`` over a running window — one shuffle
  on the key, state linear in rows, survives arbitrary key fan-in.
- :func:`range_band_join` — assign rows to bands from a (lo, hi) lookup via
  a broadcast theta join; the band table is tiny by definition, so the plan
  is scan → BroadcastNestedLoopJoin with the range predicate, no shuffle.

DuckDB speaks native ``ASOF JOIN``, giving the as-of operator a true
cross-engine oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    payload: str,
    payload_alias: str = "asof_value",
    inner: bool = True,
) -> DataFrame:
    """Latest-right-at-or-before-left as-of join (see module docstring).

    At equal timestamps the right row wins (``ts >= right_time`` semantics):
    right rows sort before left rows within a tie so the running
    ``last(payload)`` already contains them when the left row is evaluated.
    """
    p_type = dict(right.dtypes)[payload]
    r = right.select(
        F.col(right_on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.col(payload).alias("_p"),
        F.lit(1).alias("_is_r"),
    )
    l = (
        left.withColumn("_k", F.col(left_on))
        .withColumn("_t", F.col(left_time))
        .withColumn("_p", F.lit(None).cast(p_type))
        .withColumn("_is_r", F.lit(0))
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t"), F.desc("_is_r"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        u.withColumn(payload_alias, F.last("_p", ignorenulls=True).over(w))
        .filter(F.col("_is_r") == 0)
        .drop("_k", "_t", "_p", "_is_r")
    )
    if inner:
        out = out.filter(F.col(payload_alias).isNotNull())
    return out


_ASOF_SQL = """
SELECT e.event_id, e.user_id, CAST(o.o_orderdate AS DATE) AS last_orderdate
FROM events e
ASOF JOIN orders o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
ORDER BY e.event_id
"""


@query("temporal_asof_event_order", oracle=_ASOF_SQL, defer=True)
def temporal_asof_event_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event matched to the user's latest order at-or-before the event
    time — checked against DuckDB's native ASOF JOIN. Payload is the order
    *date* (not an order id) so max-date ties cannot make the oracle
    nondeterministic."""
    events = tpch.load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = tpch.load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", F.col("o_orderdate").cast("date").alias("o_date")
    )
    return (
        asof_join_backward(
            events, orders,
            left_on="user_id", right_on="o_custkey",
            left_time="ts", right_time="o_orderdate",
            payload="o_date", payload_alias="last_orderdate",
        )
        .select("event_id", "user_id", "last_orderdate")
        .orderBy("event_id")
    )


def range_band_join(
    rows: DataFrame, bands: DataFrame, value: Column, lo: str = "lo", hi: str = "hi"
) -> DataFrame:
    """Band assignment via broadcast theta join: ``lo <= value < hi``."""
    return rows.join(F.broadcast(bands), (value >= F.col(lo)) & (value < F.col(hi)))


PRICE_BANDS = [
    ("budget", 0.0, 10_000.0),
    ("standard", 10_000.0, 30_000.0),
    ("premium", 30_000.0, 60_000.0),
    ("luxury", 60_000.0, 1e12),
]

_BAND_SQL = """
WITH bands(band, lo, hi) AS (
    VALUES ('budget', 0.0, 10000.0), ('standard', 10000.0, 30000.0),
           ('premium', 30000.0, 60000.0), ('luxury', 60000.0, 1000000000000.0)
)
SELECT band, CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM lineitem JOIN bands ON l_extendedprice >= lo AND l_extendedprice < hi
GROUP BY band
ORDER BY band
"""


@query("temporal_range_band_join", oracle=_BAND_SQL, defer=True)
def temporal_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitem price banding through the broadcast range join."""
    li = tpch.load(spark, sf_dir, "lineitem").select("l_extendedprice")
    bands = spark.createDataFrame(PRICE_BANDS, "band string, lo double, hi double")
    return (
        range_band_join(li, bands, F.col("l_extendedprice"))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
        )
        .orderBy("band")
    )
