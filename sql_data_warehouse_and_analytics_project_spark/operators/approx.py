"""Approximate aggregates: the scale path for distinct counts and percentiles.

At 100 TB, exact COUNT(DISTINCT) forces a full shuffle of every distinct
value and exact percentiles require a per-group sort; both sketches below
are mergeable map-side (constant memory per partition, one small shuffle of
sketch bytes):

- `approx_count_distinct` — HyperLogLog++ (relative error ~rsd, default 5%)
- `percentile_approx` — t-digest-style quantile sketch (bounded rank error)

Sketch internals differ across engines, so these register rows-only (no
DuckDB hash oracle — the driver's weaker check); correctness is gated by
`tests/test_training_data_ops.py::test_approx_*`, which bounds the error
against the exact twins (`q05`-family exact distincts and
`olap_percentiles_by_segment`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tpch.load(spark, sf_dir, name)


def olap_approx_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct customers and parts per order priority (rsd=0.02).
    The sketch is a fixed-size register array merged associatively, so the
    plan is a plain partial+final aggregation — no distinct-value shuffle,
    unlike exact countDistinct which Catalyst expands to a two-pass
    Expand+double-aggregate."""
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    joined = lineitem.join(
        orders.select("o_orderkey", "o_orderpriority"),
        lineitem.l_orderkey == orders.o_orderkey,
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_orderkey", rsd=0.02).alias("approx_orders"),
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        )
        .orderBy("o_orderpriority")
    )


def olap_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p90/p99 order price per market segment
    (accuracy=10000 → rank error ≤ 1/10000). Mergeable sketch: the same
    single-shuffle plan at any scale, where exact percentile
    (olap_percentiles_by_segment) must materialize each group's full value
    list."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    price = F.col("o_totalprice").cast("double")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.percentile_approx(price, [0.5, 0.9, 0.99], 10000).alias("pctl")
        )
        .select(
            "mktsegment",
            F.col("pctl")[0].alias("p50"),
            F.col("pctl")[1].alias("p90"),
            F.col("pctl")[2].alias("p99"),
        )
        .orderBy("mktsegment")
    )

@query("olap_approx_summary", oracle=None)
def olap_approx_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both approximate-aggregate operators (HLL++ distincts per order
    priority, t-digest percentiles per market segment), union-tagged into
    one rows-only driver entry; sketch internals differ across engines so
    there is no hash oracle by design — error bounds are pytest-gated
    against the exact twins (tests/test_training_data_ops.py)."""
    _nd = F.lit(None).cast("double")
    distinct = olap_approx_distinct_customers(spark, sf_dir).select(
        F.lit("hll_distinct").alias("sketch"),
        F.col("o_orderpriority").alias("grp"),
        F.col("approx_orders").cast("double").alias("v1"),
        F.col("approx_parts").cast("double").alias("v2"),
        _nd.alias("v3"),
    )
    pctl = olap_approx_percentiles(spark, sf_dir).select(
        F.lit("tdigest_percentiles").alias("sketch"),
        F.col("mktsegment").alias("grp"),
        F.col("p50").alias("v1"),
        F.col("p90").alias("v2"),
        F.col("p99").alias("v3"),
    )
    return distinct.unionByName(pctl).orderBy("sketch", "grp")
