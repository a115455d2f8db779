"""r19 experiment: partial COUNT(DISTINCT)-Expand removal for q12/q13
(VERDICT r18 ask #5 — one measured attempt each, adopt only if faster AND
bit-identical).

q13_v1: the q05 two-level pattern at (part-group, orderkey) grain — both
  o_custkey and o_orderdate are functional on l_orderkey, so after the
  pre-agg the final aggregate keeps ONE distinct (custkey) and Catalyst
  plans it without Expand at all.

q12_v1: order-grain leg (plain aggs, no distinct) + parts leg
  (single-distinct) over a shared order-grain dim join, null-safe-joined
  back on the customer group key.

Usage: python tools/r19_q1213.py [--runs 5] [--check-only]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sql_data_warehouse_and_analytics_project_spark import analytics as A
from sql_data_warehouse_and_analytics_project_spark.analytics import (
    AS_OF_DATE,
    _t,
    qty_col,
    rev_col,
)
from sql_data_warehouse_and_analytics_project_spark.tsql import datediff_month, money
from sql_data_warehouse_and_analytics_project_spark.session import get_spark
from sql_data_warehouse_and_analytics_project_spark.sources import tpch


def q13_v1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_name", "p_brand", "p_type")
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left")
        .join(part, li.l_partkey == part.p_partkey, "left")
        .filter(F.col("o_orderdate").isNotNull())
    )
    unit_price_ratio = F.floor(
        money("l_extendedprice").cast("double")
        / F.nullif(F.col("l_quantity"), F.lit(0))
        * F.lit(1000000.0)
    ).cast("bigint")
    gk = ["p_partkey", "p_name", "p_brand", "p_type"]
    # (part-group, order) grain: o_custkey / o_orderdate are functional on
    # l_orderkey, so min() recovers them exactly
    pre = base.groupBy(*gk, "l_orderkey").agg(
        F.min("o_custkey").alias("_cust"),
        F.min("o_orderdate").alias("_od"),
        F.sum(rev_col()).alias("_rev"),
        F.sum(qty_col()).alias("_qty"),
        F.sum(unit_price_ratio).alias("_upr"),
        F.count(F.lit(1)).alias("_nl"),
    )
    agg = (
        pre.groupBy(*gk)
        .agg(
            F.count(F.lit(1)).alias("total_orders"),
            F.countDistinct("_cust").alias("total_customers"),
            F.sum("_rev").alias("total_sales_dec"),
            F.sum("_qty").cast("double").alias("total_quantity"),
            F.max("_od").cast("date").alias("last_sale_date"),
            F.min("_od").alias("first_sale_date"),
            (F.sum("_upr").cast("double") / F.lit(1000000.0) / F.sum("_nl")).alias(
                "avg_unit_price"
            ),
        )
        .withColumn(
            "lifespan_months", datediff_month(F.col("first_sale_date"), F.col("last_sale_date"))
        )
    )
    total_sales = F.col("total_sales_dec").cast("double")
    return agg.select(
        "p_partkey",
        "p_name",
        "p_brand",
        "p_type",
        "total_orders",
        "total_customers",
        total_sales.alias("total_sales"),
        "total_quantity",
        "last_sale_date",
        "lifespan_months",
        "avg_unit_price",
        datediff_month(F.col("last_sale_date"), F.lit(AS_OF_DATE).cast("date")).alias(
            "recency_months"
        ),
        F.when(F.col("total_sales_dec") > 400000, "High-Performer")
        .when(F.col("total_sales_dec") >= 150000, "Mid-Range")
        .otherwise("Low-Performer")
        .alias("product_segment"),
        (total_sales / F.col("total_orders")).alias("avg_order_revenue"),
        F.when(F.col("lifespan_months") == 0, total_sales)
        .otherwise(total_sales / F.col("lifespan_months"))
        .alias("avg_monthly_revenue"),
    ).orderBy("p_partkey")


def q12_v1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    customer = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_nationkey"
    )
    nation = tpch.dim(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    odim = (
        orders.filter(F.col("o_orderdate").isNotNull())
        .join(customer, orders.o_custkey == customer.c_custkey, "left")
        .join(nation, customer.c_nationkey == nation.n_nationkey, "left")
        .select(
            "o_orderkey",
            "o_orderdate",
            "c_custkey",
            "c_name",
            "c_mktsegment",
            F.col("n_name").alias("nation_name"),
        )
    )
    gk = ["c_custkey", "c_name", "c_mktsegment", "nation_name"]
    liagg = li.groupBy("l_orderkey").agg(
        F.sum(rev_col()).alias("_rev"), F.sum(qty_col()).alias("_qty")
    )
    leg1 = (
        liagg.join(odim, liagg.l_orderkey == odim.o_orderkey)
        .groupBy(*gk)
        .agg(
            F.count(F.lit(1)).alias("total_orders"),
            F.sum("_rev").alias("total_sales_dec"),
            F.sum("_qty").cast("double").alias("total_quantity"),
            F.max("o_orderdate").cast("date").alias("last_order_date"),
            F.min("o_orderdate").alias("first_order_date"),
        )
    )
    leg2 = (
        li.select("l_orderkey", "l_partkey")
        .join(odim, F.col("l_orderkey") == odim.o_orderkey)
        .groupBy(*gk)
        .agg(F.countDistinct("l_partkey").alias("total_parts"))
    )
    l1, l2 = leg1.alias("l1"), leg2.alias("l2")
    cond = None
    for k in gk:
        c = F.col(f"l1.{k}").eqNullSafe(F.col(f"l2.{k}"))
        cond = c if cond is None else cond & c
    agg = l1.join(l2, cond).select(
        *[F.col(f"l1.{k}") for k in gk],
        "total_orders",
        "total_sales_dec",
        "total_quantity",
        "total_parts",
        "last_order_date",
        "first_order_date",
    ).withColumn(
        "lifespan_months", datediff_month(F.col("first_order_date"), F.col("last_order_date"))
    )
    total_sales = F.col("total_sales_dec").cast("double")
    return agg.select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        "nation_name",
        "total_orders",
        total_sales.alias("total_sales"),
        "total_quantity",
        "total_parts",
        "last_order_date",
        "lifespan_months",
        F.when((F.col("lifespan_months") >= 12) & (F.col("total_sales_dec") > 500000), "VIP")
        .when(F.col("lifespan_months") >= 12, "Regular")
        .otherwise("New")
        .alias("customer_segment"),
        datediff_month(F.col("last_order_date"), F.lit(AS_OF_DATE).cast("date")).alias(
            "recency_months"
        ),
        (total_sales / F.col("total_orders")).alias("avg_order_value"),
        F.when(F.col("lifespan_months") == 0, total_sales)
        .otherwise(total_sales / F.col("lifespan_months"))
        .alias("avg_monthly_spend"),
    ).orderBy("c_custkey")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--check-only", action="store_true")
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r19_q1213")
    spark.sparkContext.setLogLevel("ERROR")
    for t in tpch.TABLES:
        df = tpch.load(spark, sf_dir, t)
        df.agg(F.count(F.xxhash64(*df.columns))).collect()

    pairs = {
        "q12": (A.q12_report_customers(spark, sf_dir), q12_v1(spark, sf_dir)),
        "q13": (A.q13_report_products(spark, sf_dir), q13_v1(spark, sf_dir)),
    }
    for name, (cur, new) in pairs.items():
        d = cur.exceptAll(new).count() + new.exceptAll(cur).count()
        print(f"{name}: exceptAll diff rows = {d}")
        assert d == 0, f"{name} v1 NOT identical"
        ex = new._jdf.queryExecution().executedPlan().toString()
        print(f"{name}_v1 Expand nodes: {ex.count('Expand')}, Exchange: {ex.count('Exchange')}")
        ex0 = cur._jdf.queryExecution().executedPlan().toString()
        print(f"{name}_cur Expand nodes: {ex0.count('Expand')}, Exchange: {ex0.count('Exchange')}")
    if args.check_only:
        return
    times: dict[str, list[float]] = {}
    flat = [(f"{n}_{v}", df) for n, (c, nw) in pairs.items() for v, df in (("cur", c), ("new", nw))]
    for k, df in flat:
        noop(df)
        times[k] = []
    for r in range(args.runs):
        for k, df in flat:
            spark.sparkContext.setJobDescription(f"{k} run{r}")
            t0 = time.time()
            noop(df)
            times[k].append(time.time() - t0)
    for k, ts in times.items():
        print(f"{k:10s} min={min(ts):.3f} runs={[round(t,3) for t in ts]}")


if __name__ == "__main__":
    main()
