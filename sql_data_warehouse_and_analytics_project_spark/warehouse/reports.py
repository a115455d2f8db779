"""Gold-layer report views (EP2; SURVEY §2.12 Q12/Q13 on the star schema).

Faithful re-expression of the two consolidated report views over the
engine's own gold tables:
- gold.report_customers (ref: scripts/Data Analytics/12_report_customers.sql:31-106)
- gold.report_products  (ref: scripts/Data Analytics/13_report_products.sql:30-114)

The oracle-checked TPC-H twins live in analytics.py (q12/q13); these run on
the warehouse star schema so a reference user's `SELECT * FROM
gold.report_customers` works unchanged (register_views).

GETDATE() is replaced by the RunContext's injectable ``as_of`` clock
(SURVEY §7.4.4) so recency/age KPIs are deterministic under test.

Documented deviation (SURVEY §2.12 ⚠): the reference view drops its
``lifespan`` column through a missing-comma typo (``total_products
lifespan,`` at 12_report_customers.sql:96-97 aliases one as the other); we
emit the intended schema — both columns — per the view's own header comment
(12:12-17).

Plan shape at scale: one broadcast join fact×dim, one aggregation shuffle on
the dim key, then pure projections — the same two-exchange plan as the
oracle-checked twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tsql import MONEY, datediff_month, datediff_year
from .audit import RunContext


def report_customers(ctx: RunContext) -> DataFrame:
    """Per-customer KPIs: segments, recency, AOV, monthly spend."""
    cat = ctx.catalog
    as_of = F.lit(ctx.as_of.date())
    fact = cat.read("gold.fact_sales")
    dim = cat.read("gold.dim_customers")

    base = (
        fact.join(F.broadcast(dim), "customer_key", "left")
        .filter(F.col("order_date").isNotNull())
        .select(
            "order_number",
            "product_key",
            "order_date",
            "sales_amount",
            "quantity",
            "customer_key",
            "customer_number",
            F.concat_ws(" ", "first_name", "last_name").alias("customer_name"),
            datediff_year(F.col("birthdate"), as_of).alias("age"),
        )
    )
    agg = base.groupBy("customer_key", "customer_number", "customer_name", "age").agg(
        F.countDistinct("order_number").alias("total_orders"),
        F.sum("sales_amount").cast(MONEY).alias("total_sales"),
        F.sum("quantity").alias("total_quantity"),
        F.countDistinct("product_key").alias("total_products"),
        F.max("order_date").alias("last_order_date"),
        datediff_month(F.min("order_date"), F.max("order_date")).alias("lifespan"),
    )
    return agg.select(
        "customer_key",
        "customer_number",
        "customer_name",
        "age",
        F.when(F.col("age") < 20, "Under 20")
        .when(F.col("age").between(20, 29), "20-29")
        .when(F.col("age").between(30, 39), "30-39")
        .when(F.col("age").between(40, 49), "40-49")
        .otherwise("50 and above")
        .alias("age_group"),
        F.when((F.col("lifespan") >= 12) & (F.col("total_sales") > 5000), "VIP")
        .when((F.col("lifespan") >= 12) & (F.col("total_sales") <= 5000), "Regular")
        .otherwise("New")
        .alias("customer_segment"),
        "last_order_date",
        datediff_month(F.col("last_order_date"), as_of).alias("recency"),
        "total_orders",
        "total_sales",
        "total_quantity",
        "total_products",
        "lifespan",
        F.when(F.col("total_sales") == 0, F.lit(0))
        .otherwise(F.col("total_sales") / F.col("total_orders"))
        .cast(MONEY)
        .alias("avg_order_value"),
        F.when(F.col("lifespan") == 0, F.col("total_sales"))
        .otherwise(F.col("total_sales") / F.col("lifespan"))
        .cast(MONEY)
        .alias("avg_monthly_spend"),
    )


def report_products(ctx: RunContext) -> DataFrame:
    """Per-product KPIs: performance segment, recency, AOR, monthly revenue."""
    cat = ctx.catalog
    as_of = F.lit(ctx.as_of.date())
    fact = cat.read("gold.fact_sales")
    dim = cat.read("gold.dim_products")

    base = (
        fact.join(F.broadcast(dim), "product_key", "left")
        .filter(F.col("order_date").isNotNull())
        .select(
            "order_number",
            "order_date",
            "customer_key",
            "sales_amount",
            "quantity",
            "product_key",
            "product_name",
            "category",
            "subcategory",
            "cost",
        )
    )
    agg = base.groupBy("product_key", "product_name", "category", "subcategory", "cost").agg(
        datediff_month(F.min("order_date"), F.max("order_date")).alias("lifespan"),
        F.max("order_date").alias("last_sale_date"),
        F.countDistinct("order_number").alias("total_orders"),
        F.countDistinct("customer_key").alias("total_customers"),
        F.sum("sales_amount").cast(MONEY).alias("total_sales"),
        F.sum("quantity").alias("total_quantity"),
        F.round(
            F.avg(F.col("sales_amount").cast("double") / F.nullif(F.col("quantity"), F.lit(0))), 1
        ).alias("avg_selling_price"),
    )
    return agg.select(
        "product_key",
        "product_name",
        "category",
        "subcategory",
        "cost",
        "last_sale_date",
        datediff_month(F.col("last_sale_date"), as_of).alias("recency_in_months"),
        F.when(F.col("total_sales") > 50000, "High-Performer")
        .when(F.col("total_sales") >= 10000, "Mid-Range")
        .otherwise("Low-Performer")
        .alias("product_segment"),
        "lifespan",
        "total_orders",
        "total_sales",
        "total_quantity",
        "total_customers",
        "avg_selling_price",
        F.when(F.col("total_orders") == 0, F.lit(0))
        .otherwise(F.col("total_sales") / F.col("total_orders"))
        .cast(MONEY)
        .alias("avg_order_revenue"),
        F.when(F.col("lifespan") == 0, F.col("total_sales"))
        .otherwise(F.col("total_sales") / F.col("lifespan"))
        .cast(MONEY)
        .alias("avg_monthly_revenue"),
    )


def register_views(ctx: RunContext) -> None:
    """CREATE VIEW analog: expose the reports as catalog temp views so
    ``spark.sql("SELECT * FROM gold_report_customers")`` works as in the
    reference (ref: 12_report_customers.sql:31, 13_report_products.sql:30)."""
    report_customers(ctx).createOrReplaceTempView("gold_report_customers")
    report_products(ctx).createOrReplaceTempView("gold_report_products")
