"""ETL-layer operators from SURVEY.md §2, exposed as oracle-checkable
queries over the driver's testdata (the Medallion engine itself — SCD,
MERGE, watermark state — lives in ``warehouse/`` and is exercised by pytest;
these queries prove each underlying dataflow operator agrees with ANSI SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch
from ..tsql import row_hash, sql_row_hash

def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tpch.load(spark, sf_dir, name)


# --- W1: ROW_NUMBER dedup keep-latest (ref: proc_load_silver.sql:90-97) ----

_DEDUP_SQL = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
)
SELECT o_custkey, o_orderkey AS latest_orderkey, o_orderdate AS latest_orderdate
FROM ranked WHERE rn = 1
ORDER BY o_custkey
"""


@query("etl_dedup_keep_latest", oracle=_DEDUP_SQL)
def etl_dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-per-key dedup via ROW_NUMBER, the silver customer dedup
    pattern (ref: scripts/silver/proc_load_silver.sql:90-97, W1). Orderkey
    tiebreak makes the survivor deterministic under same-date ties."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_orderdate").cast("date").alias("latest_orderdate"),
        )
        .orderBy("o_custkey")
    )


# --- W2: global ROW_NUMBER surrogate keys (ref: proc_load_gold.sql:54,109) --

_SK_SQL = """
SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_name) AS BIGINT) AS nation_sk,
       n_nationkey, n_name
FROM nation
ORDER BY nation_sk
"""


@query("etl_surrogate_keys", oracle=_SK_SQL)
def etl_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic surrogate keys via global ROW_NUMBER over the natural key
    (ref: scripts/gold/proc_load_gold.sql:54,109, W2).

    Parity mode only: an un-partitioned window is a single-task sort — fine
    for dimension tables, hostile for facts. The warehouse gold builder uses
    the same construct on dims and documents the zipWithIndex-style scale
    path for anything fact-sized (SURVEY §7.4 risk 3)."""
    nation = _t(spark, sf_dir, "nation")
    w = Window.orderBy("n_name")
    return nation.select(
        F.row_number().over(w).cast("bigint").alias("nation_sk"), "n_nationkey", "n_name"
    ).orderBy("nation_sk")


# --- J7/J9: anti & semi joins (ref: proc_load_silver.sql:195-198) -----------

_ANTI_SQL = """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c.c_custkey
"""


@query("etl_anti_join_customers_no_orders", oracle=_ANTI_SQL)
def etl_anti_join_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers that never ordered — the NOT EXISTS insert guard
    and the gold orphan check (ref: proc_load_silver.sql:195-198 J7;
    tests/quality_checks_gold.sql:45-51 J9)."""
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .orderBy("c_custkey")
    )


_SEMI_SQL = """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= DATE '1998-01-01')
ORDER BY c.c_custkey
"""


@query("etl_semi_join_recent_customers", oracle=_SEMI_SQL)
def etl_semi_join_recent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join with a pushed-down date predicate (EXISTS form of J4)."""
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("date"))
        .select("o_custkey")
    )
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .orderBy("c_custkey")
    )


# --- P6: CASE decode (ref: proc_load_silver.sql:78-87) ----------------------

_DECODE_SQL = """
SELECT CASE WHEN o_orderstatus = 'O' THEN 'Open'
            WHEN o_orderstatus = 'F' THEN 'Fulfilled'
            WHEN o_orderstatus = 'P' THEN 'Pending'
            ELSE 'n/a' END AS order_status,
       COUNT(*) AS n_orders
FROM orders
GROUP BY 1
ORDER BY order_status
"""


@query("etl_case_decode_status", oracle=_DECODE_SQL)
def etl_case_decode_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coded-value decode via CASE with n/a default — the silver
    marital/gender/product-line decode pattern
    (ref: scripts/silver/proc_load_silver.sql:78-87,178-184, P6)."""
    orders = _t(spark, sf_dir, "orders")
    status = (
        F.when(F.col("o_orderstatus") == "O", "Open")
        .when(F.col("o_orderstatus") == "F", "Fulfilled")
        .when(F.col("o_orderstatus") == "P", "Pending")
        .otherwise("n/a")
    )
    return (
        orders.groupBy(status.alias("order_status"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("order_status")
    )


# --- P7: NULL repair expressions (ref: proc_load_silver.sql:234-240) --------

_REPAIR_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_quantity AS DECIMAL(18,2)) * ABS(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            / CAST(NULLIF(l_quantity, 0) AS DOUBLE) AS repaired_price,
       CAST(COALESCE(CAST(l_tax AS DECIMAL(8,4)), 0) AS DOUBLE) AS tax_filled
FROM lineitem
WHERE l_orderkey <= 100
ORDER BY l_orderkey, l_linenumber
"""


@query("etl_null_repair_expressions", oracle=_REPAIR_SQL)
def etl_null_repair_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABS/NULLIF/COALESCE repair arithmetic — the silver sales repair rules
    sales = qty × ABS(price), price = sales / NULLIF(qty,0)
    (ref: scripts/silver/proc_load_silver.sql:234-240, P7+A8)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    qty_dec = F.col("l_quantity").cast("decimal(18,2)")
    price_dec = F.col("l_extendedprice").cast("decimal(18,2)")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # exact decimal product, then double division — decimal division
        # rounding rules are engine-specific (SURVEY §7.4 risk 2)
        ((qty_dec * F.abs(price_dec)).cast("double")
         / F.nullif(F.col("l_quantity"), F.lit(0)).cast("double"))
        .alias("repaired_price"),
        F.coalesce(F.col("l_tax").cast("decimal(8,4)"), F.lit(0).cast("decimal(8,4)"))
        .cast("double")
        .alias("tax_filled"),
    ).orderBy("l_orderkey", "l_linenumber")


# --- C5: SHA-256 change-detection fingerprint (ref: proc_load_silver.sql:63-71)

_HASH_SQL = f"""
SELECT c_custkey,
       {sql_row_hash('c_name', 'c_nationkey', 'c_mktsegment')} AS row_fingerprint
FROM customer
ORDER BY c_custkey
"""


@query("etl_hash_fingerprint", oracle=_HASH_SQL)
def etl_hash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHA-256 over pipe-concatenated business columns — the SCD change
    detector dwh_hash_full (ref: scripts/silver/proc_load_silver.sql:63-71, C5)."""
    customer = _t(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        row_hash("c_name", "c_nationkey", "c_mktsegment").alias("row_fingerprint"),
    ).orderBy("c_custkey")


# --- P3/C4: watermark delta filter (ref: proc_load_silver.sql:242) ----------

_WM_SQL = """
SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS o_orderdate,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
FROM orders
WHERE o_orderdate > TIMESTAMP '1998-06-01 00:00:00'
ORDER BY o_orderkey
"""


@query("etl_watermark_delta_filter", oracle=_WM_SQL)
def etl_watermark_delta_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental delta filter past a watermark — pushed to the parquet scan
    (ref: scripts/silver/proc_load_silver.sql:242, C1/C4/P3)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderdate") > F.lit("1998-06-01 00:00:00").cast("timestamp"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("o_totalprice"),
        )
        .orderBy("o_orderkey")
    )


# --- P5: DISTINCT projection (ref: 02_dimensions_exploration.sql) -----------

_DISTINCT_SQL = """
SELECT DISTINCT c_mktsegment AS segment FROM customer ORDER BY segment
"""


@query("etl_distinct_projection", oracle=_DISTINCT_SQL)
def etl_distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT domain inspection (ref: tests/quality_checks_silver.sql:40-42, P5)."""
    return (
        _t(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("segment"))
        .distinct()
        .orderBy("segment")
    )


# --- J3: expression-key join (ref: proc_load_gold.sql:163-165) --------------

_EXPR_JOIN_SQL = """
SELECT n.n_name AS nation_name, COUNT(*) AS n_suppliers
FROM supplier s
LEFT JOIN nation n ON CAST(s.s_nationkey AS BIGINT) = CAST(n.n_nationkey AS BIGINT)
GROUP BY n.n_name
ORDER BY nation_name
"""


@query("etl_expression_key_join", oracle=_EXPR_JOIN_SQL)
def etl_expression_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join on CAST-expression keys — the gold fact↔dim lookup uses cast and
    substring keys (ref: scripts/gold/proc_load_gold.sql:163-165, J3)."""
    supplier = _t(spark, sf_dir, "supplier")
    nation = tpch.dim(spark, sf_dir, "nation")
    return (
        supplier.join(
            nation,
            supplier.s_nationkey.cast("bigint") == nation.n_nationkey.cast("bigint"),
            "left",
        )
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
        .orderBy("nation_name")
    )


# --- A6: HAVING post-aggregation filter (ref: quality_checks_silver.sql:25-30)

_HAVING_SQL = """
SELECT o_custkey, COUNT(*) AS n_orders
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) > 25
ORDER BY o_custkey
"""


@query("etl_having_filter", oracle=_HAVING_SQL)
def etl_having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING-style post-aggregation filter, the duplicate-detection shape
    (ref: tests/quality_checks_silver.sql:25-30, A6)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 25)
        .orderBy("o_custkey")
    )
