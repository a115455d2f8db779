"""The reference's 17 standalone data-quality checks, "Expectation: No Results".

Ports tests/quality_checks_silver.sql (12 checks) and
tests/quality_checks_gold.sql (5 checks) as functions returning the
*violation rows* — an empty DataFrame means the check passes. Each docstring
cites the source check. These run post-load (EP ad-hoc), complementing the
inline DQ logging the loaders do (C8).

All checks are narrow scans + small aggregations; at 100 TB each is a single
pushed-filter pass over one table (or a broadcast-join probe for RI), never a
fact-fact shuffle.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .audit import RunContext

# ------------------------------------------------------------- silver (12)


def silver_cust_pk_null_or_dup(ctx: RunContext) -> DataFrame:
    """quality_checks_silver.sql:25-30 — PK nulls/duplicates in crm_cust_info."""
    t = ctx.catalog.read("silver.crm_cust_info")
    dups = t.groupBy("cst_id").count().filter("count > 1 OR cst_id IS NULL")
    return dups


def silver_cust_untrimmed(ctx: RunContext) -> DataFrame:
    """quality_checks_silver.sql:34-37 — unwanted spaces in cst_key."""
    t = ctx.catalog.read("silver.crm_cust_info")
    return t.filter(F.col("cst_key") != F.trim("cst_key"))


def silver_cust_marital_domain(ctx: RunContext) -> DataFrame:
    """quality_checks_silver.sql:40-42 — standardized marital status domain."""
    t = ctx.catalog.read("silver.crm_cust_info")
    return t.select("cst_marital_status").distinct().filter(
        ~F.col("cst_marital_status").isin("Married", "Single", "n/a")
    )


def silver_prd_pk_null_or_dup(ctx: RunContext) -> DataFrame:
    """quality_checks_silver.sql:49-54 — PK nulls/dups among *current* products
    (SCD2 keeps history, so uniqueness holds on is_current=1)."""
    t = ctx.catalog.read("silver.crm_prd_info").filter(F.col("is_current") == 1)
    return t.groupBy("prd_id").count().filter("count > 1 OR prd_id IS NULL")


def silver_prd_untrimmed(ctx: RunContext) -> DataFrame:
    """quality_checks_silver.sql:58-61 — unwanted spaces in prd_nm."""
    t = ctx.catalog.read("silver.crm_prd_info")
    return t.filter(F.col("prd_nm") != F.trim("prd_nm"))


def silver_prd_cost_invalid(ctx: RunContext) -> DataFrame:
    """quality_checks_silver.sql:65-68 — NULL or negative product cost."""
    t = ctx.catalog.read("silver.crm_prd_info")
    return t.filter(F.col("prd_cost").isNull() | (F.col("prd_cost") < 0))


def silver_prd_line_domain(ctx: RunContext) -> DataFrame:
    """quality_checks_silver.sql:70-73 — standardized product line domain."""
    t = ctx.catalog.read("silver.crm_prd_info")
    return t.select("prd_line").distinct().filter(
        ~F.col("prd_line").isin("Mountain", "Road", "Other Sales", "Touring", "n/a")
    )


def silver_prd_version_order_invalid(ctx: RunContext) -> DataFrame:
    """quality_checks_silver.sql:75-80 — SCD2 expiry before effective date."""
    t = ctx.catalog.read("silver.crm_prd_info")
    return t.filter(F.col("expiry_date") < F.col("effective_date"))


def silver_sales_date_order_invalid(ctx: RunContext) -> DataFrame:
    """quality_checks_silver.sql:97-101 — order date after ship/due date."""
    t = ctx.catalog.read("silver.crm_sales_details")
    return t.filter(
        (F.col("sls_order_dt") > F.col("sls_ship_dt")) | (F.col("sls_order_dt") > F.col("sls_due_dt"))
    )


def silver_sales_consistency(ctx: RunContext) -> DataFrame:
    """quality_checks_silver.sql:105-117 — sales = quantity × price, all > 0."""
    t = ctx.catalog.read("silver.crm_sales_details")
    return t.filter(
        (F.col("sls_sales") != F.col("sls_quantity") * F.col("sls_price"))
        | F.col("sls_sales").isNull()
        | F.col("sls_quantity").isNull()
        | F.col("sls_price").isNull()
        | (F.col("sls_sales") <= 0)
        | (F.col("sls_quantity") <= 0)
        | (F.col("sls_price") <= 0)
    )


def silver_birthdate_range(ctx: RunContext, today: dt.date | None = None) -> DataFrame:
    """quality_checks_silver.sql:124-128 — birthdate within 1924-01-01..today.

    The intended-semantics ERP load already nulls future birthdates; pre-1924
    rows remain (the reference flags but does not repair them) — callers
    assert only the future-date half after a cleaned load.
    """
    t = ctx.catalog.read("silver.erp_cust_az12")
    today = today or dt.date.today()
    return t.filter((F.col("bdate") < F.lit(dt.date(1924, 1, 1))) | (F.col("bdate") > F.lit(today)))


def silver_gender_domain(ctx: RunContext) -> DataFrame:
    """quality_checks_silver.sql:131-133 — standardized gender domain."""
    t = ctx.catalog.read("silver.erp_cust_az12")
    return t.select("gen").distinct().filter(~F.col("gen").isin("Female", "Male", "n/a"))


def silver_country_domain(ctx: RunContext) -> DataFrame:
    """quality_checks_silver.sql:139-142 — standardized country names
    (no raw codes/blanks after the intended ERP normalization)."""
    t = ctx.catalog.read("silver.erp_loc_a101")
    return t.select("cntry").distinct().filter(
        F.col("cntry").isin("US", "USA", "DE", "", " ") | F.col("cntry").isNull()
    )


def silver_category_untrimmed(ctx: RunContext) -> DataFrame:
    """quality_checks_silver.sql:149-154 — unwanted spaces in category cols."""
    t = ctx.catalog.read("silver.erp_px_cat_g1v2")
    return t.filter(
        (F.col("cat") != F.trim("cat"))
        | (F.col("subcat") != F.trim("subcat"))
        | (F.col("maintenance") != F.trim("maintenance"))
    )


# --------------------------------------------------------------- gold (5)


def gold_dim_customers_key_unique(ctx: RunContext) -> DataFrame:
    """quality_checks_gold.sql:22-27 — customer_key uniqueness."""
    t = ctx.catalog.read("gold.dim_customers")
    return t.groupBy("customer_key").count().filter("count > 1")


def gold_dim_products_key_unique(ctx: RunContext) -> DataFrame:
    """quality_checks_gold.sql:34-39 — product_key uniqueness."""
    t = ctx.catalog.read("gold.dim_products")
    return t.groupBy("product_key").count().filter("count > 1")


def gold_fact_orphans(ctx: RunContext) -> DataFrame:
    """quality_checks_gold.sql:45-51 — fact rows whose dim joins found no
    match. The -1 unknown member IS the match for deliberately-bad keys, so
    true orphans = keys that are neither -1 nor present in the dim."""
    cat = ctx.catalog
    f = cat.read("gold.fact_sales")
    dc = cat.read("gold.dim_customers").select("customer_key")
    dp = cat.read("gold.dim_products").select("product_key")
    return (
        f.join(F.broadcast(dc), "customer_key", "left_anti")
        .unionByName(f.join(F.broadcast(dp), "product_key", "left_anti"))
    )


SILVER_CHECKS = [
    silver_cust_pk_null_or_dup,
    silver_cust_untrimmed,
    silver_cust_marital_domain,
    silver_prd_pk_null_or_dup,
    silver_prd_untrimmed,
    silver_prd_cost_invalid,
    silver_prd_line_domain,
    silver_prd_version_order_invalid,
    silver_sales_date_order_invalid,
    silver_sales_consistency,
    silver_gender_domain,
    silver_country_domain,
    silver_category_untrimmed,
]

GOLD_CHECKS = [
    gold_dim_customers_key_unique,
    gold_dim_products_key_unique,
    gold_fact_orphans,
]
