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

# ---------------------------------------------------------------------------
# Composite registrations: the 11 ETL operator probes above stay importable,
# but register as 4 union-tagged suites so each gets a driver CORRECTNESS
# row within the driver's 50-query cap (VERDICT r01 action #2). Every leg
# keeps its own plan; the union concatenates results without extra shuffles.
# ---------------------------------------------------------------------------

_WINDOW_KEYS_SQL = f"""
SELECT 'dedup_keep_latest' AS leg, CAST(o_custkey AS BIGINT) AS k1,
       CAST(latest_orderkey AS BIGINT) AS k2, CAST(NULL AS VARCHAR) AS name,
       latest_orderdate AS dt
FROM ({_DEDUP_SQL})
UNION ALL
SELECT 'surrogate_keys', nation_sk, CAST(n_nationkey AS BIGINT), n_name,
       CAST(NULL AS DATE)
FROM ({_SK_SQL})
ORDER BY leg, k1
"""


@query("etl_window_keys", oracle=_WINDOW_KEYS_SQL, defer=True)
def etl_window_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 keep-latest dedup + W2 surrogate keys, union-tagged."""
    dedup = etl_dedup_keep_latest(spark, sf_dir).select(
        F.lit("dedup_keep_latest").alias("leg"),
        F.col("o_custkey").cast("bigint").alias("k1"),
        F.col("latest_orderkey").cast("bigint").alias("k2"),
        F.lit(None).cast("string").alias("name"),
        F.col("latest_orderdate").alias("dt"),
    )
    sk = etl_surrogate_keys(spark, sf_dir).select(
        F.lit("surrogate_keys").alias("leg"),
        F.col("nation_sk").alias("k1"),
        F.col("n_nationkey").cast("bigint").alias("k2"),
        F.col("n_name").alias("name"),
        F.lit(None).cast("date").alias("dt"),
    )
    return dedup.unionByName(sk).orderBy("leg", "k1")


_JOIN_SUITE_SQL = f"""
SELECT 'anti' AS leg, CAST(c_custkey AS BIGINT) AS k, c_name AS name,
       CAST(NULL AS BIGINT) AS cnt
FROM ({_ANTI_SQL})
UNION ALL
SELECT 'semi', CAST(c_custkey AS BIGINT), c_name, CAST(NULL AS BIGINT)
FROM ({_SEMI_SQL})
UNION ALL
SELECT 'expression_key', CAST(NULL AS BIGINT), nation_name, n_suppliers
FROM ({_EXPR_JOIN_SQL})
ORDER BY leg, k, name
"""


@query("etl_join_suite", oracle=_JOIN_SUITE_SQL, defer=True)
def etl_join_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 anti join + J4 semi join + J3 expression-key join, union-tagged."""
    _nl = F.lit(None).cast("bigint")
    anti = etl_anti_join_customers_no_orders(spark, sf_dir).select(
        F.lit("anti").alias("leg"),
        F.col("c_custkey").cast("bigint").alias("k"),
        F.col("c_name").alias("name"),
        _nl.alias("cnt"),
    )
    semi = etl_semi_join_recent_customers(spark, sf_dir).select(
        F.lit("semi").alias("leg"),
        F.col("c_custkey").cast("bigint").alias("k"),
        F.col("c_name").alias("name"),
        _nl.alias("cnt"),
    )
    expr = etl_expression_key_join(spark, sf_dir).select(
        F.lit("expression_key").alias("leg"),
        _nl.alias("k"),
        F.col("nation_name").alias("name"),
        F.col("n_suppliers").alias("cnt"),
    )
    return anti.unionByName(semi).unionByName(expr).orderBy("leg", "k", "name")


_SCALAR_SUITE_SQL = f"""
SELECT 'case_decode' AS leg, CAST(NULL AS BIGINT) AS k1, CAST(NULL AS BIGINT) AS k2,
       order_status AS label, CAST(NULL AS DOUBLE) AS x1, CAST(NULL AS DOUBLE) AS x2,
       n_orders AS cnt
FROM ({_DECODE_SQL})
UNION ALL
SELECT 'null_repair', CAST(l_orderkey AS BIGINT), CAST(l_linenumber AS BIGINT),
       CAST(NULL AS VARCHAR), repaired_price, tax_filled, CAST(NULL AS BIGINT)
FROM ({_REPAIR_SQL})
UNION ALL
SELECT 'hash_fingerprint', CAST(c_custkey AS BIGINT), CAST(NULL AS BIGINT),
       row_fingerprint, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT)
FROM ({_HASH_SQL})
ORDER BY leg, k1, k2, label
"""


@query("etl_scalar_suite", oracle=_SCALAR_SUITE_SQL, defer=True)
def etl_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 CASE decode + P7/A8 NULL-repair arithmetic + C5 SHA-256
    change-detection fingerprint, union-tagged."""
    _nl = F.lit(None).cast("bigint")
    _nd = F.lit(None).cast("double")
    _ns = F.lit(None).cast("string")
    decode = etl_case_decode_status(spark, sf_dir).select(
        F.lit("case_decode").alias("leg"),
        _nl.alias("k1"),
        _nl.alias("k2"),
        F.col("order_status").alias("label"),
        _nd.alias("x1"),
        _nd.alias("x2"),
        F.col("n_orders").alias("cnt"),
    )
    repair = etl_null_repair_expressions(spark, sf_dir).select(
        F.lit("null_repair").alias("leg"),
        F.col("l_orderkey").cast("bigint").alias("k1"),
        F.col("l_linenumber").cast("bigint").alias("k2"),
        _ns.alias("label"),
        F.col("repaired_price").alias("x1"),
        F.col("tax_filled").alias("x2"),
        _nl.alias("cnt"),
    )
    hashed = etl_hash_fingerprint(spark, sf_dir).select(
        F.lit("hash_fingerprint").alias("leg"),
        F.col("c_custkey").cast("bigint").alias("k1"),
        _nl.alias("k2"),
        F.col("row_fingerprint").alias("label"),
        _nd.alias("x1"),
        _nd.alias("x2"),
        _nl.alias("cnt"),
    )
    return decode.unionByName(repair).unionByName(hashed).orderBy("leg", "k1", "k2", "label")


_FILTER_SUITE_SQL = f"""
SELECT 'watermark_delta' AS leg, CAST(o_orderkey AS BIGINT) AS k1,
       CAST(o_custkey AS BIGINT) AS k2, CAST(NULL AS VARCHAR) AS label,
       o_orderdate AS dt, o_totalprice AS x1, CAST(NULL AS BIGINT) AS cnt
FROM ({_WM_SQL})
UNION ALL
SELECT 'distinct_projection', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
       segment, CAST(NULL AS DATE), CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT)
FROM ({_DISTINCT_SQL})
UNION ALL
SELECT 'having', CAST(o_custkey AS BIGINT), CAST(NULL AS BIGINT),
       CAST(NULL AS VARCHAR), CAST(NULL AS DATE), CAST(NULL AS DOUBLE), n_orders
FROM ({_HAVING_SQL})
ORDER BY leg, k1, label
"""


@query("etl_filter_suite", oracle=_FILTER_SUITE_SQL, defer=True)
def etl_filter_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/C4 watermark delta filter + P5 DISTINCT projection + A6 HAVING,
    union-tagged."""
    _nl = F.lit(None).cast("bigint")
    _nd = F.lit(None).cast("double")
    _ns = F.lit(None).cast("string")
    _ndt = F.lit(None).cast("date")
    wm = etl_watermark_delta_filter(spark, sf_dir).select(
        F.lit("watermark_delta").alias("leg"),
        F.col("o_orderkey").cast("bigint").alias("k1"),
        F.col("o_custkey").cast("bigint").alias("k2"),
        _ns.alias("label"),
        F.col("o_orderdate").alias("dt"),
        F.col("o_totalprice").alias("x1"),
        _nl.alias("cnt"),
    )
    dist = etl_distinct_projection(spark, sf_dir).select(
        F.lit("distinct_projection").alias("leg"),
        _nl.alias("k1"),
        _nl.alias("k2"),
        F.col("segment").alias("label"),
        _ndt.alias("dt"),
        _nd.alias("x1"),
        _nl.alias("cnt"),
    )
    having = etl_having_filter(spark, sf_dir).select(
        F.lit("having").alias("leg"),
        F.col("o_custkey").cast("bigint").alias("k1"),
        _nl.alias("k2"),
        _ns.alias("label"),
        _ndt.alias("dt"),
        _nd.alias("x1"),
        F.col("n_orders").alias("cnt"),
    )
    return wm.unionByName(dist).unionByName(having).orderBy("leg", "k1", "label")


# --- Snapshot diff / reconciliation ----------------------------------------
#
# Auditing an incremental load (SCD rewrite, MERGE fallback, replicated
# copy) needs the DIFF of two table versions by business key: which rows
# appeared, vanished, or changed. Scale shape: ONE null-safe full-outer
# equi-join on the key — Catalyst shuffles both sides by o_orderkey once;
# on bucketed layouts (pkg/warehouse/bucketing.py) the exchange disappears
# entirely. Row equality uses eqNullSafe / IS NOT DISTINCT FROM so NULL
# transitions (value -> NULL, NULL -> value) count as changes instead of
# vanishing into three-valued logic. The demo derives both snapshots
# deterministically from `orders` (mod-97 keys missing from the old
# snapshot = added; mod-89 prices perturbed = changed; mod-101 keys
# missing from the new snapshot = removed), so the oracle replays the
# exact construction.

_DIFF_ADD_MOD = 97   # keys absent from OLD  -> status 'added'
_DIFF_CHG_MOD = 89   # prices perturbed in OLD -> status 'changed'
_DIFF_DEL_MOD = 101  # keys absent from NEW  -> status 'removed'

_SNAPSHOT_DIFF_SQL = f"""
WITH old_snap AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % {_DIFF_CHG_MOD} = 0
              THEN o_totalprice + 10.0 ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM orders WHERE o_orderkey % {_DIFF_ADD_MOD} <> 0
),
new_snap AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % {_DIFF_DEL_MOD} <> 0
)
SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
       CASE WHEN o.o_orderkey IS NULL THEN 'added'
            WHEN n.o_orderkey IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM old_snap o FULL OUTER JOIN new_snap n ON o.o_orderkey = n.o_orderkey
WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
   OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
   OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
ORDER BY o_orderkey
"""


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, compare_cols: list[str]
) -> DataFrame:
    """(key, status): rows 'added' (new only), 'removed' (old only), or
    'changed' (present in both with any compare column null-safely
    different). Unchanged rows are dropped. One key-partitioned full-outer
    join; zero-exchange on bucketed inputs."""
    if not compare_cols:
        raise ValueError("snapshot_diff needs at least one compare column")
    o = old.select(key, *compare_cols).alias("o")
    n = new.select(key, *compare_cols).alias("n")
    changed = None
    for c in compare_cols:
        term = ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
        changed = term if changed is None else changed | term
    ok, nk = F.col(f"o.{key}"), F.col(f"n.{key}")
    return (
        o.join(n, ok == nk, "full_outer")
        .select(
            F.coalesce(ok, nk).alias(key),
            F.when(ok.isNull(), "added")
            .when(nk.isNull(), "removed")
            .otherwise("changed")
            .alias("status"),
            (ok.isNull() | nk.isNull() | changed).alias("_keep"),
        )
        .filter(F.col("_keep"))
        .drop("_keep")
        .orderBy(key)
    )


@query("etl_snapshot_diff", oracle=_SNAPSHOT_DIFF_SQL, defer=True)
def etl_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconciliation diff between two deterministic snapshots of orders:
    the added/removed/changed audit an incremental load publishes."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    old = orders.filter(F.col("o_orderkey") % _DIFF_ADD_MOD != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % _DIFF_CHG_MOD == 0, F.col("o_totalprice") + 10.0
        ).otherwise(F.col("o_totalprice")),
    )
    new = orders.filter(F.col("o_orderkey") % _DIFF_DEL_MOD != 0)
    return snapshot_diff(old, new, "o_orderkey", ["o_totalprice", "o_orderstatus"])
