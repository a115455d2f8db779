"""Column-statistics profiler — the ANALYZE TABLE analog.

Catalog statistics are what a real engine's CBO runs on (row counts,
null fractions, NDV, value bounds) and what a data-quality dashboard
watches. One pass over the table computes every column's stats as one
wide aggregate row (a single scan, all partial-aggregating), then
unpivots to one row per column.

Cross-engine discipline: NDV is the EXACT distinct count (the approx
variant belongs to ``approx.py``'s sketch family); every bound is a
NON-NULL string under a kind-specific explicit format — numerics via
the DOUBLE → DECIMAL(18,6) → string cast chain (ADVICE r11: printf
'%.6f' rounds decimal ties HALF_UP in Java but half-to-even in C, so
an exact dyadic like 0.0078125 would format as '0.007813' vs
'0.007812'; the decimal cast rounds half-away-from-zero in BOTH
engines — verified empirically — and decimal→string prints the full
6-digit scale with no double round-trip), timestamps via a shared
strftime format, strings raw (bytewise-identical collation). No NULL cells
anywhere in the output: the driver hashes the Spark result via Arrow
(NULL → None) but the oracle via pandas (NULL double → NaN), so a
nullable double column can never hash-match. No reference counterpart as a query — the reference's
INFORMATION_SCHEMA exploration (S8/Q01) reads catalog metadata; this
computes the data-derived statistics beneath it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch

# column → kind for the registered orders profile
_ORDERS_SPEC = {
    "o_orderkey": "num",
    "o_custkey": "num",
    "o_orderstatus": "str",
    "o_totalprice": "num",
    "o_orderdate": "ts",
    "o_orderpriority": "str",
}

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def profile_columns(df: DataFrame, spec: dict[str, str]) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, min_val, max_val) per
    column of ``spec`` (kind: 'num' | 'str' | 'ts'), ordered by column
    name. One scan; bounds are non-null strings under the kind's
    explicit format."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for c, kind in spec.items():
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("bigint").alias(f"nn_{c}")
        )
        aggs.append(F.countDistinct(c).cast("bigint").alias(f"nd_{c}"))
        if kind == "num":
            dec = "decimal(18,6)"
            aggs.append(F.min(c).cast("double").cast(dec).cast("string").alias(f"lo_{c}"))
            aggs.append(F.max(c).cast("double").cast(dec).cast("string").alias(f"hi_{c}"))
        elif kind == "ts":
            aggs.append(F.date_format(F.min(c), _TS_FMT_SPARK).alias(f"lo_{c}"))
            aggs.append(F.date_format(F.max(c), _TS_FMT_SPARK).alias(f"hi_{c}"))
        else:
            aggs.append(F.min(c).alias(f"lo_{c}"))
            aggs.append(F.max(c).alias(f"hi_{c}"))
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"nn_{c}").alias("n_nulls"),
                F.col(f"nd_{c}").alias("n_distinct"),
                F.col(f"lo_{c}").alias("min_val"),
                F.col(f"hi_{c}").alias("max_val"),
            )
            for c in spec
        ]
    )
    return (
        wide.select("n_rows", F.explode(rows).alias("s"))
        .select(
            F.col("s.col_name").alias("col_name"),
            "n_rows",
            F.col("s.n_nulls").alias("n_nulls"),
            F.col("s.n_distinct").alias("n_distinct"),
            F.col("s.min_val").alias("min_val"),
            F.col("s.max_val").alias("max_val"),
        )
        .orderBy("col_name")
    )


def _profile_sql(table: str, spec: dict[str, str]) -> str:
    selects = []
    for c, kind in spec.items():
        if kind == "num":
            lo = f"CAST(CAST(CAST(MIN({c}) AS DOUBLE) AS DECIMAL(18,6)) AS VARCHAR)"
            hi = f"CAST(CAST(CAST(MAX({c}) AS DOUBLE) AS DECIMAL(18,6)) AS VARCHAR)"
        elif kind == "ts":
            lo = f"strftime(MIN({c}), '{_TS_FMT_DUCK}')"
            hi = f"strftime(MAX({c}), '{_TS_FMT_DUCK}')"
        else:
            lo, hi = f"MIN({c})", f"MAX({c})"
        selects.append(
            f"""SELECT '{c}' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       {lo} AS min_val, {hi} AS max_val
FROM {table}"""
        )
    return "\nUNION ALL\n".join(selects) + "\nORDER BY col_name"


_ORDERS_PROFILE_SQL = _profile_sql("orders", _ORDERS_SPEC)


@query("warehouse_column_stats", oracle=_ORDERS_PROFILE_SQL, defer=True)
def warehouse_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics for the orders table: null count,
    exact NDV, and typed value bounds per column — one scan."""
    return profile_columns(tpch.load(spark, sf_dir, "orders"), _ORDERS_SPEC)
