"""T-SQL-semantics helpers (SURVEY.md §2.8, §7.4 hard parts).

The reference engine is T-SQL; a handful of its scalar semantics do NOT map
1:1 onto Spark builtins and are centralized here:

- ``DATEDIFF(month/year, a, b)`` counts *crossed calendar boundaries*
  (ref: scripts/Data Analytics/03_date_range_exploration.sql:18-26), not
  fractional months like Spark's ``months_between``.
- ``MONEY`` is a 4-dp fixed decimal (ref: scripts/bronze/ddl_bronze.sql:53-55);
  all money aggregation here goes through decimal so sums are EXACT and
  order-independent — double summation over a shuffled dataset is
  nondeterministic in the last ulp, which breaks cross-engine value-hash
  comparison and silently drifts at 100 TB scale.
- int ``yyyymmdd`` dates with 0/yyyy-length garbage → NULL
  (ref: scripts/silver/proc_load_silver.sql:234-236).
- SHA-256 row fingerprint over pipe-concatenated columns
  (ref: scripts/silver/proc_load_silver.sql:63-71).

Each helper has a Spark Column form and (where needed by oracles) an ANSI-SQL
text form usable by DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Decimal types used for exact money arithmetic. 18,2 holds 100 TB-scale
# per-group sums (1e16 dollars) without overflow while keeping multiply
# results within Spark's 38-digit decimal cap.
MONEY = "decimal(18,2)"
RATE = "decimal(8,4)"


def money(col: Column | str) -> Column:
    """Cast to exact money decimal (T-SQL MONEY analog)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def rate(col: Column | str) -> Column:
    """Cast a small ratio column (discount/tax) to exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(RATE)


def datediff_month(start: Column | str, end: Column | str) -> Column:
    """T-SQL DATEDIFF(MONTH, start, end): calendar boundaries crossed.

    (YEAR(end)-YEAR(start))*12 + (MONTH(end)-MONTH(start)) — e.g.
    Jan-31 → Feb-01 is 1 month even though only one day elapsed.
    """
    s = F.col(start) if isinstance(start, str) else start
    e = F.col(end) if isinstance(end, str) else end
    return ((F.year(e) - F.year(s)) * 12 + (F.month(e) - F.month(s))).cast("bigint")


def datediff_year(start: Column | str, end: Column | str) -> Column:
    """T-SQL DATEDIFF(YEAR, start, end): year boundaries crossed."""
    s = F.col(start) if isinstance(start, str) else start
    e = F.col(end) if isinstance(end, str) else end
    return (F.year(e) - F.year(s)).cast("bigint")


def sql_datediff_month(start: str, end: str) -> str:
    """ANSI/DuckDB text form of :func:`datediff_month`."""
    return f"(CAST((YEAR({end}) - YEAR({start})) * 12 + (MONTH({end}) - MONTH({start})) AS BIGINT))"


def sql_datediff_year(start: str, end: str) -> str:
    return f"(CAST(YEAR({end}) - YEAR({start}) AS BIGINT))"


def yyyymmdd_to_date(col: Column | str) -> Column:
    """INT yyyymmdd → DATE, NULL when 0, not 8 digits, or not a real date.

    Mirrors the silver sales-date repair
    (ref: scripts/silver/proc_load_silver.sql:234-236). try_to_date, not
    to_date: under ANSI mode an 8-digit-but-impossible value (10000132)
    makes to_date THROW — one malformed row would fail an entire ingest at
    scale, where the whole point of this guard is row-level repair.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("string")
    return F.when((c.isNull()) | (c == 0) | (F.length(s) != 8), F.lit(None).cast("date")).otherwise(
        F.try_to_date(s, "yyyyMMdd")
    )


def row_hash(*cols: Column | str) -> Column:
    """SHA-256 change-detection fingerprint over pipe-joined columns.

    Mirrors HASHBYTES('SHA2_256', CONCAT(col,'|',col,...))
    (ref: scripts/silver/proc_load_silver.sql:63-71). NULLs are normalized
    to '' with an explicit per-column coalesce — NOT bare concat_ws, which
    *skips* null elements and so drops their separator slot, colliding
    ('a|b', NULL) with ('a', 'b'). T-SQL CONCAT keeps the slot (NULL→'').
    Returns lowercase hex, same as DuckDB's sha256().
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.sha2(
        F.concat_ws("|", *[F.coalesce(c.cast("string"), F.lit("")) for c in cs]), 256
    )


def sql_row_hash(*cols: str) -> str:
    """DuckDB text form of :func:`row_hash` (same NULL-slot preservation)."""
    joined = ", ".join(f"COALESCE(CAST({c} AS VARCHAR), '')" for c in cols)
    return f"sha256(concat_ws('|', {joined}))"
