"""Public scalar-function library (SURVEY §2.8).

Single import point for the engine's cross-dialect scalar semantics. The
reference's T-SQL surface maps onto Spark builtins almost 1:1 (TRIM/UPPER/
CONCAT/SUBSTRING/ABS/ROUND/YEAR/DATETRUNC…, SURVEY §2.8); the handful that
do NOT are implemented in :mod:`..tsql` and re-exported here:

- ``datediff_month`` / ``datediff_year`` — boundary-count DATEDIFF
  (ref: scripts/Data Analytics/03_date_range_exploration.sql:18-26)
- ``yyyymmdd_to_date`` — guarded INT-date parse
  (ref: scripts/silver/proc_load_silver.sql:234-236)
- ``row_hash`` — SHA-256 change-detection fingerprint
  (ref: scripts/silver/proc_load_silver.sql:63-71)
- ``money`` / ``rate`` — exact decimal casts for MONEY arithmetic
  (ref: scripts/bronze/ddl_bronze.sql:53-55)

Each has an ``sql_*`` twin emitting the equivalent ANSI-SQL text for oracle
queries where applicable.
"""

from ..tsql import (
    MONEY,
    RATE,
    datediff_month,
    datediff_year,
    money,
    rate,
    row_hash,
    sql_datediff_month,
    sql_datediff_year,
    sql_row_hash,
    yyyymmdd_to_date,
)

__all__ = [
    "MONEY",
    "RATE",
    "datediff_month",
    "datediff_year",
    "money",
    "rate",
    "row_hash",
    "sql_datediff_month",
    "sql_datediff_year",
    "sql_row_hash",
    "yyyymmdd_to_date",
]
