"""PySpark-native analytics engine with the capabilities of the reference
SQL-Data-Warehouse-and-Analytics-Project (a T-SQL Medallion DWH, see SURVEY.md).

Everything here is a from-scratch, Spark-first design:

- ``session``    — pinned SparkSession builder (timezone, AQE, shuffle sizing)
- ``tsql``       — T-SQL-semantics helpers (boundary-count DATEDIFF, MONEY
                   decimal arithmetic, yyyymmdd parsing, row hashing)
- ``sources``    — parquet/CSV readers with explicit schemas
- ``analytics``  — the 13 reference analytics queries re-expressed over the
                   TPC-H-ish star schema (each with a DuckDB oracle)
- ``operators``  — ETL + LLM-data-pipeline operators (dedup, similarity,
                   text analysis, multimodal plumbing)
- ``warehouse``  — the Medallion ETL engine (bronze/silver/gold, SCD1/SCD2,
                   watermark incremental loads, audit/DQ logging, security views)
- ``streaming``  — Structured Streaming over the events table
- ``plans``      — plan-hygiene helpers (pushdown/broadcast assertions)
"""

__version__ = "0.1.0"
