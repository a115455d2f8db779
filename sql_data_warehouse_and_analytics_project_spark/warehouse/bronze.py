"""Bronze layer: raw CSV landing (operators S1, S2; SURVEY §2.1).

Mirrors ``bronze.load_bronze`` (ref: scripts/bronze/proc_load_bronze.sql:32-142):
TRUNCATE + BULK INSERT per table with header skip, comma delimiter, explicit
DDL schema, plus a per-table audit row. Spark form: schema-pinned
``spark.read.csv`` → parquet overwrite. TABLOCK/minimal-logging has no analog —
a distributed parquet write is already parallel and atomic-by-swap.

Scale note (100 TB): the CSV read parallelizes by file split; bronze lands
unmodified bytes (no shuffle, narrow-only plan). Schema is enforced at read
(PERMISSIVE nulls on malformed cells, matching BULK INSERT's untyped landing).
"""

from __future__ import annotations

import os

from .audit import RunContext
from .schemas import BRONZE_CSV_FILES, BRONZE_SCHEMAS


def load_bronze(ctx: RunContext, csv_dir: str) -> dict[str, int]:
    """Land the six source CSVs as bronze parquet tables.

    Returns table → row count (the reference PRINTs and audit-logs
    @@ROWCOUNT per table, ref: proc_load_bronze.sql:43-48).
    """
    counts: dict[str, int] = {}
    for table, fname in BRONZE_CSV_FILES.items():
        path = os.path.join(csv_dir, fname)
        df = (
            ctx.catalog.spark.read.option("header", True)
            .schema(BRONZE_SCHEMAS[table])
            .csv(path)
        )
        name = f"bronze.{table}"
        n = ctx.catalog.overwrite(name, df)
        counts[name] = n
        ctx.log(name, n)
    return counts
