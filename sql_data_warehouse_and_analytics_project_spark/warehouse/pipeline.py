"""Master ETL orchestration (EP1, C6; SURVEY §3).

Re-expresses ``init.load_all`` (ref: scripts/init_load_all.sql:18-113):
reserve a batch id, hard-stop if the metadata config is empty (THROW 50001,
ref :43-47), run bronze → silver → gold in order, finalize the master log
row Success/Failed. Each phase logs per-table rows and DQ issues through the
shared RunContext; a phase exception is recorded to audit.etl_log before
re-raising (the CATCH-block pattern at ref :100-107).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import SparkSession

from .audit import RunContext
from .bronze import load_bronze
from .catalog import Catalog
from .gold import load_gold
from .silver import load_silver


class ConfigValidationError(RuntimeError):
    """No active rows in audit.etl_config (THROW 50001 analog)."""


def run_pipeline(
    spark: SparkSession,
    warehouse_root: str,
    csv_dir: str,
    as_of: dt.datetime,
    surrogate_mode: str = "parity",
) -> RunContext:
    """One full Medallion run; returns the context (batch id, audit handle)."""
    ctx = RunContext(catalog=Catalog(spark, warehouse_root), as_of=as_of)
    ctx.init_audit_tables()
    ctx.new_batch()
    try:
        if not ctx.etl_config_rows():
            raise ConfigValidationError(
                "ETL Configuration is empty. Halting execution."  # ref :45
            )
        load_bronze(ctx, csv_dir)
        load_silver(ctx)
        load_gold(ctx, surrogate_mode=surrogate_mode)
    except Exception as exc:  # noqa: BLE001 — mirror the audit-then-fail CATCH
        ctx.log("MASTER_PIPELINE", 0, status="Failed", error=str(exc))
        raise
    else:
        ctx.log("MASTER_PIPELINE", 0, status="Success")
    finally:
        ctx.flush_audit()  # buffered rows land in two appends per run
    return ctx
