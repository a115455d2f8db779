"""Medallion warehouse: bronze → silver → gold ETL with audit/DQ/security.

The Spark-first re-expression of the reference's stored-procedure pipeline
(SURVEY §2.1, §2.9, §2.11, §3). Entry point: :func:`run_pipeline`.
"""

from .audit import RunContext
from .catalog import Catalog
from .pipeline import run_pipeline

__all__ = ["Catalog", "RunContext", "run_pipeline"]
