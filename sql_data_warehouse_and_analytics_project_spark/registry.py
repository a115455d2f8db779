"""Central query registry.

Every implemented operator/query registers here with an optional DuckDB
oracle; ``__spark_entry__.py`` exposes the registry to the driver.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    headline: bool = False  # include in bench.py


_REGISTRY: dict[str, RegisteredQuery] = {}


def query(name: str, oracle: str | None = None, headline: bool = False):
    """Decorator: register fn(spark, sf_dir) -> DataFrame under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = RegisteredQuery(name=name, fn=fn, oracle=oracle, headline=headline)
        return fn

    return deco


def all_queries() -> dict[str, RegisteredQuery]:
    # import side-effect modules that register queries
    from . import analytics  # noqa: F401
    from .operators import (  # noqa: F401
        analytics_extras,
        approx,
        dedup,
        etl_queries,
        multimodal,
        olap_extras,
        sampling_json,
        security_queries,
        similarity,
        skew,
        temporal,
        text,
    )
    from .streaming import batch_views  # noqa: F401

    # Oracle-backed queries first: the driver caps its correctness file at 50
    # entries in registration order, so hash-checkable queries must never be
    # displaced by rows-only ones if the registry grows (sort is stable —
    # in-module order is preserved within each group). As of r4 the registry
    # holds 53 (50 oracle-backed + 3 rows-only-by-design); the driver's
    # 50-entry window is exactly the hash-checked set, and the rows-only
    # entries past the cap (q01_database_exploration, olap_approx_summary,
    # multimodal_decode_real) stay registered for users/tests and are
    # pytest-verified — see COVERAGE.md preamble.
    return dict(sorted(_REGISTRY.items(), key=lambda kv: kv[1].oracle is None))
