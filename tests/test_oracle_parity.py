"""Every registered query with an oracle must hash-match DuckDB — the local
replica of the driver's t2 correctness gate.

r19 tiering (VERDICT r18 ask #1): the full 209-key replay is ~7 minutes and
belongs to the slow tier. The DEFAULT tier keeps a deterministic parity
SAMPLE — every bench headliner plus a fixed ~25% crc32 spread of the rest —
so a broken operator family still fails fast; the driver's own t2 gate
replays the full 50-key window independently, and `-m slow` (or `-m ""`)
runs the complete replay."""

from __future__ import annotations

import zlib

import pytest

from sql_data_warehouse_and_analytics_project_spark.registry import all_queries

_QS = all_queries()
ORACLE_QUERIES = sorted(n for n, rq in _QS.items() if rq.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, rq in _QS.items() if rq.oracle is None)


def _sampled(name: str) -> bool:
    return _QS[name].headline or zlib.crc32(name.encode()) % 4 == 0


_PARAMS = [
    n if _sampled(n) else pytest.param(n, marks=pytest.mark.slow)
    for n in ORACLE_QUERIES
]


@pytest.mark.parametrize("name", _PARAMS)
def test_query_matches_oracle(spark, duck, name):
    from conftest import assert_query_matches_oracle

    assert_query_matches_oracle(spark, duck, name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, name):
    from conftest import SF_DIR

    rq = all_queries()[name]
    df = rq.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_oracle_keys_subset_of_queries():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0
