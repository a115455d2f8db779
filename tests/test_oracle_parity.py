"""Every registered query with an oracle must hash-match DuckDB — the local
replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from sql_data_warehouse_and_analytics_project_spark.registry import all_queries

ORACLE_QUERIES = sorted(n for n, rq in all_queries().items() if rq.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, rq in all_queries().items() if rq.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
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
