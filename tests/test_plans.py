"""Physical-plan regression tests (SURVEY §4; the 100 TB design gate).

Correctness tests can't see a plan regression — a query that silently flips
a broadcast join to sort-merge, or re-reads all 16 lineitem columns for a
4-column aggregate, still returns the right rows at sf0.001. These tests pin
the plan properties that decide whether the same code survives a 1000×
scale-up."""

from __future__ import annotations

import pytest

from sql_data_warehouse_and_analytics_project_spark.plans import audit
from sql_data_warehouse_and_analytics_project_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.001"

# Queries whose joins must all be broadcast (fact × small dims).
BROADCAST_ONLY = [
    "q05_magnitude_by_nation",
    "q05_magnitude_by_segment",
    "q06_top10_customers",
    "q09_performance_yoy",
    "q11_part_to_whole_region",
    "q12_report_customers",
    "q13_report_products",
]


@pytest.mark.parametrize("name", BROADCAST_ONLY)
def test_dim_joins_broadcast(spark, name):
    df = all_queries()[name].fn(spark, SF_DIR)
    audit.assert_no_shuffle_joins(df)


def test_q05_lineitem_scan_pruned(spark):
    """The revenue-by-nation aggregate needs 4 lineitem columns; the scan
    must not read the full 16-column table."""
    df = all_queries()["q05_magnitude_by_nation"].fn(spark, SF_DIR)
    audit.assert_column_pruned(df, widest_allowed=4)


def test_q05_filters_pushed(spark):
    plan = audit.formatted_plan(all_queries()["q05_magnitude_by_nation"].fn(spark, SF_DIR))
    assert audit.pushed_filters(plan), "join-key null filters should push to scans"


def test_q08_shuffle_budget(spark):
    """Cumulative revenue: one aggregation shuffle + one global-window sort.
    More means a refactor added an unnecessary repartition."""
    df = all_queries()["q08_cumulative_revenue"].fn(spark, SF_DIR)
    assert audit.data_shuffle_count(audit.executed_plan(df)) <= 2


def test_q05_shuffle_budget(spark):
    """Aggregate + distinct-expand + final sort — at most 3 data shuffles."""
    df = all_queries()["q05_magnitude_by_nation"].fn(spark, SF_DIR)
    assert audit.data_shuffle_count(audit.executed_plan(df)) <= 3
