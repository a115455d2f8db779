"""Skew/bucketing operator tests: salting preserves join semantics, bucketed
tables join without a shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sql_data_warehouse_and_analytics_project_spark.operators import skew
from sql_data_warehouse_and_analytics_project_spark.plans import audit
from sql_data_warehouse_and_analytics_project_spark.sources import tpch

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted([tuple(r) for r in df.collect()], key=repr)


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_plain_join(spark, how):
    orders = tpch.load(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    customer = tpch.load(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = orders.join(customer, "o_custkey", how)
    salted = skew.salted_join(orders, customer, "o_custkey", how, n_salts=7)
    assert _rows(salted) == _rows(plain)


def test_salted_join_left_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (99, "x")], "k int, v string")
    right = spark.createDataFrame([(1, "A"), (2, "B")], "k int, w string")
    got = skew.salted_join(left, right, "k", "left", n_salts=4)
    assert got.count() == 3
    assert got.filter("k = 99").first()["w"] is None


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{tmp_path}'")
    try:
        orders = tpch.load(spark, SF_DIR, "orders").select("o_custkey", "o_totalprice")
        customer = tpch.load(spark, SF_DIR, "customer").select(
            F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
        )
        skew.write_bucketed(orders, "bucketdb.orders_b", "o_custkey", n_buckets=8)
        skew.write_bucketed(customer, "bucketdb.customer_b", "o_custkey", n_buckets=8)
        joined = skew.co_located_join(spark, "bucketdb.orders_b", "bucketdb.customer_b", "o_custkey")
        plan = audit.executed_plan(joined)
        assert "SortMergeJoin" in plan
        assert audit.data_shuffle_count(plan) == 0, plan
        # and it still computes the right thing
        assert joined.count() == orders.join(customer, "o_custkey").count()
    finally:
        spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")
