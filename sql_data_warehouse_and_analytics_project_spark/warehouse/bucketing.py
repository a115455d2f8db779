"""Bucketed (co-located) joins and small-file compaction — physical-layout
maintenance the reference delegates to SQL Server's storage engine
(clustered PK indexes on the silver tables, ref:
/root/reference/scripts/silver/ddl_silver.sql — surrogate-keyed tables whose
B-trees make key lookups/joins index-colocated). Spark's equivalent
physical design is explicit: bucket the big co-joined tables on the join
key so every join on that key is EXCHANGE-FREE forever after.

Why this matters at 100 TB: lineitem⨝orders on orderkey is a fact⨝fact
join — neither side broadcasts, so every query pays a full shuffle of both
tables on every run. Bucketing both sides by the join key with the same
bucket count moves that shuffle to WRITE time, once; every subsequent join
reads pre-partitioned, pre-sorted buckets and runs SortMergeJoin with zero
Exchange and zero Sort (asserted in tests/test_plans.py). Sort elimination
additionally needs ``spark.sql.legacy.bucketedTableScan.outputOrdering=true``
— safe here because :func:`write_bucketed` guarantees the one-file-per-
bucket layout whose violation made that conf default-off in Spark 3.0.

Small-file compaction: streaming/delta appends produce files sized by
arrival cadence, not by read efficiency. At scale a table of 4 KB files is
scan-bound on file-open overhead and driver memory for file listing.
``compact_parquet`` rewrites a table directory to ~target-sized files with
one narrow job (coalesce, no shuffle) — the maintenance task every real
warehouse schedules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import tpch

BUCKET_COUNT = 8


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    path: str | None = None,
    n_buckets: int = BUCKET_COUNT,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed(+sorted) table (external when ``path``
    is given, managed otherwise): hash-distributed and sorted by ``key``
    within each bucket, so downstream equi-joins on ``key`` need neither
    Exchange nor Sort. The canonical implementation — operators/skew.py's
    ``write_bucketed`` delegates here.

    The pre-write repartition on the bucket key uses the SAME hash function
    as the bucket spec (pmod(murmur3, n)), so each task holds exactly one
    bucket and writes exactly ONE file per bucket — required: Spark ignores
    the sortBy metadata when a bucket is split across files, and the
    downstream join would re-Sort both sides."""
    writer = (
        df.repartition(n_buckets, F.col(key))
        .write.mode("overwrite")
        .bucketBy(n_buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucket_order_tables(
    spark: SparkSession, sf_dir: str, base_path: str, n_buckets: int = BUCKET_COUNT
) -> tuple[str, str]:
    """Bucket orders and lineitem by their shared join key (one shuffle each,
    paid once at write time). Returns the (orders, lineitem) table names."""
    o_tbl, l_tbl = "bkt_orders", "bkt_lineitem"
    write_bucketed(
        tpch.load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
        ),
        o_tbl,
        "o_orderkey",
        path=f"{base_path}/orders",
        n_buckets=n_buckets,
    )
    write_bucketed(
        tpch.load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity", "l_extendedprice", "l_discount"
        ),
        l_tbl,
        "l_orderkey",
        path=f"{base_path}/lineitem",
        n_buckets=n_buckets,
    )
    return o_tbl, l_tbl


def bucketed_order_revenue(spark: SparkSession, o_tbl: str, l_tbl: str) -> DataFrame:
    """lineitem⨝orders on the bucket key: with both sides bucketed+sorted on
    orderkey this compiles to SortMergeJoin with NO Exchange and NO Sort —
    the plan shape that makes repeated fact⨝fact joins viable at 100 TB."""
    o = spark.table(o_tbl)
    li = spark.table(l_tbl)
    return o.join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderkey",
        "o_orderdate",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


def compact_parquet(
    spark: SparkSession, src: str, dst: str, target_file_mb: int = 128
) -> int:
    """Rewrite a parquet directory into ~``target_file_mb``-sized files.

    File count is derived from the actual on-disk bytes (spark reports input
    files via the scan's inputFiles), and the rewrite is a COALESCE — a
    narrow dependency that merges partitions without shuffling rows. Returns
    the output file count."""
    df = spark.read.parquet(src)
    import os

    total_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(src)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-total_bytes // (target_file_mb * 1024 * 1024)))
    df.coalesce(n_files).write.mode("overwrite").parquet(dst)
    return n_files
