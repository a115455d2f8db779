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

from pyspark.sql import Column, DataFrame, SparkSession
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

    File count is derived from the actual on-disk bytes (a recursive
    Hadoop-FS listing, so any Spark-readable URI works — r7, not just
    driver-local paths), and the rewrite is a COALESCE — a narrow
    dependency that merges partitions without shuffling rows. Returns the
    output file count."""
    from . import hdfs

    df = spark.read.parquet(src)
    total_bytes = hdfs.dir_bytes(spark, src)
    n_files = max(1, -(-total_bytes // (target_file_mb * 1024 * 1024)))
    df.coalesce(n_files).write.mode("overwrite").parquet(dst)
    return n_files


# --- Z-order clustering (multi-dimensional data skipping) -------------------
#
# Reference analog: the partition-aligned nonclustered indexes on the gold
# fact (ref: scripts/gold/ddl_gold.sql:136-140) give SQL Server two-column
# seek locality; the lakehouse equivalent is LAYOUT, not an index — cluster
# the rows so parquet row-group min/max statistics become selective on BOTH
# filter columns at once. A single-column sort makes stats tight on that
# column and useless on every other; interleaving the bits of both keys
# (Morton / Z-order curve) keeps each row group a small hyper-rectangle in
# (a, b) space, so a 2-D box predicate overlaps only a few row groups and
# the reader skips the rest on footer stats alone — no data pages touched.


def zorder_key(cols: list[Column], mins: list[int], maxs: list[int], bits: int = 16) -> Column:
    """Bit-interleaved (Morton) sort key over integer columns — pure
    built-in bit arithmetic, unrolled ``bits × len(cols)`` terms inside
    whole-stage codegen. Each column is affinely scaled to [0, 2^bits) with
    the write-time min/max so the interleave weights dimensions equally."""
    n = len(cols)
    assert bits * n <= 62, "z-value must fit a signed bigint"
    top = (1 << bits) - 1
    # scale via double DIVISION FIRST: the multiply-first int form
    # (c - lo) * top overflows int64 once the column span exceeds ~2^47
    # (epoch-nanos, snowflake ids) and silently scrambles the key. The
    # double ratio is monotone — all Z-order needs — and its ~2^-52
    # relative error cannot reorder values more than one 2^-bits bucket.
    scaled = [
        (
            (c.cast("double") - F.lit(float(lo)))
            / F.lit(float(max(hi - lo, 1)))
            * F.lit(float(top))
        ).cast("bigint")
        for c, lo, hi in zip(cols, mins, maxs)
    ]
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, s in enumerate(scaled):
            z = z + F.shiftleft(F.shiftright(s, i).bitwiseAND(F.lit(1)), i * n + j)
    return z


def write_zordered(
    df: DataFrame, path: str, cols: list[str], bits: int = 16, n_files: int = 16
) -> None:
    """Write ``df`` clustered on the Z-order curve of ``cols``: one agg pass
    for write-time min/max, then repartitionByRange + sortWithinPartitions
    on the z-value — range partitioning clusters ACROSS files, the sort
    clusters within row groups, and the key itself is dropped before write.
    At 100 TB this is one extra range shuffle at write time in exchange for
    footer-stat data skipping on every multi-dimension slice forever after."""
    stats = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    ).collect()[0]
    z = zorder_key(
        [F.col(c) for c in cols],
        [int(stats[f"_lo_{c}"]) for c in cols],
        [int(stats[f"_hi_{c}"]) for c in cols],
        bits,
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def row_groups_overlapping(path: str, box: dict[str, tuple[int, int]]) -> tuple[int, int]:
    """(n_overlapping, n_total) parquet row groups whose column min/max
    stats intersect the given per-column [lo, hi] box — the exact skipping
    decision a stats-aware reader makes from footers alone. This is the
    audit surface for :func:`write_zordered`: fewer overlapping row groups
    = less IO for every engine that reads the table."""
    import os

    import pyarrow.parquet as pq

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    )
    n_total = n_overlap = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            n_total += 1
            g = md.row_group(rg)
            hit = True
            for col, (lo, hi) in box.items():
                st = g.column(names[col]).statistics
                if st is None or st.min is None:
                    continue  # no stats → reader cannot skip; counts as overlap
                if st.max < lo or st.min > hi:
                    hit = False
                    break
            n_overlap += hit
    return n_overlap, n_total
