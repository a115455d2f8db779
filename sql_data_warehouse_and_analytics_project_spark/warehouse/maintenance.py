"""Table maintenance: small-file compaction for committed tables.

Continuous ingest (streaming sinks, incremental appends, frequent
micro-batch publishes) fragments a table into many small parquet files;
at 100 TB the file COUNT — not the byte count — becomes the bottleneck
(NameNode/object-store listing pressure, one scan task per tiny file,
row-group overhead). `compact_table` rewrites a committed table's
current version into ~`target_file_bytes` files through the same
crash-safe pointer protocol every other state change here uses: readers
stay on the old fragmented version until the compacted one is fully
written, a crash mid-compaction is invisible, and `keep_versions` offers
snapshot isolation to scans still running on the superseded layout —
the plain-parquet analog of Delta's OPTIMIZE.

Scale shape: one read + one write of the table (inherent to physical
compaction), NO shuffle by default — `coalesce` only narrows
partitions. Pass ``shuffle=True`` when the input is skewed enough that
narrowing alone leaves unbalanced files (coalesce cannot split a
partition).

ref: extension beyond the reference (its T-SQL warehouse delegates file
layout to SQL Server); public Delta OPTIMIZE semantics.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession

from . import commit
from . import hdfs

_DEFAULT_TARGET = 128 * 1024 * 1024  # 128 MiB per output file


def compact_table(
    spark: SparkSession,
    target: str,
    target_file_bytes: int = _DEFAULT_TARGET,
    shuffle: bool = False,
    keep_versions: int = 0,
) -> dict:
    """Rewrite ``target``'s current version into ~``target_file_bytes``
    files via ``commit.publish``. Returns a summary dict
    (files_before, files_after, bytes, n_files_target) — the audit row a
    maintenance scheduler logs. No-op (no new version) when the table
    already has <= the target file count."""
    data_dir = commit.resolve(target)
    total = hdfs.dir_bytes(spark, data_dir)
    jvm_files = _parquet_file_count(spark, data_dir)
    n_target = max(1, math.ceil(total / max(1, target_file_bytes)))
    if jvm_files <= n_target:
        return {
            "files_before": jvm_files,
            "files_after": jvm_files,
            "bytes": total,
            "n_files_target": n_target,
            "compacted": False,
        }
    df = spark.read.parquet(data_dir)
    df = df.repartition(n_target) if shuffle else df.coalesce(n_target)
    commit.publish(
        target,
        lambda vdir: df.write.mode("overwrite").parquet(vdir),
        keep_versions=keep_versions,
    )
    after = _parquet_file_count(spark, commit.resolve(target))
    return {
        "files_before": jvm_files,
        "files_after": after,
        "bytes": total,
        "n_files_target": n_target,
        "compacted": True,
    }


def _parquet_file_count(spark: SparkSession, path: str) -> int:
    fs, p = hdfs._fs_and_path(spark, path)
    it = fs.listStatus(p)
    return sum(
        1 for s in it if s.isFile() and s.getPath().getName().endswith(".parquet")
    )


def table_version_diff(
    spark: SparkSession,
    target: str,
    old_version: str,
    new_version: str,
    key: str,
    compare_cols: list[str],
):
    """Change-data-feed between two committed versions of a table: reads
    both version dirs through the commit protocol's time travel
    (``commit.resolve_version``) and returns the (key, status) rows of
    :func:`operators.etl_queries.snapshot_diff` — 'added' / 'removed' /
    'changed'. The Delta CDF analog for the plain-parquet commit layout:
    retained history (``keep_versions``) is what makes the old side
    readable, and the diff itself is one key-partitioned full-outer join.
    """
    from ..operators.etl_queries import snapshot_diff

    old = spark.read.parquet(commit.resolve_version(target, old_version))
    new = spark.read.parquet(commit.resolve_version(target, new_version))
    return snapshot_diff(old, new, key, compare_cols)
