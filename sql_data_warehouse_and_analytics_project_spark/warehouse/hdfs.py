"""Hadoop FileSystem helpers — URI-generic filesystem metadata operations.

Index/compaction maintenance needs exists/rename/delete/size primitives
that work on ANY Spark-readable storage URI (file://, hdfs://, s3a://…),
not just the driver's local disk: a driver-local ``os.path`` call against
an ``hdfs://`` path is silently false, which turns "probe the index" into
"skip the probe forever" (the bug class ADVICE r5 flagged for the
streaming sink's exists check). Every helper resolves the filesystem FROM
the path, so the same code publishes a local index in tests and an
HDFS-resident one on a cluster. On object stores without atomic rename
(S3), ``rename`` degrades to the connector's copy+delete — still correct
for the swap discipline (the live directory is moved ASIDE first and the
replacement moved in; every crash window leaves data recoverable), just
not atomic; a production S3 index would layer a manifest pointer on top.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def exists(spark: SparkSession, path: str) -> bool:
    fs, hpath = _fs_and_path(spark, path)
    return fs.exists(hpath)


def delete(spark: SparkSession, path: str) -> bool:
    """Recursive delete; False if the path did not exist."""
    fs, hpath = _fs_and_path(spark, path)
    return fs.delete(hpath, True)


def rename(spark: SparkSession, src: str, dst: str) -> None:
    """Move ``src`` to ``dst`` (dst must not exist — Hadoop rename refuses
    to clobber). Raises on failure instead of Hadoop's silent False."""
    fs, hsrc = _fs_and_path(spark, src)
    hdst = spark._jvm.org.apache.hadoop.fs.Path(dst)
    if not fs.rename(hsrc, hdst):
        raise IOError(f"rename failed: {src!r} -> {dst!r}")


def swap_aside(spark: SparkSession, src: str, tmp: str) -> None:
    """Publish ``tmp`` over ``src`` with the rename-aside discipline every
    index compaction in this engine uses: the live directory moves ASIDE
    to ``<src>.old`` (atomic on posix/HDFS) before the replacement moves
    in, then the aside copy is dropped — every crash window leaves the
    data recoverable, never deleted-before-replaced."""
    old = f"{src}.old"
    if exists(spark, old):
        delete(spark, old)
    rename(spark, src, old)
    rename(spark, tmp, src)
    delete(spark, old)


def dir_bytes(spark: SparkSession, path: str, suffix: str = ".parquet") -> int:
    """Total bytes of files under ``path`` whose name ends with ``suffix``
    — file METADATA only (a recursive listing, no data read)."""
    fs, hpath = _fs_and_path(spark, path)
    total = 0
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        # py4j materializes the Java String as a Python str
        if str(st.getPath().getName()).endswith(suffix):
            total += st.getLen()
    return total
