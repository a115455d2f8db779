"""JSONL (newline-delimited JSON) source with corrupt-record quarantine.

Training-data pipelines land corpora as JSONL long before they become
parquet; this reader is the schema-enforced front door: explicit schema
(never inference — an inference pass is a second full scan at 100 TB and
a schema race between files), PERMISSIVE parse with the corrupt raw line
captured, and a split into (good, quarantine) frames so bad lines are
auditable instead of silently nulled.

Scale shape: one narrow scan, parallelized by file split exactly like
the bronze CSV path (``warehouse/bronze.py``); no shuffle in either
output. The quarantine frame carries the RAW line, so a re-parse after
a schema fix replays from bronze without re-landing. gzip/zstd JSONL
works unchanged (Spark decompresses by extension) but single large .gz
files are one split each — shard compressed corpora upstream.

Determinism: parsing is per-line; outputs depend only on line content,
never on split boundaries. The one Spark subtlety is pinned by tests:
a line that is VALID JSON but violates the schema (e.g. a string where
a bigint is declared) nulls the offending field AND is captured in the
corrupt column, so "good" is defined as corrupt-column-IS-NULL, not
merely "parsed".

ref: extension beyond the reference (its only ingest is CSV BULK INSERT,
proc_load_bronze.sql); public Spark JSON-source semantics.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


@dataclass
class JsonlBatch:
    """The (good, quarantine) pair plus the cache-release handle.

    Unpacks like the 2-tuple it replaces (``good, quarantine = read_jsonl(...)``)
    and works as a context manager. The parsed frame is CACHED (the
    SPARK-21610 corrupt-column contract requires it); without a release,
    every ingest batch would pin executor storage for the session
    lifetime — call :meth:`unpersist` (or exit the ``with`` block) after
    materializing both outputs."""

    good: DataFrame
    quarantine: DataFrame
    raw: DataFrame  # the cached parsed frame (declared schema + corrupt col)

    def unpersist(self, blocking: bool = False) -> None:
        """Release the cached parsed frame (idempotent)."""
        self.raw.unpersist(blocking)

    def __iter__(self):
        return iter((self.good, self.quarantine))

    def __enter__(self) -> "JsonlBatch":
        return self

    def __exit__(self, *exc) -> bool:
        self.unpersist()
        return False

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> JsonlBatch:
    """Schema-enforced JSONL read; unpacks as ``good, quarantine``.

    ``good`` has exactly the declared schema; ``quarantine`` is
    (raw_line string) — one row per line Spark could not fully bind to
    the schema (malformed JSON or type-mismatched fields). Counts obey
    good + quarantine == total lines. The returned :class:`JsonlBatch`
    owns the cached parse — ``unpersist()`` it (or use ``with``) once
    both outputs are materialized."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        # SPARK-21610: a query that references ONLY the corrupt column of a
        # just-parsed JSON frame is disallowed (column pruning would skip
        # the parse that populates it); the documented contract is to cache
        # the parsed frame first. The cached unit is the parsed lines —
        # bounded by the ingest batch, released with the frame.
        .cache()
    )
    good = raw.filter(F.col(CORRUPT_COL).isNull()).select(
        *[f.name for f in schema.fields]
    )
    quarantine = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return JsonlBatch(good=good, quarantine=quarantine, raw=raw)


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """Write a frame as JSONL shards (one file per partition — shard
    count is the upstream partitioning, the knob that matters at scale)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def ingest_documents_jsonl(spark: SparkSession, path: str) -> JsonlBatch:
    """The documents-table instantiation of :func:`read_jsonl` — the
    JSONL twin of the parquet ``documents`` source, same column set the
    whole text/dedup/retrieval family consumes."""
    return read_jsonl(spark, path, DOCUMENTS_SCHEMA)
