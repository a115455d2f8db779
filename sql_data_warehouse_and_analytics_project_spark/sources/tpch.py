"""Readers for the driver's TPC-H-ish parquet star schema (TESTDATA.md).

Parquet is already columnar + typed, so this layer stays thin: a named-table
reader that Catalyst can push filters/column pruning into. Dimension tables
are tagged so join sites can wrap them in ``broadcast()`` — at 100 TB the
fact tables (lineitem/orders/events/documents) are the only non-broadcastable
relations in this schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small at every scale factor (region/nation are fixed-cardinality); always
# safe to broadcast. customer/supplier/part grow with SF but remain dim-like.
ALWAYS_BROADCAST = {"region", "nation"}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.parquet has shipped ts as either TIMESTAMP(NANOS) (which
        # Spark's reader rejects without the legacy conf) or TIMESTAMP(MICROS)
        # (read natively as TIMESTAMP_NTZ) across driver testdata versions —
        # adapt to whichever physical type this sf_dir carries. Nanos are
        # converted with exact integer division (float division of
        # epoch-nanos would lose precision past 2^53); NTZ micros cast to
        # session-tz TIMESTAMP, value-preserving under the pinned UTC session.
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(raw.schema["ts"].dataType, T.LongType):
            return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def dim(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a dimension with a broadcast hint applied."""
    return F.broadcast(load(spark, sf_dir, name))
