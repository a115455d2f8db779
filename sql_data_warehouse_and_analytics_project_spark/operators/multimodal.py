"""Multimodal (image/audio/video) column plumbing.

Design: media travels as an opaque ``binary`` column plus a typed metadata
struct — the layout a 100 TB multimodal training-data lake uses (media bytes
inline for small assets, or a URI + byte-range for large ones; either way
the Spark-side schema is identical). Decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so bytes cross the JVM↔Python boundary once
per batch, not per row.

The actual codec step is STUBBED: this container has no image/audio
libraries, so ``_decode_image_real`` raises NotImplementedError and the
pipeline uses a deterministic fake decoder. Everything around it — schema,
partitioning, UDF signature, batch shapes — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..sources import tpch

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_digest", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _decode_image_real(payload: bytes) -> list[float]:
    """Real decoder slot (PIL/torchvision/ffmpeg in production).

    Kept import-gated: this container ships no media libraries.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - always taken here
        raise NotImplementedError(
            "media codecs unavailable in this environment; use the deterministic "
            "fake decoder (decode_features(..., fake=True))"
        ) from exc
    raise NotImplementedError("real decode path not implemented")


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature: bytes → sha256 → dim floats in [0,1)."""
    digest = hashlib.sha256(payload).digest()
    return [int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table from ``documents`` (text bytes as payload) —
    exercises the binary-column schema without external assets. Payload
    bytes are deterministic, so every derived feature is too."""
    docs = tpch.load(spark, sf_dir, "documents")
    media_type = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        media_type.alias("media_type"),
        payload.alias("payload"),
        F.struct(
            (F.pmod(F.col("doc_id"), F.lit(640)) + 32).cast("int").alias("width"),
            (F.pmod(F.col("doc_id"), F.lit(480)) + 32).cast("int").alias("height"),
            F.length(payload).cast("bigint").alias("n_bytes"),
            F.lit("fake/raw").alias("codec"),
        ).alias("meta"),
    )


def decode_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched decode/feature-extract via mapInPandas.

    Partition-parallel: each executor receives pandas batches of
    (media_id, payload, ...) and emits fixed-width feature rows; at scale
    the media table is repartitioned so batches stay within Arrow limits
    (spark.sql.execution.arrow.maxRecordsPerBatch governs batch shape)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                if not fake:
                    feats.append(_decode_image_real(raw))  # pragma: no cover
                else:
                    feats.append(_fake_feature(raw))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "content_digest": [hashlib.sha256(bytes(p)).hexdigest() for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Deterministic frame sampling for video payloads: split the byte
    stream into n equal chunks (stand-in for timestamp-based frame decode)
    using built-in substring on binary — no Python in this path."""
    videos = media.filter(F.col("media_type") == "video")
    n = F.length("payload")
    frames = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: F.substring(F.col("payload"), (i * (n / n_frames)).cast("int") + 1, 32),
    )
    return videos.select(
        "media_id",
        F.posexplode(frames).alias("frame_no", "frame_bytes"),
    )


@query("multimodal_features", oracle=None)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline: binary media table → Arrow-batched
    (fake) decode → per-type feature stats. Rows-only check (the decode step
    is Python-side by design); pytest pins schema/determinism/batch shape."""
    media = synth_media(spark, sf_dir)
    feats = decode_features(media, fake=True)
    return (
        feats.select(
            "media_type",
            "n_bytes",
            F.element_at("feature", 1).alias("f0"),
        )
        .groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("n_bytes").alias("total_bytes"),
            (F.sum(F.floor(F.col("f0") * 1e6)).cast("double") / 1e6).alias("f0_mass"),
        )
        .orderBy("media_type")
    )
