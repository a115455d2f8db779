"""Multimodal (image/audio/video) column plumbing.

Design: media travels as an opaque ``binary`` column plus a typed metadata
struct — the layout a 100 TB multimodal training-data lake uses (media bytes
inline for small assets, or a URI + byte-range for large ones; either way
the Spark-side schema is identical). Decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so bytes cross the JVM↔Python boundary once
per batch, not per row.

Codec support (r02): the container has no media libraries (no PIL/ffmpeg),
but PNG and WAV are simple enough to decode with the stdlib — so the REAL
decode path is real for those two formats: ``_decode_png`` parses PNG
chunks, inflates IDAT with zlib, and undoes all five scanline filters
(None/Sub/Up/Average/Paeth, per the public PNG spec) into a numpy pixel
array; ``_decode_wav`` reads PCM frames via the ``wave`` module. VIDEO
decode remains a clearly-marked stub (no container codec can be expressed
in stdlib) and falls back to the deterministic fake feature.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from collections.abc import Iterator

import numpy as np
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type → channel count


def decode_png(raw: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to an (h, w, channels) uint8 array.

    Pure stdlib+numpy implementation of the public PNG spec: chunk walk →
    IHDR geometry → zlib-inflate concatenated IDAT → per-scanline unfilter
    (all five filter types, including Paeth prediction)."""
    if raw[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat = 8, b""
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(raw):
        ln = int.from_bytes(raw[pos : pos + 4], "big")
        typ = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if depth != 8 or interlace != 0:
        raise ValueError(f"unsupported PNG (depth={depth}, interlace={interlace})")
    channels = _PNG_CHANNELS[ctype]
    stride = w * channels
    plain = zlib.decompress(idat)
    bpp = channels  # bytes per pixel at depth 8
    # numpy-vectorized unfilter (r4). None/Up are single vector ops; Sub is a
    # per-channel cumulative sum mod 256 (mod distributes over addition, so
    # cumsum in int64 then &0xFF is exact). Average/Paeth form a true 2D
    # recurrence (each pixel needs left, up and upper-left RECONSTRUCTED
    # values), so contiguous runs of such rows are solved by anti-diagonal
    # WAVEFRONT sweeps — run_h+w-1 sequential steps, each a vectorized numpy
    # batch over the whole diagonal, instead of run_h·w per-pixel Python
    # steps. ~20-40× over the per-byte loops this replaces.
    arr = np.frombuffer(plain, dtype=np.uint8).reshape(h, 1 + stride)
    ftypes = arr[:, 0]
    if not np.isin(ftypes, (0, 1, 2, 3, 4)).all():
        bad = int(ftypes[~np.isin(ftypes, (0, 1, 2, 3, 4))][0])
        raise ValueError(f"bad PNG filter {bad}")
    raw = arr[:, 1:].astype(np.int64)
    out = np.zeros((h, stride), dtype=np.uint8)
    zero_row = np.zeros(stride, dtype=np.int64)
    y = 0
    while y < h:
        ftype = ftypes[y]
        prev = out[y - 1].astype(np.int64) if y > 0 else zero_row
        if ftype >= 3:  # maximal run of SAME-type Average/Paeth rows
            y_end = y + 1
            while y_end < h and ftypes[y_end] == ftype:
                y_end += 1
            # wavefront amortizes its numpy dispatch per diagonal only when
            # diagonals are long (≈ run height); short runs fall back to a
            # plain scalar loop, which beats tiny-batch numpy by ~10×
            unfilter = _unfilter_wavefront if y_end - y >= 8 else _unfilter_scalar
            out[y:y_end] = unfilter(raw[y:y_end], ftypes[y:y_end], prev, w, bpp)
            y = y_end
            continue
        line = raw[y]
        if ftype == 0:  # None
            rec = line
        elif ftype == 1:  # Sub: recon = cumsum of raw per channel, mod 256
            rec = (np.cumsum(line.reshape(-1, bpp), axis=0) & 0xFF).reshape(-1)
        else:  # Up
            rec = (line + prev) & 0xFF
        out[y] = rec.astype(np.uint8)
        y += 1
    return out.reshape(h, w, channels)


def _unfilter_scalar(
    raw_rows: np.ndarray, ftypes_run: np.ndarray, top_prev: np.ndarray, w: int, bpp: int
) -> np.ndarray:
    """Scalar-Python Average/Paeth reconstruction for SHORT runs, where the
    wavefront's per-diagonal numpy dispatch overhead exceeds the work. Pure
    int arithmetic on flat lists — no per-element numpy calls."""
    R = raw_rows.shape[0]
    stride = w * bpp
    out = np.empty((R, stride), dtype=np.uint8)
    prev = [int(v) for v in top_prev]
    for r in range(R):
        line = [int(v) for v in raw_rows[r]]
        if ftypes_run[r] == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        else:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        out[r] = line
        prev = line
    return out


def _unfilter_wavefront(
    raw_rows: np.ndarray, ftypes_run: np.ndarray, top_prev: np.ndarray, w: int, bpp: int
) -> np.ndarray:
    """Reconstruct a contiguous run of Average(3)/Paeth(4) scanlines.

    The recurrence rec[r,x] = raw[r,x] + pred(left, up, upper-left) only
    reaches cells on EARLIER anti-diagonals (left and up sit on diagonal
    d-1, upper-left on d-2), so sweeping diagonals in order makes every cell
    on a diagonal independent → one vectorized numpy batch per step, R+w-1
    steps total (instead of R·w sequential pixels).

    Layout: rows are stored SKEWED — srow i (image run row i-1, with the row
    ABOVE the run spliced in as srow 0) is shifted right by i, so an
    anti-diagonal becomes a COLUMN and every neighbor access is a contiguous
    slice view (no fancy-indexing gathers): up = col j-1 srows 0..R-1,
    left = col j-1 srows 1..R, upper-left = col j-2 srows 0..R-1. Cells
    outside 0 ≤ x < w compute garbage, but garbage only ever feeds garbage
    (the x-range check shows valid cells' neighbors are valid or the patched
    x=0 edge, where left/ul are zeroed as one scalar write per column). The
    run is homogeneous (one filter type), so the Average branch skips the
    upper-left read entirely."""
    R = raw_rows.shape[0]
    W = w + R + 1  # skewed width: x + i ≤ (w-1) + R, plus a spare column
    raw_sk = np.zeros((R, W, bpp), dtype=np.int32)
    raw3 = raw_rows.reshape(R, w, bpp)
    for i in range(R):  # srow i+1 holds run row i, shifted by i+1
        raw_sk[i, i + 1 : i + 1 + w] = raw3[i]
    skx = np.zeros((R + 1, W, bpp), dtype=np.int32)
    skx[0, :w] = top_prev.reshape(w, bpp)  # srow 0 = row above the run, shift 0
    is_avg = ftypes_run[0] == 3
    zcol = np.zeros((R, bpp), dtype=np.int32)
    for j in range(1, w + R):
        if j <= R:
            # cell (srow j, x=0) has no left/upper-left: zero its left slot
            # skx[j, j-1] IN PLACE (an x=-1 garbage cell — the write can only
            # reach invalid cells or this intended edge; it also pre-zeroes
            # the NEXT column's upper-left slot for the next x=0 cell)
            skx[j, j - 1] = 0
        up = skx[:R, j - 1]
        left = skx[1:, j - 1]
        if is_avg:
            pred = (left + up) >> 1
        else:
            ul = skx[:R, j - 2] if j >= 2 else zcol
            pa = np.abs(up - ul)
            pb = np.abs(left - ul)
            pc = np.abs(left + up - 2 * ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul))
        skx[1:, j] = (raw_sk[:, j] + pred) & 0xFF
    out = np.empty((R, w * bpp), dtype=np.uint8)
    for i in range(R):
        out[i] = skx[i + 1, i + 1 : i + 1 + w].reshape(-1)
    return out


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal PNG writer (filter 0, 8-bit gray/RGB/RGBA) — the test-side
    twin of :func:`decode_png`, also stdlib-only."""
    h, w, channels = pixels.shape
    ctype = {1: 0, 3: 2, 4: 6}[channels]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    scanlines = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )


def encode_wav(samples: np.ndarray, framerate: int = 8000) -> bytes:
    """Minimal mono 16-bit PCM WAV writer (stdlib ``wave``)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(framerate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


_FEATURE_DIM = 8


def _decode_image_real(payload: bytes) -> list[float]:
    """Real PNG decode → 8-float feature vector:
    [width, height, channels, mean(ch0..ch2 or grey), pixel std, aspect]."""
    px = decode_png(payload).astype(np.float64)
    h, w, c = px.shape
    means = px.mean(axis=(0, 1))
    m = [float(means[i]) if i < c else float(means[0]) for i in range(3)]
    return [float(w), float(h), float(c), m[0], m[1], m[2], float(px.std()), w / h]


def _decode_audio_real(payload: bytes) -> list[float]:
    """Real WAV decode → 8-float feature vector:
    [channels, framerate/1000, n_frames, rms, peak, duration_s, 0, 0]."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        nch, sw, rate, nframes = wf.getnchannels(), wf.getsampwidth(), wf.getframerate(), wf.getnframes()
        raw = wf.readframes(nframes)
    if sw != 2:
        raise ValueError(f"unsupported sample width {sw}")
    samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    rms = float(np.sqrt((samples**2).mean())) if samples.size else 0.0
    peak = float(np.abs(samples).max()) if samples.size else 0.0
    return [float(nch), rate / 1000.0, float(nframes), rms, peak, nframes / rate, 0.0, 0.0]


def _decode_video_real(payload: bytes) -> list[float]:
    """Video decode STUB — no container/codec parser can reasonably live in
    the stdlib; production plugs ffmpeg/torchvision here."""
    raise NotImplementedError(
        "video codecs unavailable in this environment; the pipeline uses the "
        "deterministic fake feature for video payloads"
    )


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
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                raw = bytes(payload)
                if fake:
                    feats.append(_fake_feature(raw))
                elif mtype == "image":
                    feats.append(_decode_image_real(raw))
                elif mtype == "audio":
                    feats.append(_decode_audio_real(raw))
                else:
                    # video real decode is the documented stub — deterministic
                    # fake keeps the pipeline total (see _decode_video_real)
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


def synth_real_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media table whose payloads are REAL encoded assets: deterministic
    PNG images (gradient pixels keyed on doc_id) and 16-bit PCM WAV clips,
    generated Arrow-batched on the executors (the encode is the write-side
    twin of the decode path — nothing is round-tripped through the driver)."""
    ids = tpch.load(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "media_type": [], "payload": [], "meta": []}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                if i % 2 == 0:
                    w, h = 8 + i % 16, 6 + i % 12
                    yy, xx = np.mgrid[0:h, 0:w]
                    px = np.stack(
                        [(xx * 3 + i) % 256, (yy * 5 + i) % 256, (xx + yy + i) % 256], axis=-1
                    ).astype(np.uint8)
                    payload, mtype = encode_png(px), "image"
                    meta = {"width": w, "height": h, "n_bytes": len(payload), "codec": "png"}
                else:
                    n = 256 + i % 512
                    t = np.arange(n, dtype=np.float64)
                    samples = (np.sin(t * (1 + i % 7) / 10.0) * 12000).astype("<i2")
                    payload, mtype = encode_wav(samples), "audio"
                    meta = {"width": None, "height": None, "n_bytes": len(payload), "codec": "wav"}
                rows["media_id"].append(i)
                rows["media_type"].append(mtype)
                rows["payload"].append(payload)
                rows["meta"].append(meta)
            yield pd.DataFrame(rows)

    return ids.mapInPandas(gen, schema=MEDIA_SCHEMA)


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


_MM_FEATURES_SQL = """
WITH media AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
         octet_length(encode(text)) AS n_bytes,
         CAST(('0x' || substr(sha256(text), 1, 8))::BIGINT / 4294967296.0 AS FLOAT) AS f0
  FROM documents
)
SELECT media_type,
       COUNT(*) AS n_assets,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(SUM(FLOOR(CAST(f0 AS DOUBLE) * 1000000.0)) AS DOUBLE) / 1000000.0 AS f0_mass
FROM media
GROUP BY media_type
ORDER BY media_type
"""


@query("multimodal_features", oracle=_MM_FEATURES_SQL)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline: binary media table → Arrow-batched
    (fake) decode → per-type feature stats.

    Oracle-checked since r4 even though the decode runs Python-side: the
    deterministic stand-in feature is sha256-derived (first 4 digest bytes
    / 2³²), which DuckDB reproduces — the oracle mirrors the FLOAT32
    rounding the Arrow feature schema imposes before the floor/sum. The
    hash proof covers the full mapInPandas round trip: schema, batch
    shape, byte fidelity of payloads, and the aggregation."""
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

@query("multimodal_decode_real", oracle=None)
def multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode pipeline: executor-generated PNG/WAV payloads → stdlib
    decode (chunk parse + unfilter / PCM read) → per-type stats over true
    decoded properties (pixel mean, audio RMS). Rows-only check: the codec
    work is Python-side by design; pytest pins exact decoded pixels."""
    media = synth_real_media(spark, sf_dir)
    feats = decode_features(media, fake=False)
    return (
        feats.select(
            "media_type",
            "n_bytes",
            F.element_at("feature", 1).alias("f0"),  # image width / audio channels
            F.element_at("feature", 4).alias("f3"),  # image mean(ch0) / audio rms
        )
        .groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("n_bytes").alias("total_bytes"),
            (F.sum(F.floor(F.col("f0") * 1e6)).cast("double") / 1e6).alias("f0_mass"),
            (F.sum(F.floor(F.col("f3") * 1e6)).cast("double") / 1e6).alias("f3_mass"),
        )
        .orderBy("media_type")
    )
