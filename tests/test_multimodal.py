"""Multimodal plumbing: schema, determinism, stub gating."""

from __future__ import annotations

import pytest
from conftest import SF_DIR

from sql_data_warehouse_and_analytics_project_spark.operators import multimodal as mm


def test_media_schema_and_decode(spark):
    media = mm.synth_media(spark, SF_DIR)
    assert [f.name for f in media.schema.fields] == ["media_id", "media_type", "payload", "meta"]
    assert media.schema["payload"].dataType.typeName() == "binary"

    feats = mm.decode_features(media, fake=True)
    assert [f.name for f in feats.schema.fields] == [
        "media_id",
        "media_type",
        "n_bytes",
        "content_digest",
        "feature",
    ]
    rows = feats.orderBy("media_id").limit(5).collect()
    assert all(len(r.feature) == 8 for r in rows)
    # deterministic: second run produces identical features
    rows2 = mm.decode_features(media, fake=True).orderBy("media_id").limit(5).collect()
    assert [r.feature for r in rows] == [r.feature for r in rows2]
    assert all(0.0 <= v < 1.0 for r in rows for v in r.feature)


def test_real_decoder_is_gated():
    with pytest.raises(NotImplementedError):
        mm._decode_image_real(b"\x00\x01")


def test_frame_sample(spark):
    media = mm.synth_media(spark, SF_DIR)
    frames = mm.frame_sample(media, n_frames=4)
    counts = frames.groupBy("media_id").count().select("count").distinct().collect()
    assert [r["count"] for r in counts] == [4]
