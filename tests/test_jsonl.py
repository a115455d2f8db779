"""JSONL source: schema enforcement, corrupt-line quarantine, round-trip.

Pins the Spark semantics the reader's contract depends on: malformed
JSON and type-mismatched-but-valid JSON both land in quarantine with the
raw line intact; good + quarantine == total; a parquet→JSONL→parquet
round trip of the documents table is lossless; outputs are independent
of file split boundaries (1 shard vs many)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sql_data_warehouse_and_analytics_project_spark.sources import tpch
from sql_data_warehouse_and_analytics_project_spark.sources.jsonl import (
    ingest_documents_jsonl,
    write_jsonl,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

LINES = [
    '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11}',
    '{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web", "n_chars": 7}',
    "{not json at all",
    '{"doc_id": "NOT_A_NUMBER", "text": "typed wrong", "lang": "en", "source": "web", "n_chars": 0}',
    '{"doc_id": 3, "text": null, "lang": "de", "source": "books", "n_chars": 0}',
]


def test_quarantine_split(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(LINES) + "\n")
    good, quarantine = ingest_documents_jsonl(spark, str(p))
    g = {r["doc_id"]: r for r in good.collect()}
    q = [r["raw_line"] for r in quarantine.collect()]
    # doc 3 has a legitimately-null field -> good; the two bad lines quarantine
    assert sorted(g) == [1, 2, 3]
    assert g[3]["text"] is None and g[3]["lang"] == "de"
    assert len(q) == 2
    assert any("not json" in line for line in q)
    assert any("NOT_A_NUMBER" in line for line in q)
    assert good.count() + quarantine.count() == len(LINES)
    assert good.columns == ["doc_id", "text", "lang", "source", "n_chars"]


def test_roundtrip_documents_table(spark, tmp_path):
    docs = tpch.load(spark, SF_DIR, "documents")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs.repartition(4), out)
    back, quarantine = ingest_documents_jsonl(spark, out)
    assert quarantine.count() == 0
    assert back.count() == docs.count()
    # full-row fingerprint equality, order-free (text may contain any chars)
    fp = lambda df: df.select(  # noqa: E731
        F.md5(F.to_json(F.struct(*sorted(df.columns)))).alias("h")
    ).agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("bigint")).alias("s"))
    assert fp(back).first()["s"] == fp(docs).first()["s"]


def test_split_independence(spark, tmp_path):
    """Same lines through 1 shard vs 5 shards parse identically."""
    docs = tpch.load(spark, SF_DIR, "documents").limit(50)
    one, many = str(tmp_path / "one"), str(tmp_path / "many")
    write_jsonl(docs.coalesce(1), one)
    write_jsonl(docs.repartition(5), many)
    g1, _ = ingest_documents_jsonl(spark, one)
    g2, _ = ingest_documents_jsonl(spark, many)
    assert sorted(map(tuple, g1.collect())) == sorted(map(tuple, g2.collect()))


def test_batch_unpersist_releases_cache(spark, tmp_path):
    """The returned batch owns the cached parse: unpersist() (or the
    context manager) releases executor storage so ingest batches don't
    pin memory for the session lifetime (ADVICE r14)."""
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(LINES) + "\n")

    batch = ingest_documents_jsonl(spark, str(p))
    good, quarantine = batch  # 2-tuple unpacking still works
    assert good.count() == 3 and quarantine.count() == 2
    assert batch.raw.storageLevel.useMemory  # cached while in use
    batch.unpersist()
    assert not batch.raw.storageLevel.useMemory
    batch.unpersist()  # idempotent

    with ingest_documents_jsonl(spark, str(p)) as b2:
        assert b2.good.count() == 3
        assert b2.raw.storageLevel.useMemory
    assert not b2.raw.storageLevel.useMemory
