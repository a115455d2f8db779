"""Persisted positional layer: indexed phrase serving ≡ corpus-scan path,
bucket pruning, shared-tombstone masking, append ≡ rebuild."""


from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sql_data_warehouse_and_analytics_project_spark.operators import retrieval as rt
from sql_data_warehouse_and_analytics_project_spark.plans import audit
from sql_data_warehouse_and_analytics_project_spark.sources import tpch

from conftest import SF_DIR

PHRASE = ("stream", "data")


def _docs(spark):
    return tpch.load(spark, SF_DIR, "documents")


def _build(spark, tmp_path, docs=None):
    path = str(tmp_path / "idx")
    d = docs if docs is not None else _docs(spark)
    rt.build_inverted_index(d, path, n_buckets=16)
    rt.add_positional_layer(d, path)
    return path


def test_indexed_phrase_equals_corpus_scan(spark, tmp_path):
    docs = _docs(spark)
    path = _build(spark, tmp_path, docs)
    got = [tuple(r) for r in rt.phrase_search_indexed(spark, path, PHRASE).collect()]
    want = [tuple(r) for r in rt.phrase_match(docs, PHRASE).collect()]
    assert got == want and len(want) > 0


def test_indexed_phrase_prunes_buckets(spark, tmp_path):
    path = _build(spark, tmp_path)
    df = rt.phrase_search_indexed(spark, path, PHRASE)
    plan = audit.formatted_plan(df)
    want = sorted({rt._term_bucket_py(t, 16) for t in PHRASE})
    scan = plan[plan.index("positions") :]
    assert "PartitionFilters" in scan
    pf = scan[scan.index("PartitionFilters") :].splitlines()[0]
    assert all(str(b) in pf for b in want)


def test_delete_masks_phrase_results(spark, tmp_path):
    docs = _docs(spark)
    path = _build(spark, tmp_path, docs)
    before = {r["doc_id"] for r in rt.phrase_search_indexed(spark, path, PHRASE).collect()}
    victim = min(before)
    rt.delete_from_inverted_index(spark, path, [victim])
    after = {r["doc_id"] for r in rt.phrase_search_indexed(spark, path, PHRASE).collect()}
    assert after == before - {victim}


@pytest.mark.slow
def test_append_equals_fresh_build(spark, tmp_path):
    docs = _docs(spark)
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "idx_a")
    rt.build_inverted_index(old, path, n_buckets=16)
    rt.add_positional_layer(old, path)
    rt.append_inverted_index(new, path)
    rt.append_positional_layer(new, path)
    got = [tuple(r) for r in rt.phrase_search_indexed(spark, path, PHRASE).collect()]
    fresh = str(tmp_path / "idx_b")
    rt.build_inverted_index(docs, fresh, n_buckets=16)
    rt.add_positional_layer(docs, fresh)
    want = [tuple(r) for r in rt.phrase_search_indexed(spark, fresh, PHRASE).collect()]
    assert got == want and len(want) > 0


def test_stream_positional_ingest_serves_phrase_and_replay_is_noop(spark, tmp_path):
    """Three streamed batches into the positional layer: indexed phrase
    answers == one-shot batch build over the union; a full fresh-
    checkpoint redelivery leaves the layer row-identical (anti-join
    repair — no sidecar)."""
    import os

    from sql_data_warehouse_and_analytics_project_spark.streaming import jobs

    docs = _docs(spark)
    path = str(tmp_path / "sidx")
    rt.build_inverted_index(docs, path, n_buckets=16)  # stats for n_buckets

    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    for bi in range(3):
        docs.filter(F.col("doc_id") % 3 == bi).coalesce(1).write.parquet(
            f"{input_dir}/b{bi}.parquet"
        )
    stream = spark.readStream.schema(docs.schema).parquet(f"{input_dir}/*")
    q = jobs.sink_stream_positional_layer(stream, path, str(tmp_path / "ck1"))
    q.awaitTermination(120)

    got = [tuple(r) for r in rt.phrase_search_indexed(spark, path, PHRASE).collect()]
    want = [tuple(r) for r in rt.phrase_match(docs, PHRASE).collect()]
    assert got == want and len(want) > 0

    rows_before = sorted(
        map(repr, spark.read.parquet(f"{path}/positions").collect())
    )
    stream2 = spark.readStream.schema(docs.schema).parquet(f"{input_dir}/*")
    q2 = jobs.sink_stream_positional_layer(stream2, path, str(tmp_path / "ck2"))
    q2.awaitTermination(120)
    rows_after = sorted(
        map(repr, spark.read.parquet(f"{path}/positions").collect())
    )
    assert rows_after == rows_before
    assert [tuple(r) for r in rt.phrase_search_indexed(spark, path, PHRASE).collect()] == want
