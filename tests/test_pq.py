"""Product-quantization ANN: recall, determinism, persistence, plan shape.

Oracle parity for ``ann_pq_topk`` (training + encoding + ADC replayed in
DuckDB) runs in tests/test_oracle_parity.py like every registered query.
"""


from __future__ import annotations

import pytest

from conftest import SF_DIR
from pyspark.sql import functions as F

from sql_data_warehouse_and_analytics_project_spark.operators import pq
from sql_data_warehouse_and_analytics_project_spark.plans import audit
from sql_data_warehouse_and_analytics_project_spark.sources import tpch


def _emb(spark):
    return tpch.load(spark, SF_DIR, "embeddings")


def _query_q(spark) -> list[int]:
    row = pq._quantized(_emb(spark)).filter(F.col("vec_id") == 0).select("q").collect()
    return [int(v) for v in row[0]["q"]]


def _exact_topk(spark, query_q, k=10) -> list[int]:
    """Brute-force exact int64 L2 top-k — the baseline PQ is measured against."""
    qcol = F.array(*[F.lit(int(x)) for x in query_q])
    rows = (
        pq._quantized(_emb(spark))
        .filter(F.col("vec_id") != 0)
        .select("vec_id", pq._sqdist_q(F.col("q"), qcol).alias("d"))
        .orderBy(F.asc("d"), F.asc("vec_id"))
        .limit(k)
        .collect()
    )
    return [r["vec_id"] for r in rows]


def test_pq_rerank_recovers_exact_topk(spark):
    """ADC shortlist (compressed domain) + exact re-rank must recover the
    exact top-10 almost perfectly — the production search contract. The
    raw ADC ranking alone is lossy (32 bits/vector); the shortlist size is
    the recall knob."""
    emb = _emb(spark)
    query_q = _query_q(spark)
    cbs = pq.train_pq_codebooks(emb)
    enc = pq.pq_encode(emb, cbs).filter(F.col("vec_id") != 0)
    exact = _exact_topk(spark, query_q, k=10)

    rerank = pq.pq_search_rerank(emb.filter(F.col("vec_id") != 0), enc, query_q, cbs, k=10, shortlist=100)
    got = [r["vec_id"] for r in rerank.collect()]
    recall = len(set(got) & set(exact)) / len(exact)
    assert recall >= 0.8, (recall, got, exact)

    # widening the shortlist can only help: full-width shortlist IS exact
    full = pq.pq_search_rerank(
        emb.filter(F.col("vec_id") != 0), enc, query_q, cbs, k=10, shortlist=10_000
    )
    assert [r["vec_id"] for r in full.collect()] == exact


def test_pq_training_deterministic(spark):
    emb = _emb(spark)
    a = pq.train_pq_codebooks(emb)
    b = pq.train_pq_codebooks(emb)
    assert a == b
    assert len(a) == pq._PQ_M and all(len(m) == pq._PQ_K for m in a)
    assert all(len(cw) == pq._PQ_DSUB for m in a for cw in m)


@pytest.mark.slow
def test_pq_index_roundtrip_and_scan_shape(spark, tmp_path):
    """Persisted index answers identically to the in-memory path, and the
    query-time scan is the plan PQ exists for: zero data shuffles, a
    TakeOrderedAndProject cut, and a ReadSchema that touches only the
    narrow code columns — never the 64-float vector payload."""
    emb = _emb(spark)
    path = str(tmp_path / "pqidx")
    pq.build_pq_index(emb, path)

    cbs = pq.train_pq_codebooks(emb)
    assert pq.load_pq_codebooks(spark, path) == cbs

    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").collect()
    qvec = [float(x) for x in qrow[0]["embedding"]]
    persisted = pq.pq_search(spark, path, qvec, k=11)
    query_q = _query_q(spark)
    memory = pq.pq_adc_topk(pq.pq_encode(emb, cbs), query_q, cbs, k=11)
    assert [tuple(r) for r in persisted.collect()] == [tuple(r) for r in memory.collect()]

    plan = audit.executed_plan(persisted)
    assert audit.data_shuffle_count(plan) == 0, plan
    assert "TakeOrderedAndProject" in plan, plan
    fplan = audit.formatted_plan(persisted)
    for cols in audit.scan_columns(fplan):
        assert "embedding" not in cols, fplan


@pytest.mark.slow
def test_ivfpq_probe_pruning_and_full_probe_exactness(spark, tmp_path):
    """The composed layout: a full-width probe must answer exactly like the
    flat PQ scan (the coarse partitioning is pure layout, not a second
    approximation), and a narrow probe's scan must carry a list_id
    PartitionFilter and never touch the embedding column."""
    emb = _emb(spark)
    path = str(tmp_path / "ivfpq")
    pq.build_ivfpq_index(emb, path, n_lists=4)

    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").collect()
    qvec = [float(x) for x in qrow[0]["embedding"]]
    query_q = _query_q(spark)
    cbs = pq.load_pq_codebooks(spark, path)

    full = pq.ivfpq_search(spark, path, qvec, k=11, n_probes=4)
    flat = pq.pq_adc_topk(pq.pq_encode(emb, cbs), query_q, cbs, k=11)
    assert [tuple(r) for r in full.collect()] == [tuple(r) for r in flat.collect()]

    narrow = pq.ivfpq_search(spark, path, qvec, k=11, n_probes=2)
    plan = audit.executed_plan(narrow)
    assert audit.data_shuffle_count(plan) == 0, plan
    assert "PartitionFilters" in plan and "list_id" in plan.split("PartitionFilters")[1][:120], plan
    fplan = audit.formatted_plan(narrow)
    for cols in audit.scan_columns(fplan):
        assert "embedding" not in cols, fplan
    # narrow-probe results are a subset of the probed cells, still k rows
    assert narrow.count() == 11


@pytest.mark.slow
def test_ivfpq_append_is_lossless_under_stored_models(spark, tmp_path):
    """Appending encodes against the STORED models, so an appended index
    must answer a full-width probe exactly like encoding the whole corpus
    in one pass under those same models — and the staleness audit must
    surface the growth."""
    from sql_data_warehouse_and_analytics_project_spark.operators.similarity import (
        ivf_index_staleness,
    )

    emb = _emb(spark)
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivfpq_inc")
    pq.build_ivfpq_index(even, path, n_lists=4)
    pq.append_ivfpq_index(odd, path)

    assert spark.read.parquet(f"{path}/codes").count() == emb.count()

    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").collect()
    qvec = [float(x) for x in qrow[0]["embedding"]]
    query_q = _query_q(spark)
    cbs = pq.load_pq_codebooks(spark, path)
    got = pq.ivfpq_search(spark, path, qvec, k=10, n_probes=4)
    want = pq.pq_adc_topk(pq.pq_encode(emb, cbs), query_q, cbs, k=10)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]

    stale = ivf_index_staleness(spark, path, table="codes").collect()
    assert sum(r["n_now"] for r in stale) == emb.count()
    assert any(r["growth"] and r["growth"] > 1.0 for r in stale)

    # appending to an untrained index is a hard error
    empty_path = str(tmp_path / "ivfpq_none")
    pq.build_ivfpq_index(emb.filter(F.lit(False)), empty_path)
    try:
        pq.append_ivfpq_index(odd, empty_path)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_pq_empty_corpus(spark, tmp_path):
    emb = _emb(spark).filter(F.lit(False))
    assert pq.train_pq_codebooks(emb) == []
    path = str(tmp_path / "pqempty")
    pq.build_pq_index(emb, path)
    out = pq.pq_search(spark, path, [0.0] * 64, k=5)
    assert out.count() == 0


@pytest.mark.slow
def test_ivfpq_codes_compaction_preserves_answers(spark, tmp_path):
    """Three appends accumulate one file set per batch in each codes
    list dir; compact_ivf_index(table="codes") rewrites to one file per
    list and ivfpq_search answers are byte-identical."""
    import os

    from sql_data_warehouse_and_analytics_project_spark.operators import similarity as sim

    emb = _emb(spark)
    ix = str(tmp_path / "ivfpq_c")
    pq.build_ivfpq_index(emb.filter(F.col("vec_id") % 4 == 0), ix, n_lists=4)
    for m in (1, 2, 3):
        pq.append_ivfpq_index(emb.filter(F.col("vec_id") % 4 == m), ix)

    qrow = emb.filter(F.col("vec_id") == 0).first()
    qvec = [float(x) for x in qrow["embedding"]]
    before = [tuple(r) for r in pq.ivfpq_search(spark, ix, qvec, k=10).collect()]
    sim.compact_ivf_index(spark, ix, table="codes")
    after = [tuple(r) for r in pq.ivfpq_search(spark, ix, qvec, k=10).collect()]
    assert before == after and before

    for d in os.listdir(f"{ix}/codes"):
        if d.startswith("list_id="):
            parqs = [f for f in os.listdir(f"{ix}/codes/{d}") if f.endswith(".parquet")]
            assert len(parqs) == 1, (d, parqs)
    assert not os.path.exists(f"{ix}/codes.old")
