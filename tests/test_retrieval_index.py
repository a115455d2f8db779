"""Persisted inverted index + indexed BM25 (r11).

Pins: (1) the postings-join scoring path answers exactly like the
array-filter ``bm25_topk`` path on the same query, (2) the persisted
index serves the SAME rows as the in-memory postings path, (3) a search
against the persisted layout prunes to the query terms' bucket
partitions (PartitionFilters), never scanning the whole postings table.
"""


from __future__ import annotations

import pytest

import os

from pyspark.sql import functions as F

from sql_data_warehouse_and_analytics_project_spark.operators import retrieval as rt
from sql_data_warehouse_and_analytics_project_spark.plans import audit
from sql_data_warehouse_and_analytics_project_spark.sources import tpch

from conftest import SF_DIR


def _docs(spark):
    return tpch.load(spark, SF_DIR, "documents")


def test_postings_path_equals_array_filter_path(spark):
    """Same terms, same corpus: the postings-join shape and the per-term
    array-filter shape are the same math — scores agree to the 6-dp output
    surface (fold order differs: sorted-term vs literal-term order)."""
    docs = _docs(spark)
    a = {r["doc_id"]: r["bm25"] for r in rt.bm25_topk(docs, rt._BM25_TERMS, k=500).collect()}
    b = {
        r["doc_id"]: r["bm25"]
        for r in rt.bm25_postings_topk(docs, rt._BM25_TERMS, k=500).collect()
    }
    assert set(a) == set(b)
    for d in a:
        assert abs(a[d] - b[d]) <= 2e-6, (d, a[d], b[d])


def test_persisted_index_serves_identical_answers(spark, tmp_path):
    """build → search must reproduce the in-memory postings path row for
    row: df and stats read back from the index are the exact values the
    in-memory path computes."""
    docs = _docs(spark)
    path = str(tmp_path / "invidx")
    rt.build_inverted_index(docs, path, n_buckets=16)
    got = rt.bm25_search_indexed(spark, path, rt._IDX_TERMS).collect()
    want = rt.bm25_postings_topk(docs, rt._IDX_TERMS).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_index_layout_and_df_values(spark, tmp_path):
    """Bucket partition dirs exist, the spark-side bucket column matches
    the driver-side hash used at query time, and stored df equals a direct
    recount from the corpus."""
    docs = _docs(spark)
    path = str(tmp_path / "invidx2")
    nb = 8
    rt.build_inverted_index(docs, path, n_buckets=nb)
    dirs = {d for d in os.listdir(f"{path}/postings") if d.startswith("bucket=")}
    assert dirs and dirs <= {f"bucket={i}" for i in range(nb)}
    terms = spark.read.parquet(f"{path}/terms")
    sample = terms.limit(50).collect()
    for r in sample:
        assert r["bucket"] == rt._term_bucket_py(r["term"], nb), r
    # df for one known term equals a direct corpus recount
    t = "merge"
    stored = terms.filter(F.col("term") == t).select("df").collect()
    direct = (
        docs.filter(
            F.array_contains(
                F.transform(
                    F.split(F.trim(F.col("text")), r"\s+"), lambda x: F.lower(x)
                ),
                t,
            )
        ).count()
    )
    assert stored and stored[0]["df"] == direct


def test_indexed_search_prunes_partitions(spark, tmp_path):
    """The postings scan of an indexed search carries a bucket
    PartitionFilter — the 100 TB property: query cost scales with the
    queried buckets' files, not the corpus."""
    docs = _docs(spark)
    path = str(tmp_path / "invidx3")
    rt.build_inverted_index(docs, path, n_buckets=32)
    q = rt.bm25_search_indexed(spark, path, rt._IDX_TERMS)
    plan = audit.executed_plan(q)
    assert "PartitionFilters" in plan, plan
    seg = plan.split("PartitionFilters")[1][:200]
    assert "bucket" in seg, plan
    # the pruned scan reads at most the terms' buckets, not all 32
    want_buckets = {rt._term_bucket_py(t, 32) for t in rt._IDX_TERMS}
    assert len(want_buckets) < 32
    got = q.collect()
    assert got, "indexed search returned no rows for common terms"


def test_incremental_append_equals_full_rebuild(spark, tmp_path):
    """build(prefix) + append(rest) must serve exactly what build(full)
    serves: identical top-k rows for the fixed query, identical per-term
    df for every term of the appended batch's buckets, and a stats row
    whose merged (n_docs, sum_dl, avgdl) is bit-equal to the full build's."""
    docs = _docs(spark)
    old = docs.filter(F.col("doc_id") % 3 != 0)
    new = docs.filter(F.col("doc_id") % 3 == 0)

    p_inc = str(tmp_path / "inc")
    rt.build_inverted_index(old, p_inc, n_buckets=16)
    rt.append_inverted_index(new, p_inc)

    p_full = str(tmp_path / "full")
    rt.build_inverted_index(docs, p_full, n_buckets=16)

    got = rt.bm25_search_indexed(spark, p_inc, rt._IDX_TERMS).collect()
    want = rt.bm25_search_indexed(spark, p_full, rt._IDX_TERMS).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]

    t_inc = {(r["term"]): r["df"] for r in spark.read.parquet(f"{p_inc}/terms").collect()}
    t_full = {(r["term"]): r["df"] for r in spark.read.parquet(f"{p_full}/terms").collect()}
    assert t_inc == t_full

    s_inc = spark.read.parquet(f"{p_inc}/stats").first()
    s_full = spark.read.parquet(f"{p_full}/stats").first()
    assert (s_inc["n_docs"], s_inc["sum_dl"], s_inc["n_buckets"]) == (
        s_full["n_docs"],
        s_full["sum_dl"],
        s_full["n_buckets"],
    )
    assert s_inc["avgdl"] == s_full["avgdl"]  # bit-equal by construction

    # no staging residue
    assert not os.path.exists(f"{p_inc}/_terms_stage")


@pytest.mark.slow
def test_two_appends_compose(spark, tmp_path):
    """Append is associative over batches: two sequential appends land on
    the same index state as one append of their union."""
    docs = _docs(spark)
    base = docs.filter(F.col("doc_id") % 4 == 0)
    b1 = docs.filter(F.col("doc_id") % 4 == 1)
    b2 = docs.filter(F.col("doc_id") % 4 == 2)

    p_two = str(tmp_path / "two")
    rt.build_inverted_index(base, p_two, n_buckets=8)
    rt.append_inverted_index(b1, p_two)
    rt.append_inverted_index(b2, p_two)

    p_one = str(tmp_path / "one")
    rt.build_inverted_index(base, p_one, n_buckets=8)
    rt.append_inverted_index(b1.unionByName(b2), p_one)

    got = rt.bm25_search_indexed(spark, p_two, rt._IDX_TERMS).collect()
    want = rt.bm25_search_indexed(spark, p_one, rt._IDX_TERMS).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    s_two = spark.read.parquet(f"{p_two}/stats").first()
    s_one = spark.read.parquet(f"{p_one}/stats").first()
    assert tuple(s_two) == tuple(s_one)


@pytest.mark.slow
def test_compaction_shrinks_files_and_preserves_answers(spark, tmp_path):
    """Three appends accumulate one file set per batch inside the touched
    bucket dirs; compaction rewrites to one file per bucket and the served
    top-k is byte-identical before/after."""
    docs = _docs(spark)
    path = str(tmp_path / "cidx")
    rt.build_inverted_index(docs.filter(F.col("doc_id") % 4 == 0), path, n_buckets=8)
    for m in (1, 2, 3):
        rt.append_inverted_index(docs.filter(F.col("doc_id") % 4 == m), path)

    def n_files(table):
        total = 0
        for d in os.listdir(f"{path}/{table}"):
            if d.startswith("bucket="):
                total += sum(
                    1
                    for f in os.listdir(f"{path}/{table}/{d}")
                    if f.endswith(".parquet")
                )
        return total

    before = rt.bm25_search_indexed(spark, path, rt._IDX_TERMS).collect()
    files_before = n_files("postings")
    rt.compact_inverted_index(spark, path)
    after = rt.bm25_search_indexed(spark, path, rt._IDX_TERMS).collect()
    assert [tuple(r) for r in before] == [tuple(r) for r in after]
    assert n_files("postings") < files_before
    # one file per bucket dir after the rewrite
    for table in ("postings", "terms"):
        for d in os.listdir(f"{path}/{table}"):
            if d.startswith("bucket="):
                parqs = [
                    f for f in os.listdir(f"{path}/{table}/{d}") if f.endswith(".parquet")
                ]
                assert len(parqs) == 1, (table, d, parqs)
        assert not os.path.exists(f"{path}/{table}.old")
        assert not os.path.exists(f"{path}/{table}.compacting")
