"""MMR re-rank (retrieval.py): pure-Python replay, diversification
semantics, tie determinism, partition invariance, registered-key shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sql_data_warehouse_and_analytics_project_spark.operators.retrieval import (
    mmr_rerank,
)


def _mk(spark, cands, vecs):
    c = spark.createDataFrame(cands, "query_id bigint, doc_id bigint, rel double")
    v = spark.createDataFrame(vecs, "doc_id bigint, embedding array<double>")
    return c, v


def _python_mmr(cands, vecs, k, lam):
    """Independent greedy reference over (doc_id, rel) + vec dict."""
    pool = sorted(cands, key=lambda t: t[1])  # by doc_id
    ids = [d for _, d, _ in pool]
    rel = [r for _, _, r in pool]
    V = []
    dim = next((len(vecs[d]) for d in ids if vecs.get(d)), 1)
    for d in ids:
        v = vecs.get(d) or [0.0] * dim
        n = math.sqrt(sum(x * x for x in v))
        V.append([x / n for x in v] if n > 0 else [0.0] * len(v))
    lo, hi = min(rel), max(rel)
    rel_n = [(r - lo) / (hi - lo) if hi > lo else 0.5 for r in rel]
    sims = [[sum(a * b for a, b in zip(V[i], V[j])) for j in range(len(ids))] for i in range(len(ids))]
    alive = [True] * len(ids)
    sel: list[int] = []
    out = []
    for step in range(min(k, len(ids))):
        best, best_s = None, None
        for i in range(len(ids)):
            if not alive[i]:
                continue
            red = max((sims[i][j] for j in sel), default=0.0)
            s = lam * rel_n[i] - (1 - lam) * red
            if best is None or s > best_s:
                best, best_s = i, s
        alive[best] = False
        sel.append(best)
        out.append((step + 1, ids[best], round(best_s, 6)))
    return out


def test_mmr_matches_python_reference(spark):
    cands = [(0, d, float(10 - d)) for d in range(8)]
    vecs = {d: [math.sin(d * 1.7 + i) for i in range(4)] for d in range(8)}
    c, v = _mk(spark, cands, [(d, vecs[d]) for d in vecs])
    got = [
        (r["rank"], r["doc_id"], r["mmr_score"])
        for r in mmr_rerank(c, v, k=5, lam=0.7).collect()
    ]
    assert got == _python_mmr(cands, vecs, 5, 0.7)


def test_mmr_diversifies_near_duplicates(spark):
    """doc 1 and doc 2 are near-identical high-relevance hits; pure
    relevance ranks them 1-2, MMR defers the duplicate below the
    orthogonal doc 3."""
    cands = [(0, 1, 10.0), (0, 2, 9.9), (0, 3, 5.0)]
    c, v = _mk(
        spark,
        cands,
        [(1, [1.0, 0.0, 0.01]), (2, [1.0, 0.0, 0.0]), (3, [0.0, 1.0, 0.0])],
    )
    order = [r["doc_id"] for r in mmr_rerank(c, v, k=3, lam=0.5).collect()]
    assert order == [1, 3, 2]  # relevance-only would be [1, 2, 3]
    # λ = 1 degenerates to pure relevance
    order_rel = [r["doc_id"] for r in mmr_rerank(c, v, k=3, lam=1.0).collect()]
    assert order_rel == [1, 2, 3]


def test_mmr_tie_breaks_to_smallest_doc_id_and_missing_vectors(spark):
    cands = [(0, 7, 1.0), (0, 3, 1.0), (0, 5, 1.0)]
    # no vectors at all -> similarity 0, all scores tied -> doc_id order
    c, v = _mk(spark, cands, [])
    order = [r["doc_id"] for r in mmr_rerank(c, v, k=3, lam=0.7).collect()]
    assert order == [3, 5, 7]


def test_mmr_partition_invariance_and_multi_query(spark):
    cands = [(q, d, float((d * 7 + q * 3) % 11)) for q in range(3) for d in range(12)]
    vecs = [(d, [math.cos(d + i) for i in range(6)]) for d in range(12)]
    c, v = _mk(spark, cands, vecs)
    a = mmr_rerank(c.coalesce(1), v, k=4).collect()
    b = mmr_rerank(c.repartition(9), v.repartition(5), k=4).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    by_q = {}
    for r in a:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(ranks == [1, 2, 3, 4] for ranks in by_q.values())

    with pytest.raises(ValueError):
        mmr_rerank(c, v, k=0)
    with pytest.raises(ValueError):
        mmr_rerank(c, v, lam=1.5)


def test_registered_mmr_key_shape(spark):
    from sql_data_warehouse_and_analytics_project_spark.registry import all_queries

    rq = all_queries()["retrieval_mmr_rerank"]
    rows = rq.fn(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 10
    assert [r["rank"] for r in rows] == list(range(1, 11))
    assert len({r["doc_id"] for r in rows}) == 10
    # rank 1 is the raw-relevance argmax (empty selected set)
    assert rows[0]["rel"] == max(r["rel"] for r in rows)
