"""Learned-PCA semantics: Gram statistics vs numpy, projection vs an
independent numpy PCA, planted-structure recovery, plan shape."""

from __future__ import annotations

import math

import numpy as np

from sql_data_warehouse_and_analytics_project_spark.operators import pca
from sql_data_warehouse_and_analytics_project_spark.plans import audit
from sql_data_warehouse_and_analytics_project_spark.sources import tpch

from conftest import SF_DIR


def _np_embs(spark):
    rows = tpch.load(spark, SF_DIR, "embeddings").select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r["vec_id"])
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


def test_gram_matrix_equals_numpy(spark):
    x = _np_embs(spark)
    q = np.floor(x * pca.GRAM_SCALE).astype(np.int64)
    want = q.T @ q
    got = pca.gram_matrix(tpch.load(spark, SF_DIR, "embeddings")).collect()
    assert len(got) == pca.DIM * (pca.DIM + 1) // 2
    for r in got:
        assert r["s"] == want[r["i"], r["j"]], (r["i"], r["j"])


def test_model_components_orthonormal(spark):
    comps, mean = pca.pca_model(tpch.load(spark, SF_DIR, "embeddings"), k=8)
    c = np.array(comps)
    assert c.shape == (8, pca.DIM) and len(mean) == pca.DIM
    gram = c @ c.T
    assert np.allclose(gram, np.eye(8), atol=1e-9)


def test_projection_matches_independent_numpy_pca(spark):
    """Replicate the whole chain in numpy from the raw parquet — quantized
    covariance, eigh, the sign convention, float projection — and demand
    agreement to 1e-9 (fold order differs from numpy.dot, so not bitwise)."""
    x = _np_embs(spark)
    q = np.floor(x * pca.GRAM_SCALE)
    n = len(q)
    mean_q = q.mean(axis=0)
    cov = (q.T @ q) / n - np.outer(mean_q, mean_q)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][: pca.PCA_K]
    comps = vecs[:, order].T.copy()
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    want = (x - mean_q / pca.GRAM_SCALE) @ comps.T

    embs = tpch.load(spark, SF_DIR, "embeddings")
    model_comps, model_mean = pca.pca_model(embs)
    got_rows = pca.pca_project(embs, model_comps, model_mean).collect()
    got = {r["vec_id"]: r["y"] for r in got_rows}
    for vid in range(n):
        assert max(abs(a - b) for a, b in zip(got[vid], want[vid])) < 1e-9


def test_first_component_recovers_planted_direction(spark):
    """Variance planted along one unit direction: the top component must
    align with it (|cos| > 0.99)."""
    d = pca.DIM
    rng_v = np.array([math.sin(i * 0.7) for i in range(d)])
    v = rng_v / np.linalg.norm(rng_v)
    rows = []
    for t in range(200):
        scale = (t % 21 - 10) / 10.0  # symmetric spread in [-1, 1]
        noise = np.array([math.cos(3.1 * i + t) for i in range(d)]) * 0.01
        rows.append((t, 0, (scale * v + noise).tolist()))
    embs = spark.createDataFrame(rows, "vec_id bigint, label int, embedding array<float>")
    comps, _ = pca.pca_model(embs, k=2)
    cos = abs(float(np.dot(comps[0], v)))
    assert cos > 0.99, cos


def test_gram_shuffle_is_combined_mapside_and_projection_shuffle_free(spark):
    embs = tpch.load(spark, SF_DIR, "embeddings")
    gplan = audit.formatted_plan(pca.gram_matrix(embs))
    # partial aggregation below the exchange (smaller node number in the
    # detail listing): the d² explode never crosses the wire un-combined
    import re

    partial_at = gplan.index("partial_sum")
    n_partial = int(re.findall(r"\((\d+)\) HashAggregate", gplan[:partial_at])[-1])
    m = re.search(r"\((\d+)\) Exchange\nInput \[3\]: \[i#", gplan)
    assert m, gplan
    assert n_partial < int(m.group(1))
    comps, mean = pca.pca_model(embs, k=4)
    pplan = audit.formatted_plan(pca.pca_project(embs, comps, mean))
    assert audit.data_shuffle_count(pplan) == 0


def test_correlation_matrix_planted_and_numpy(spark):
    """Planted copies: an identical dimension pair gives r=1.0, a negated
    pair r=-1.0; every entry matches the same formula evaluated in numpy
    over the quantized values."""
    d = pca.DIM
    rows = []
    for t in range(60):
        base = [math.sin(0.3 * t * (i + 1)) for i in range(d)]
        base[1] = base[0]          # identical pair (0, 1)
        base[2] = -base[0]         # negated pair (0, 2)
        rows.append((t, 0, base))
    embs = spark.createDataFrame(rows, "vec_id bigint, label int, embedding array<float>")
    got = {(r["i"], r["j"]): r["r"] for r in pca.correlation_matrix(embs).collect()}
    assert got[(0, 1)] == 1.0
    assert got[(0, 2)] == -1.0

    x = np.array([r[2] for r in rows], dtype=np.float64)
    q = np.floor(np.float64(np.float32(x)) * pca.GRAM_SCALE)  # float-col round trip
    n = float(len(q))
    s = q.sum(axis=0)
    g = q.T @ q
    for (i, j), r in got.items():
        num = n * g[i, j] - s[i] * s[j]
        den = math.sqrt(n * g[i, i] - s[i] * s[i]) * math.sqrt(n * g[j, j] - s[j] * s[j])
        want = round(num / den, 6) if den else None
        assert r == want, (i, j, r, want)
