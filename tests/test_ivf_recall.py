"""IVF recall-audit semantics: planted geometric clusters → recall 1.0;
the unstructured registered fixture's mid recall is the audit's finding,
not a defect (per-label centroids are not geometric clusters there).
"""

from __future__ import annotations

import math

from sql_data_warehouse_and_analytics_project_spark.operators import similarity as sim


def _clustered_embs(spark, n_clusters=4, per=30, d=16):
    """Well-separated clusters: one orthogonal axis per cluster plus a tiny
    deterministic jitter — every vector's true neighbors share its label."""
    rows = []
    vid = 0
    for c in range(n_clusters):
        for t in range(per):
            v = [0.0] * d
            v[c] = 1.0
            v[(c + n_clusters + t) % d] += 0.05 * math.sin(t + c)
            rows.append((vid, v, c))
            vid += 1
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")


def test_planted_clusters_full_recall(spark):
    """With true geometric clusters aligned to labels, probing 3 of 4
    lists must recover the entire exact top-10 for every query."""
    embs = _clustered_embs(spark)
    got = sim.ivf_recall_audit(embs, k=10, n_probes=3, query_mod=50).collect()
    assert len(got) == 3  # vec_ids 0, 50, 100
    for r in got:
        assert r["n_hits"] == 10 and r["recall"] == 1.0, r


def test_single_probe_stays_within_own_cluster(spark):
    """n_probes=1: the query's own cluster holds its 10 nearest (29
    same-cluster companions), so recall stays 1.0 — and shrinking the
    cluster below k forces the miss the audit exists to expose."""
    embs = _clustered_embs(spark, per=30)
    got = sim.ivf_recall_audit(embs, k=10, n_probes=1, query_mod=60).collect()
    for r in got:
        assert r["recall"] == 1.0, r
    small = _clustered_embs(spark, per=8)  # 7 companions < k=10
    got_small = sim.ivf_recall_audit(small, k=10, n_probes=1, query_mod=8).collect()
    assert all(r["n_hits"] <= 7 for r in got_small)
    assert any(r["n_hits"] < 10 for r in got_small)


def test_hits_bounded_by_k(spark):
    embs = _clustered_embs(spark, n_clusters=2, per=12)
    got = sim.ivf_recall_audit(embs, k=5, n_probes=2, query_mod=10).collect()
    assert got and all(0 <= r["n_hits"] <= 5 for r in got)


def test_silhouette_planted_clusters_near_one_mixed_near_zero(spark):
    """Well-separated orthogonal clusters score near 1; scrambling the
    labels onto the SAME geometry collapses the score toward ≤ 0 — the
    coherence signal the metric exists to give."""
    embs = _clustered_embs(spark, n_clusters=4, per=20)
    good = sim.silhouette_by_label(embs).collect()
    assert all(r["mean_silhouette"] > 0.9 for r in good), good
    scrambled = embs.selectExpr("vec_id", "embedding", "CAST(vec_id % 4 AS INT) AS label")
    bad = sim.silhouette_by_label(scrambled).collect()
    assert all(r["mean_silhouette"] < 0.1 for r in bad), bad
