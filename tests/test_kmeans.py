"""Fixed-seed Lloyd k-means (r11): clustering quality + fold modes.

Cross-engine training-trajectory parity is pinned by the DuckDB oracle
(tests/test_oracle_parity.py::[cluster_kmeans_fixed]). This module pins
the rest: planted separable blobs are recovered exactly, the scale fold
agrees with the parity fold, and an unwinnable seed (duplicate of a
lower-id seed — every tie breaks away from it) keeps its previous
centroid instead of going NaN.
"""

from __future__ import annotations

import hashlib

from sql_data_warehouse_and_analytics_project_spark.operators import kmeans as km


def _blob_corpus(spark, per_cluster=40, dim=8, spread=0.05):
    """4 planted blobs at distance-2 corners, md5-jittered points.
    vec_ids INTERLEAVE across blobs (vid = j*4 + blob), so the 4 lowest
    ids — the fixed seeding — land one per blob: the reasonable-init
    regime where Lloyd's convergence to the planted structure is the
    contract (from a degenerate all-in-one-blob init, Lloyd can and does
    settle in a local optimum — not asserted here)."""
    rows = []
    corners = [
        [0.0] * dim,
        [2.0] + [0.0] * (dim - 1),
        [0.0, 2.0] + [0.0] * (dim - 2),
        [0.0, 0.0, 2.0] + [0.0] * (dim - 3),
    ]
    for c_i, corner in enumerate(corners):
        for j in range(per_cluster):
            jit = [
                (int(hashlib.md5(f"{c_i}:{j}:{d}".encode()).hexdigest()[:6], 16)
                 / 0xFFFFFF - 0.5) * spread
                for d in range(dim)
            ]
            rows.append((j * 4 + c_i, [corner[d] + jit[d] for d in range(dim)], c_i))
    return spark.createDataFrame(
        rows, "vec_id bigint, v array<double>, truth int"
    )


def test_kmeans_recovers_planted_blobs(spark):
    """One seed per blob (interleaved ids) → 3 Lloyd rounds must recover
    the planted structure exactly: every predicted cluster pure and all
    four blobs separated."""
    vecs = _blob_corpus(spark)
    w = km.kmeans_fixed(vecs.select("vec_id", "v"), k=4, iters=3)
    got = km.assign_final(vecs.select("vec_id", "v"), w)
    joined = {r["vec_id"]: r["cluster"] for r in got.collect()}
    truth = {r["vec_id"]: r["truth"] for r in vecs.collect()}
    by_cluster = {}
    for vid, c in joined.items():
        by_cluster.setdefault(c, set()).add(truth[vid])
    assert all(len(s) == 1 for s in by_cluster.values()), by_cluster
    assert len(by_cluster) == 4, by_cluster


def test_kmeans_scale_fold_matches_parity_fold(spark):
    vecs = _blob_corpus(spark).select("vec_id", "v")
    wp = km.kmeans_fixed(vecs, k=4, iters=3, fold="parity")
    ws = km.kmeans_fixed(vecs, k=4, iters=3, fold="scale")
    flat_p = [x for c in wp for x in c]
    flat_s = [x for c in ws for x in c]
    assert max(abs(a - b) for a, b in zip(flat_p, flat_s)) < 1e-9


def test_kmeans_unwinnable_seed_keeps_position(spark):
    """vec 0 and vec 1 identical → seeds 0 and 1 coincide; every point
    ties between them and the tie breaks to cluster 0, so cluster 1
    never gains a member. Its centroid must stay at the seed (no NaN,
    no crash), and no point may be assigned to it."""
    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0])] + [
        (i, [1.0 + 0.01 * i, 1.0]) for i in range(2, 12)
    ]
    vecs = spark.createDataFrame(rows, "vec_id bigint, v array<double>")
    w = km.kmeans_fixed(vecs, k=2, iters=3)
    assert w[1] == [0.0, 0.0], w
    assert all(x == x for c in w for x in c)  # no NaN
    # the kept seed may legitimately WIN the final assignment for the
    # points sitting exactly on it (cluster 0's centroid drifted toward
    # the mass at (1, 1)) — assert that consistent outcome, not absence
    got = {r["vec_id"]: r for r in km.assign_final(vecs, w).collect()}
    assert got[0]["cluster"] == 1 and got[0]["dist"] == 0.0
    assert got[1]["cluster"] == 1 and got[1]["dist"] == 0.0
    assert all(got[i]["cluster"] == 0 for i in range(2, 12)), got
