"""OPQ (learned-rotation PQ) semantics and the recall-upgrade guarantee.

``ann_opq_topk`` registers rows-only (driver-side eigen phase, the
``embed_pca_project`` precedent), so these tests are its proof: rotation
orthonormality / distance preservation, balanced eigenvalue allocation,
and recall@10 ≥ flat PQ on both the planted clustered corpus
(tests/test_scale_stress.py fixture, per the r13 VERDICT ask) and a
deterministic anisotropic corpus where the rotation's win is large.
"""


from __future__ import annotations

import pytest

import math

from pyspark.sql import functions as F

from sql_data_warehouse_and_analytics_project_spark.operators import opq, pq, similarity


def _recall_pair(spark, emb, m_subs, dsub, qids):
    """(pq_recall, opq_recall) @10 against exact squared-L2 ground truth."""
    import numpy as np

    rows = emb.collect()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}
    arr = {i: np.array(v) for i, v in vecs.items()}

    def exact_topk(qid, k=10):
        q = arr[qid]
        d = sorted((float(((q - v) ** 2).sum()), i) for i, v in arr.items() if i != qid)
        return {i for _, i in d[:k]}

    cb = pq.train_pq_codebooks(emb, m_subs=m_subs, dsub=dsub)
    enc_pq = pq.pq_encode(emb, cb, dsub=dsub).cache()
    rot, mean = opq.opq_rotation(emb, m_subs, dsub)
    rotated = opq.opq_rotate(emb, rot, mean)
    ocb = pq.train_pq_codebooks(rotated, m_subs=m_subs, dsub=dsub)
    enc_opq = pq.pq_encode(rotated, ocb, dsub=dsub).cache()
    rp = ro = 0.0
    for qid in qids:
        truth = exact_topk(qid)
        qq = [int(math.floor(x * similarity._SCALE)) for x in vecs[qid]]
        got_pq = {
            r["vec_id"]
            for r in pq.pq_adc_topk(
                enc_pq.filter(F.col("vec_id") != qid), qq, cb, k=10, dsub=dsub
            ).collect()
        }
        got_opq = {
            r["vec_id"]
            for r in opq.opq_adc_topk(
                enc_opq.filter(F.col("vec_id") != qid),
                vecs[qid], rot, mean, ocb, k=10, dsub=dsub,
            ).collect()
        }
        rp += len(truth & got_pq) / 10
        ro += len(truth & got_opq) / 10
    enc_pq.unpersist()
    enc_opq.unpersist()
    return rp / len(qids), ro / len(qids)


def _anisotropic(spark, n=2000, d=64, seed=7):
    """Deterministic low-effective-rank corpus: decaying-variance latent
    coordinates mixed into all d dims by a fixed orthogonal matrix — the
    geometry real embedding corpora have and raw-axis PQ mishandles."""
    import numpy as np

    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    scales = np.array([2.0 * (0.75 ** j) for j in range(d)])
    x = (rng.standard_normal((n, d)) * scales) @ q.T
    return spark.createDataFrame(
        [(int(i), int(i % 5), [float(v) for v in x[i]]) for i in range(n)],
        "vec_id bigint, label int, embedding array<float>",
    ).cache()


def test_rotation_is_orthonormal_and_allocation_balanced(spark):
    emb = _anisotropic(spark, n=400)
    rot, mean = opq.opq_rotation(emb, m_subs=8, dsub=8)
    import numpy as np

    r = np.array(rot)
    assert r.shape == (64, 64)
    assert np.allclose(r @ r.T, np.eye(64), atol=1e-8)
    assert len(mean) == 64
    # allocation is a permutation of all 64 principal directions
    perm = opq._allocate_dims(list(range(64, 0, -1)), 8, 8)
    assert sorted(perm) == list(range(64))
    # descending values: greedy balanced-product puts the 8 largest in 8
    # DIFFERENT subspaces (one per bucket before any bucket gets a second)
    buckets = [perm[b * 8 : (b + 1) * 8] for b in range(8)]
    top8 = set(range(8))
    assert all(len(top8 & set(b)) == 1 for b in buckets)


def test_rotation_preserves_exact_neighbors(spark):
    """y = R(x − μ) with orthonormal R preserves pairwise L2 — exact
    top-5 in the rotated space must equal the raw-space top-5."""
    import numpy as np

    emb = _anisotropic(spark, n=300)
    rot, mean = opq.opq_rotation(emb, m_subs=8, dsub=8)
    raw = {r["vec_id"]: np.array([float(x) for x in r["embedding"]]) for r in emb.collect()}
    rotated = {
        r["vec_id"]: np.array([float(x) for x in r["embedding"]])
        for r in opq.opq_rotate(emb, rot, mean).collect()
    }
    for qid in (0, 17, 123):
        t_raw = [i for _, i in sorted((float(((raw[qid] - v) ** 2).sum()), i) for i, v in raw.items() if i != qid)[:5]]
        t_rot = [i for _, i in sorted((float(((rotated[qid] - v) ** 2).sum()), i) for i, v in rotated.items() if i != qid)[:5]]
        assert t_raw == t_rot, qid


@pytest.mark.slow
def test_opq_recall_beats_flat_pq_on_anisotropic_corpus(spark):
    """The headline guarantee: on the decaying-variance mixed corpus the
    learned rotation must deliver a LARGE recall gap (measured ~0.35 vs
    ~0.70 at these seeds), and never fall below flat PQ."""
    emb = _anisotropic(spark, n=2000)
    rec_pq, rec_opq = _recall_pair(spark, emb, 8, 8, list(range(0, 2000, 200)))
    emb.unpersist()
    assert rec_opq >= rec_pq
    assert rec_opq >= rec_pq + 0.15, (rec_pq, rec_opq)
    assert rec_opq >= 0.5, rec_opq


def test_opq_recall_not_below_flat_pq_on_planted_clusters(spark):
    """On tests/test_scale_stress.py's planted blob corpus (the r13
    VERDICT's named fixture) the two quantizers are statistically tied —
    OPQ must at minimum not lose."""
    from test_scale_stress import _vec_corpus

    emb = _vec_corpus(spark, 1000).cache()
    rec_pq, rec_opq = _recall_pair(spark, emb, 8, 4, list(range(0, 1000, 100)))
    emb.unpersist()
    assert rec_opq >= rec_pq, (rec_pq, rec_opq)


@pytest.mark.slow
def test_ann_opq_topk_shape_and_determinism(spark):
    """The registered rows-only key: 10 rows, stable schema, deterministic
    across two runs, and its neighbor set differs from naive ADC only by
    rotation (both are ADC scans of the same corpus)."""
    from conftest import SF_DIR

    a = opq.ann_opq_topk(spark, SF_DIR)
    assert a.columns == ["vec_id", "label", "adist"]
    r1 = [tuple(r) for r in a.collect()]
    r2 = [tuple(r) for r in opq.ann_opq_topk(spark, SF_DIR).collect()]
    assert r1 == r2 and len(r1) == 10
    assert all(r[0] != 0 for r in r1)  # the query vector is excluded


def _axis_variance(spark, n=1500, d=64, seed=11):
    """Axis-ALIGNED anisotropy: dims 0..7 carry ~all the variance, dims
    8..63 are near-noise — the exact geometry where contiguous-slice PQ
    wastes subspace 0 on an 8-dim spread while subspaces 1..7 quantize
    nothing, and a variance-balancing permutation fixes it."""
    import numpy as np

    rng = np.random.default_rng(seed)
    scales = np.array([2.0] * 8 + [0.05] * (d - 8))
    x = rng.standard_normal((n, d)) * scales
    return spark.createDataFrame(
        [(int(i), int(i % 5), [float(v) for v in x[i]]) for i in range(n)],
        "vec_id bigint, label int, embedding array<float>",
    ).cache()


def test_snake_permutation_spreads_high_variance_dims(spark):
    """Each subspace must receive exactly one of the 8 highest-variance
    dims (snake deals one per bucket per round), and the permutation is a
    bijection over all 64 dims."""
    emb = _axis_variance(spark, n=400)
    perm = opq.variance_snake_permutation(emb, 8, 8)
    emb.unpersist()
    assert sorted(perm) == list(range(64))
    hi = set(range(8))  # dims 0..7 planted with 40x the scale
    for sub in range(8):
        got = set(perm[sub * 8 : (sub + 1) * 8])
        assert len(got & hi) == 1, (sub, got & hi)


def test_permute_embedding_preserves_exact_distances(spark):
    """Axis permutation is orthogonal: exact top-5 neighbor sets are
    identical in raw and permuted coordinates."""
    import numpy as np

    emb = _axis_variance(spark, n=300)
    perm = opq.variance_snake_permutation(emb, 8, 8)
    raw = {r["vec_id"]: np.array([float(x) for x in r["embedding"]]) for r in emb.collect()}
    permuted = {
        r["vec_id"]: np.array([float(x) for x in r["embedding"]])
        for r in opq.permute_embedding(emb, perm).collect()
    }
    emb.unpersist()
    for qid in (0, 42, 255):
        t_raw = [i for _, i in sorted((float(((raw[qid] - v) ** 2).sum()), i) for i, v in raw.items() if i != qid)[:5]]
        t_perm = [i for _, i in sorted((float(((permuted[qid] - v) ** 2).sum()), i) for i, v in permuted.items() if i != qid)[:5]]
        assert t_raw == t_perm, qid


def test_perm_recall_audit_beats_flat_on_axis_variance_corpus(spark):
    """The oracle-backed audit's reason to exist: on the axis-aligned
    anisotropic corpus, snake-permuted PQ must beat the identity
    permutation (flat PQ) through the SAME audit path, and recalls are
    well-formed (n_hits/k in [0,1], one row per query)."""
    emb = _axis_variance(spark, n=1500)
    flat = {
        r["query_id"]: r["recall"]
        for r in opq.opq_perm_recall_audit(emb, query_mod=150, perm=list(range(64))).collect()
    }
    snake = {
        r["query_id"]: r["recall"]
        for r in opq.opq_perm_recall_audit(emb, query_mod=150).collect()
    }
    emb.unpersist()
    assert set(flat) == set(snake) and len(snake) == 10
    assert all(0.0 <= v <= 1.0 for v in snake.values())
    mean_flat = sum(flat.values()) / len(flat)
    mean_snake = sum(snake.values()) / len(snake)
    assert mean_snake > mean_flat, (mean_flat, mean_snake)
