"""Gradient-descent LR classifier (r11): training quality + fold modes.

Cross-engine training parity is pinned by the DuckDB oracle
(tests/test_oracle_parity.py::[text_lr_langid_en] — the unrolled-CTE
twin). This module pins what the oracle can't: the model actually
LEARNS (separates the classes better than chance), the loss decreases
over iterations, and the scale-mode fold agrees with the parity-mode
fold to float-association tolerance.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_data_warehouse_and_analytics_project_spark.operators import lr as lrm
from sql_data_warehouse_and_analytics_project_spark.sources import tpch

from conftest import SF_DIR


def _feats(spark):
    docs = tpch.load(spark, SF_DIR, "documents")
    return lrm.hashed_features(docs, label=(F.col("lang") == "en"))


def _auc(rows) -> float:
    """Exact Mann-Whitney AUC over (y, score) rows."""
    pos = sorted(r["score"] for r in rows if r["y"] == 1)
    neg = sorted(r["score"] for r in rows if r["y"] == 0)
    assert pos and neg
    import bisect

    wins = 0.0
    for s in pos:
        lo = bisect.bisect_left(neg, s)
        hi = bisect.bisect_right(neg, s)
        wins += lo + 0.5 * (hi - lo)
    return wins / (len(pos) * len(neg))


def test_lr_learns_separation(spark):
    """12 GD rounds over 64 hashed buckets must (near-)separate a planted
    separable corpus: positives draw from one deterministic token
    vocabulary, negatives from a disjoint one. (The sf documents table is
    NOT asserted on — its five langs share one 31-token vocabulary, so
    lang is barely encoded there; the learnability property belongs to
    the operator, not that dataset.)"""
    import hashlib

    def tok(space, i):
        return hashlib.md5(f"{space}:{i}".encode()).hexdigest()[:5]

    rows = []
    for d in range(200):
        space = "pos" if d % 2 == 0 else "neg"
        text = " ".join(tok(space, (d * 7 + j) % 40) for j in range(30))
        rows.append((d, text, space))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    feats = lrm.hashed_features(docs, label=(F.col("lang") == "pos"))
    w = lrm.train_lr(feats)
    auc = _auc(lrm.score_lr(feats, w).collect())
    assert auc >= 0.95, auc


def test_lr_loss_decreases(spark):
    """Full-batch GD on a convex loss with this lr must strictly reduce
    the training loss from the zero init after the first iteration and
    never blow up: loss(w_12) < loss(w_1) < loss(w_0)."""
    feats = _feats(spark).persist()

    def loss(w):
        p = lrm._fast_sigmoid(lrm._margin(w))
        # squared error against the 0/1 label (the fast-sigmoid link is
        # not the canonical logit, so use a link-free loss as the meter)
        return (
            feats.select(((p - F.col("y")) * (p - F.col("y"))).alias("e"))
            .agg(F.avg("e"))
            .first()[0]
        )

    l0 = loss([0.0] * lrm._D)
    l1 = loss(lrm.train_lr(feats, iters=1))
    l12 = loss(lrm.train_lr(feats, iters=12))
    assert l1 < l0, (l1, l0)
    assert l12 < l1, (l12, l1)
    feats.unpersist()


def test_lr_scale_fold_matches_parity_fold(spark):
    """The production fold (plain partial-agg SUM) and the oracle fold
    (doc-ordered list reduce) differ only by float re-association —
    trained weights agree to 1e-9 and scores to the 6dp output surface."""
    feats = _feats(spark).persist()
    wp = lrm.train_lr(feats, fold="parity")
    ws = lrm.train_lr(feats, fold="scale")
    assert max(abs(a - b) for a, b in zip(wp, ws)) < 1e-9, (wp, ws)
    sp = {r["doc_id"]: r["score"] for r in lrm.score_lr(feats, wp).collect()}
    ss = {r["doc_id"]: r["score"] for r in lrm.score_lr(feats, ws).collect()}
    assert set(sp) == set(ss)
    assert all(abs(sp[d] - ss[d]) <= 1e-6 for d in sp)
    feats.unpersist()


def test_lr_langid_label_survives_null_lang(spark):
    """ADVICE r11: a NULL lang used to make the bare (lang == 'en') label
    NULL — the gradient fold went NULL and the driver-side weight update
    crashed with a TypeError — while the oracle's CASE WHEN mapped it to
    0.0. The explicit when/otherwise label must train cleanly and treat
    NULL lang exactly as non-English."""
    from pyspark.sql import functions as F

    from sql_data_warehouse_and_analytics_project_spark.operators import lr

    docs = spark.createDataFrame(
        [
            (1, "en", "the quick brown fox jumps over the lazy dog"),
            (2, None, "der schnelle braune fuchs springt"),
            (3, "de", "der schnelle braune fuchs springt"),
            (4, "en", "a dog and a fox and a log"),
        ],
        "doc_id long, lang string, text string",
    )
    label = F.when(F.col("lang") == "en", F.lit(1.0)).otherwise(F.lit(0.0))
    feats = lr.hashed_features(docs, label=label)
    w = lr.train_lr(feats, iters=3, fold="parity")
    assert all(isinstance(x, float) and x == x for x in w)
    scored = {r["doc_id"]: r for r in lr.score_lr(feats, w).collect()}
    # NULL lang folded to the negative class, identically to its 'de' twin
    assert scored[2]["y"] == 0 and scored[3]["y"] == 0
    assert scored[2]["score"] == scored[3]["score"]


def test_calibration_bins_and_ece_hand_computed(spark):
    """Planted scored frame: bin 9 perfectly calibrated (gap 0), bin 2
    maximally off (predicts 0.2, rate 1.0) — bins and the doc-weighted
    ECE match hand arithmetic."""
    from sql_data_warehouse_and_analytics_project_spark.operators.lr import (
        calibration_bins,
        calibration_ece,
    )

    rows = (
        # bin 9: four docs at 0.9, three positive... use score 0.75 for an
        # exactly-representable double: bin 7, mean 0.75, rate 0.75 → gap 0
        [(i, 1, 0.75) for i in range(3)]
        + [(3, 0, 0.75)]
        # bin 2: two docs at 0.25, both positive → gap 0.75
        + [(10, 1, 0.25), (11, 1, 0.25)]
        # score 1.0 clamps into bin 9
        + [(20, 1, 1.0)]
    )
    scored = spark.createDataFrame(rows, "doc_id bigint, y bigint, score double")
    bins = {r["bin"]: r for r in calibration_bins(scored).collect()}
    assert sorted(bins) == [2, 7, 9]
    assert bins[7]["n_docs"] == 4 and bins[7]["abs_gap"] == 0.0
    assert bins[7]["mean_score"] == 0.75 and bins[7]["pos_rate"] == 0.75
    assert bins[2]["abs_gap"] == 0.75
    assert bins[9]["n_docs"] == 1 and bins[9]["mean_score"] == 1.0

    ece = calibration_ece(scored).collect()[0]
    # (4*0 + 2*0.75 + 1*0) / 7
    assert ece["n_bins"] == 3 and ece["n_docs"] == 7
    assert ece["ece"] == round(1.5 / 7, 6)


def test_pav_hand_solved_and_properties(spark):
    """PAV on a hand-solved violator sequence plus its defining
    properties: non-decreasing output, block values are weighted means
    of their members, total weighted mean preserved."""
    from sql_data_warehouse_and_analytics_project_spark.operators.lr import _pav

    # keys 0..3, weights 1, means [0.8, 0.2, 0.6, 0.4]:
    # PAV pools everything into one block of mean 0.5
    got = _pav([(0, 1.0, 0.8), (1, 1.0, 0.2), (2, 1.0, 0.6), (3, 1.0, 0.4)])
    assert got == [(0, 0.5), (1, 0.5), (2, 0.5), (3, 0.5)]

    # classic partial pool: [0.1, 0.6, 0.4, 0.9] -> middle pair pools to 0.5
    got = _pav([(0, 1.0, 0.1), (1, 1.0, 0.6), (2, 1.0, 0.4), (3, 1.0, 0.9)])
    assert got == [(0, 0.1), (1, 0.5), (2, 0.5), (3, 0.9)]

    # weighted pool: w=[3,1] means [0.0, 0.75] keeps order (no violation)
    assert _pav([(0, 3.0, 0.0), (1, 1.0, 0.75)]) == [(0, 0.0), (1, 0.75)]
    # reversed -> pools to weighted mean (3*0.75 + 1*0.25)/4 = 0.625 (exact)
    got = _pav([(0, 3.0, 0.75), (1, 1.0, 0.25)])
    assert got == [(0, 0.625), (1, 0.625)]

    # property sweep on a deterministic pseudo-random sequence
    seq = [(k, 1.0 + (k * 7) % 3, ((k * 2654435761) % 1000) / 1000.0) for k in range(50)]
    out = _pav(seq)
    vals = [v for _, v in out]
    assert all(a <= b + 1e-12 for a, b in zip(vals, vals[1:]))  # monotone
    tot_w = sum(w for _, w, _ in seq)
    assert abs(
        sum(w * m for _, w, m in seq) - sum(w * v for (_, w, _), (_, v) in zip(seq, out))
    ) < 1e-9 * tot_w  # weighted mean preserved


def test_isotonic_fit_apply_reduces_ece(spark):
    """A deliberately miscalibrated-but-ranking-faithful score (prob =
    score/2): isotonic recalibration must cut the in-sample ECE to ~0
    and stay monotone; every row gets a calibrated value."""
    from sql_data_warehouse_and_analytics_project_spark.operators.lr import (
        calibration_ece,
        isotonic_apply,
        isotonic_fit,
    )

    rows = []
    for i in range(2000):
        s = (i % 100) / 100.0  # scores 0.00..0.99
        y = 1 if (i * 2654435761) % 100 < (i % 100) / 2 else 0  # P(y)=s/2
        rows.append((i, y, s))
    scored = spark.createDataFrame(rows, "doc_id bigint, y bigint, score double")
    fit = isotonic_fit(scored)
    vals = [v for _, v in fit]
    assert all(a <= b + 1e-12 for a, b in zip(vals, vals[1:]))
    applied = isotonic_apply(scored, fit)
    assert applied.filter(F.col("calibrated").isNull()).count() == 0
    ece_raw = calibration_ece(scored).collect()[0]["ece"]
    cal = applied.select("doc_id", "y", F.col("calibrated").alias("score"))
    ece_iso = calibration_ece(cal).collect()[0]["ece"]
    assert ece_iso < ece_raw
    assert ece_iso < 0.05 and ece_raw > 0.15


def test_registered_isotonic_key_shape(spark):
    from sql_data_warehouse_and_analytics_project_spark.registry import all_queries

    row = all_queries()["eval_isotonic_calibration"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(row) == 1
    r = row[0]
    assert r["n_docs"] == 500 and r["n_blocks"] <= r["n_keys"]
    assert r["ece_isotonic"] <= r["ece_raw"] + 1e-9
