"""ROC-AUC / PR-curve semantics on planted separable fixtures.

The registered queries run on the synthetic corpus where AUC ≈ 0.5 by
design; these fixtures plant real separations so the metric values are
hand-checkable (Hanley-McNeil tie handling, confusion-cell sweeps).

Score recap: score_key = en-marker hits per million whitespace tokens,
so "the and" → 1000000, "the x" → 500000, "x y" → 0.
"""

from __future__ import annotations

from sql_data_warehouse_and_analytics_project_spark.operators import evalmetrics as ev
from sql_data_warehouse_and_analytics_project_spark.plans import audit


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, lang string, text string")


def _auc(spark, rows) -> float:
    [r] = ev.roc_auc(_docs(spark, rows)).collect()
    return r["auc"]


def test_perfect_separation_is_one(spark):
    rows = [
        (1, "en", "the and of is"),
        (2, "en", "the and x y"),
        (3, "de", "x y z w"),
        (4, "de", "p q r s"),
    ]
    assert _auc(spark, rows) == 1.0


def test_reversed_separation_is_zero(spark):
    rows = [
        (1, "de", "the and of is"),
        (2, "de", "the and x y"),
        (3, "en", "x y z w"),
        (4, "en", "p q r s"),
    ]
    assert _auc(spark, rows) == 0.0


def test_all_tied_is_half(spark):
    rows = [(i, lang, "same text here now") for i, lang in enumerate(["en", "de", "en", "de"])]
    assert _auc(spark, rows) == 0.5


def test_hand_computed_tied_mix(spark):
    # counts: s=0 → q=1; s=500000 → p=1; s=1000000 → p=1, q=1
    # AUC = [1·(1 + 0/2) + 1·(1 + 1/2)] / (2·2) = 0.625
    rows = [
        (1, "en", "the and"),
        (2, "de", "the and"),
        (3, "en", "the x"),
        (4, "de", "x y"),
    ]
    assert _auc(spark, rows) == 0.625


def test_single_class_auc_is_null(spark):
    [r] = ev.roc_auc(_docs(spark, [(1, "en", "the and"), (2, "en", "x y")])).collect()
    assert r["auc"] is None and r["n_neg"] == 0


def test_pr_curve_confusion_cells(spark):
    rows = [
        (1, "en", "the and"),
        (2, "de", "the and"),
        (3, "en", "the x"),
        (4, "de", "x y"),
    ]
    got = {
        r["threshold_ppm"]: (r["tp"], r["fp"], r["fn"], r["precision"], r["recall"], r["f1"])
        for r in ev.pr_curve(_docs(spark, rows)).collect()
    }
    assert got[1000000] == (1, 1, 1, 0.5, 0.5, 0.5)
    assert got[500000] == (2, 1, 0, 0.666667, 1.0, 0.8)
    assert got[0] == (2, 2, 0, 0.5, 1.0, 0.666667)


def test_rank_folds_ride_value_cumsums_no_unpartitioned_window(spark):
    """VERDICT r17 ask #6: the AUC / PR / conformal cumsum folds no longer
    run a single-task ``Window.orderBy`` at all — the ppm-domain count
    table rides ``abstats._value_cumsums`` (range-partition →
    per-partition window → broadcast prefix offsets), so the executed
    plans carry ZERO unpartitioned WindowExec nodes; lift keeps exactly
    ONE, the ≤10-row decile fold. The label collapse still pushes a
    partial_sum map-side before any shuffle (the compact-counts
    discipline)."""
    docs = _docs(
        spark,
        [
            (1, "en", "the and"),
            (2, "de", "x y"),
            (3, "en", "the of x"),
            (4, "de", "und der"),
        ],
    )
    df = ev.roc_auc(docs)
    df.collect()
    assert audit.unpartitioned_window_count(df) == 0
    # the label collapse itself (upstream of the fold's localCheckpoint,
    # so asserted on the counts stage) still partial-sums map-side
    counts = ev._score_counts(ev.score_label(docs))
    assert "partial_sum(label" in audit.formatted_plan(counts)
    pr = ev.pr_curve(docs)
    pr.collect()
    assert audit.unpartitioned_window_count(pr) == 0
    lift = ev.lift_from_counts(
        ev._score_counts(ev.score_label(docs))
    )
    lift.collect()
    assert audit.unpartitioned_window_count(lift) == 1  # ≤10-row decile fold
    conf = ev.conformal_coverage(docs)
    conf.collect()
    assert audit.unpartitioned_window_count(conf) == 0


def test_sliced_auc_per_facet_and_partitioned_window(spark):
    """One separable slice, one inverted slice, one single-class slice:
    per-facet AUC = 1.0 / 0.0 / NULL — a global AUC would average the
    story away. The rank window must be PARTITIONED by the facet (no
    single-partition stage)."""
    rows = [
        # slice A: detector perfect
        (1, "A", "en", "the and of is"),
        (2, "A", "de", "x y z w"),
        # slice B: detector inverted
        (3, "B", "de", "the and of is"),
        (4, "B", "en", "x y z w"),
        # slice C: single class
        (5, "C", "en", "the and"),
        (6, "C", "en", "p q"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, lang string, text string")
    df = ev.roc_auc_by(docs, facet="source")
    got = {r["facet"]: r["auc"] for r in df.collect()}
    assert got == {"A": 1.0, "B": 0.0, "C": None}
    plan = audit.formatted_plan(df)
    assert "windowspecdefinition(facet" in plan


def test_lift_deciles_hand_computed(spark):
    """20 rows, scores 19..0, positives exactly the top 5 scores: decile
    k holds rows 2k+1..2k+2, so deciles 0-1 are pure positive, decile 2
    is half positive, the rest pure negative. Base rate 0.25."""
    from sql_data_warehouse_and_analytics_project_spark.operators.evalmetrics import (
        lift_from_counts,
    )

    counts = spark.createDataFrame(
        [(19 - i, 1 if i < 5 else 0, 0 if i < 5 else 1) for i in range(20)],
        "score_key bigint, p bigint, q bigint",
    )
    rows = {r["decile"]: r for r in lift_from_counts(counts).collect()}
    assert sorted(rows) == list(range(10))
    assert all(rows[d]["n_rows"] == 2 for d in rows)
    assert [rows[d]["n_pos"] for d in range(10)] == [2, 2, 1, 0, 0, 0, 0, 0, 0, 0]
    assert rows[0]["lift"] == 4.0  # pure-positive decile vs base rate 1/4
    assert rows[2]["lift"] == 2.0
    assert rows[1]["cum_gain"] == 0.8
    assert rows[9]["cum_gain"] == 1.0
    assert rows[0]["pos_rate"] == 1.0 and rows[9]["pos_rate"] == 0.0


def test_lift_deciles_tied_scores_travel_together(spark):
    """A distinct-score group never splits across deciles: one score
    covering 15 of 20 rows lands whole in the decile of its last row."""
    from sql_data_warehouse_and_analytics_project_spark.operators.evalmetrics import (
        lift_from_counts,
    )

    counts = spark.createDataFrame(
        [(2, 3, 2), (1, 5, 10), (0, 0, 5)],
        "score_key bigint, p bigint, q bigint",
    )
    rows = {r["decile"]: r for r in lift_from_counts(counts).collect()}
    # total = 25: score=2 (5 rows) → ((5-1)*10)//25 = decile 1;
    # score=1 (15 rows) → ((20-1)*10)//25 = 7; score=0 → ((25-1)*10)//25 = 9
    assert sorted(rows) == [1, 7, 9]
    assert rows[1]["n_rows"] == 5 and rows[1]["n_pos"] == 3
    assert rows[7]["n_rows"] == 15 and rows[7]["n_pos"] == 5
    assert rows[9]["n_rows"] == 5 and rows[9]["n_pos"] == 0
    assert rows[9]["cum_gain"] == 1.0


# --- r15: kappa / conformal / information value -------------------------------


def test_cohens_kappa_semantics(spark):
    """Perfect agreement -> kappa 1; constant predictor -> kappa 0 (po ==
    pe when one marginal is degenerate); hand-computed mixed case."""
    import math

    from sql_data_warehouse_and_analytics_project_spark.operators.evalmetrics import (
        cohens_kappa,
    )

    def docs(rows):
        return spark.createDataFrame(
            [(i, t, l, "s", len(t)) for i, (t, l) in enumerate(rows)],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        )

    # en docs full of en markers, others with none -> threshold separates
    en = "the and is of to the and is of to"
    xx = "zzz qqq www rrr ttt yyy uuu iii ooo ppp"
    perfect = docs([(en, "en")] * 5 + [(xx, "fr")] * 5)
    r = cohens_kappa(perfect).collect()[0]
    assert r["kappa"] == 1.0 and r["n_agree"] == 10

    # constant predictor (all below threshold): agreement = class prior,
    # kappa -> 0
    const = docs([(xx, "en")] * 4 + [(xx, "fr")] * 6)
    r = cohens_kappa(const).collect()[0]
    assert r["kappa"] == 0.0

    # hand-computed 2x2: n11=4, n00=3, n10=1 (en predicted non-en),
    # n01=2 (non-en predicted en)
    mixed = docs(
        [(en, "en")] * 4 + [(xx, "en")] * 1 + [(en, "fr")] * 2 + [(xx, "fr")] * 3
    )
    r = cohens_kappa(mixed).collect()[0]
    po = 7 / 10
    pe = (5 * 6 + 5 * 4) / 100
    assert abs(r["po"] - round(po, 6)) < 1e-9
    assert abs(r["pe"] - round(pe, 6)) < 1e-9
    assert abs(r["kappa"] - round((po - pe) / (1 - pe), 6)) < 1e-9
    assert not math.isnan(r["kappa"])


def test_conformal_coverage_guarantee_on_planted(spark):
    """Marginal coverage must be >= 1 - alpha (within finite-sample
    slack) on a corpus the detector separates imperfectly, and qhat must
    be the exact order statistic of the calibration nonconformities."""
    import itertools

    from sql_data_warehouse_and_analytics_project_spark.operators.evalmetrics import (
        conformal_coverage,
    )

    words_en = ["the", "and", "is", "of", "to"]
    words_xx = ["zzz", "qqq", "www", "rrr"]
    rows = []
    for i in range(400):
        # graded mixtures so nonconformity has a real distribution
        k = i % 11
        toks = list(itertools.islice(itertools.cycle(words_en), k)) + list(
            itertools.islice(itertools.cycle(words_xx), 11 - k)
        )
        text = " ".join(toks)
        lang = "en" if k >= 6 else "fr"
        rows.append((i, text, lang, "s", len(text)))
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    r = conformal_coverage(docs).collect()[0]
    assert r["n_calib"] + r["n_test"] == 400
    assert r["target"] == 0.9
    # finite-sample guarantee: coverage >= 1 - alpha - O(1/n_cal) slack
    assert r["coverage"] >= r["target"] - 2.0 / r["n_calib"]


def test_information_value_semantics(spark):
    """A perfectly separating feature yields large IV; a feature
    independent of the label yields IV ~ 0; decile counts tile the
    population."""
    from sql_data_warehouse_and_analytics_project_spark.operators.evalmetrics import (
        information_value,
    )
    from datetime import datetime as dt

    def events(rows):
        return spark.createDataFrame(
            [(i, dt(2024, 1, 1), 1, t, v, "{}") for i, (v, t) in enumerate(rows)],
            "event_id bigint, ts timestamp, user_id bigint, event_type string,"
            " value double, props string",
        )

    # separable: purchases all have high value
    sep = events([(float(i), "view") for i in range(100)]
                 + [(1000.0 + i, "purchase") for i in range(100)])
    t = information_value(sep).collect()
    assert sum(r["n_rows"] for r in t) == 200
    assert t[0]["iv_total"] > 2.0  # "suspiciously predictive" territory
    # independent: every distinct value receives both labels equally
    ind = events([(float((i // 2) % 50), "purchase" if i % 2 == 0 else "view") for i in range(200)])
    t2 = information_value(ind).collect()
    assert abs(t2[0]["iv_total"]) < 0.05
