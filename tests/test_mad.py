"""MAD robust-outlier semantics on hand-computed groups."""

from __future__ import annotations

from sql_data_warehouse_and_analytics_project_spark.operators import analytics_extras as ax


def _events(spark, rows):
    return spark.createDataFrame(rows, "event_id bigint, event_type string, value double")


def _run(spark, rows):
    df = ax.mad_outliers(_events(spark, rows), "event_type", "value")
    return {r["event_type"]: (r["n_events"], r["med"], r["mad"], r["n_outliers"]) for r in df.collect()}


def test_hand_computed_even_group_with_extreme(spark):
    """Values 1..9 plus 1000: med = 5.5 (both-middles), MAD = 2.5,
    threshold 7.5 → exactly the extreme flags."""
    rows = [(i, "a", float(v)) for i, v in enumerate(list(range(1, 10)) + [1000])]
    got = _run(spark, rows)
    assert got["a"] == (10, 5.5, 2.5, 1)


def test_identical_values_no_outliers(spark):
    rows = [(i, "b", 7.0) for i in range(6)]
    got = _run(spark, rows)
    assert got["b"] == (6, 7.0, 0.0, 0)


def test_zero_mad_still_flags_deviants(spark):
    """Majority-constant group: MAD = 0, so ANY deviation exceeds k·MAD —
    the documented behavior (threshold degenerates to 'differs from
    median')."""
    rows = [(i, "c", 5.0) for i in range(4)] + [(99, "c", 100.0)]
    got = _run(spark, rows)
    assert got["c"] == (5, 5.0, 0.0, 1)


def test_mad_immune_to_masking_where_zscore_is_dragged(spark):
    """One colossal outlier inflates σ enough that a second, moderate
    outlier hides from a 2.5σ rule — the median/MAD rule flags both."""
    base = [(i, "d", float(v)) for i, v in enumerate([10, 11, 12, 13, 14, 15, 16, 17])]
    rows = base + [(100, "d", 60.0), (101, "d", 100000.0)]
    got = _run(spark, rows)
    # med of 10..17,60,1e5 (n=10, middles 14,15) = 14.5; ads sorted:
    # 0.5..4.5 pairs → mad = 2.5; threshold 7.5 → 60 and 1e5 both flag
    assert got["d"] == (10, 14.5, 2.5, 2)


def test_scale_mode_tolerance_on_10k_values(spark):
    """mode='scale' (r14): sketch-backed median/MAD on a deterministic 10K
    permutation must sit within one bin width (w) of exact, and the
    outlier count within the exact counts at the k-MAD boundary widened
    by (k+1)*w — the documented one-bin error bound propagated through
    ad = |v - med| and the k*mad threshold."""
    import statistics

    # deterministic pseudo-random sample, heavy-tailed: (i*2654435761 %
    # 10007) scaled, with every 97th value pushed far out
    vals = []
    for i in range(10_000):
        v = (i * 2654435761) % 10007 / 101.0  # 0..99.08
        if i % 97 == 0:
            v += 400.0
        vals.append(v)
    rows = [(i, "g", float(v)) for i, v in enumerate(vals)]
    k, w = 3.0, 4
    got = (
        ax.mad_outliers(_events(spark, rows), "event_type", "value", k=k, mode="scale", w=w)
        .collect()[0]
    )
    med = statistics.median(vals)
    ads = [abs(v - med) for v in vals]
    mad = statistics.median(ads)
    assert abs(got["med"] - med) <= w
    assert abs(got["mad"] - mad) <= w
    thr = k * mad
    slack = (k + 1) * w
    lo = sum(1 for a in ads if a > thr + slack)
    hi = sum(1 for a in ads if a > thr - slack)
    assert lo <= got["n_outliers"] <= hi
    assert got["n_events"] == 10_000
    # the planted far-out spikes (>= 400 above a <=100 baseline) must all
    # flag regardless of sketch error
    assert got["n_outliers"] >= sum(1 for i in range(10_000) if i % 97 == 0)


def test_scale_mode_rejects_unknown_mode(spark):
    import pytest

    with pytest.raises(ValueError):
        ax.mad_outliers(_events(spark, [(1, "a", 1.0)]), "event_type", "value", mode="nope")
