"""MinHash estimator-error audit semantics on planted fixtures.

The registered key's cross-engine parity rides the oracle; these pin
the arithmetic: err_ppm is the exact integer ppm between the
signature-agreement estimate and the exact shingle Jaccard, verified
against an independent Python recomputation of both legs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_data_warehouse_and_analytics_project_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, lang string, text string")


def _shingle_set(text: str, n: int = 3) -> set:
    toks = text.split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


BASE = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima " * 4


def test_error_matches_python_recomputation(spark):
    """Near-identical pair: the audit's single err_ppm must equal the
    integer formula evaluated from (a) the module's own signatures and
    (b) a pure-Python exact Jaccard over shingle sets."""
    rows = [(1, "en", BASE + "extra tail"), (2, "en", BASE + "other tail")]
    docs = _docs(spark, rows)

    out = dedup.minhash_estimator_error(docs).collect()[0]
    assert out["n_pairs"] == 1

    sigs = {r["doc_id"]: [r[f"sig_{i}"] for i in range(dedup._MINHASH_K)]
            for r in dedup.minhash_signatures(docs).collect()}
    matches = sum(a == b for a, b in zip(sigs[1], sigs[2]))
    s1, s2 = _shingle_set(rows[0][2]), _shingle_set(rows[1][2])
    shared, union = len(s1 & s2), len(s1 | s2)
    want = (1000000 * abs(dedup._MINHASH_K * shared - matches * union)) // (
        dedup._MINHASH_K * union
    )
    assert out["sum_err_ppm"] == want == out["max_err_ppm"]
    assert out["mean_abs_err"] == round(want / 1000000.0, 6)


def test_exact_duplicates_collapse_before_audit(spark):
    """Bit-identical docs collapse in the exact-dedup stage, so they never
    reach the estimator — the audit measures the NEAR-dup estimator only."""
    docs = _docs(spark, [(1, "en", BASE), (2, "en", BASE)])
    out = dedup.minhash_estimator_error(docs).collect()[0]
    assert out["n_pairs"] == 0
    assert out["max_err_ppm"] is None and out["mean_abs_err"] is None


def test_error_bounded_and_small_for_near_copies(spark):
    """A family of near-copies: every pair's error is a valid ppm and the
    mean stays well under the 64-hash concentration envelope."""
    rows = [(i, "en", BASE + f"tail word{i}") for i in range(6)]
    out = dedup.minhash_estimator_error(_docs(spark, rows)).collect()[0]
    assert out["n_pairs"] == 15  # all C(6,2) pairs band together
    assert 0 <= out["max_err_ppm"] <= 1000000
    assert 0.0 <= out["mean_abs_err"] <= 0.25


def test_split_leakage_audit_planted_cross_pair(spark):
    """Near-identical docs on ids 1 (naive→train) and 3 (naive→test):
    the naive per-doc split tears the pair, the component split never
    does — md5 splits precomputed, so the assertion is deterministic."""
    filler = [(i, "en", f"unique filler doc number {i} " + " ".join(f"w{i}x{k}" for k in range(12)))
              for i in range(100, 106)]
    rows = [(1, "en", BASE + "tail one"), (3, "en", BASE + "tail two")] + filler
    out = dedup.split_leakage_audit(_docs(spark, rows)).collect()[0]
    assert out["n_pairs"] == 1
    assert out["naive_cross_pairs"] == 1
    assert out["component_cross_pairs"] == 0


def test_dedup_savings_report_hand_computed(spark):
    """One near-dup pair (ids 1, 3) among unique filler: min-id rule keeps
    1 and drops 3 — dropped character mass is exactly doc 3's length."""
    filler = [(i, "en", f"unique filler doc number {i} " + " ".join(f"w{i}x{k}" for k in range(12)))
              for i in range(100, 104)]
    d1 = BASE + "tail one"
    d3 = BASE + "tail two longer"
    rows = [(1, "en", d1), (3, "en", d3)] + filler
    out = dedup.dedup_savings_report(_docs(spark, rows)).collect()[0]
    total = sum(len(t) for _, _, t in rows)
    assert out["n_docs"] == 6
    assert out["n_in_components"] == 2
    assert out["n_dropped"] == 1
    assert out["chars_total"] == total
    assert out["chars_dropped"] == len(d3)
    assert out["pct_chars_dropped"] == round(len(d3) / total, 6)
