"""Categorical association audit semantics (MI / chi² / Cramér's V) on
planted contingency tables, including the zero-observed-cell identity."""

from __future__ import annotations

import math

from sql_data_warehouse_and_analytics_project_spark.operators import drift


def _docs(spark, cells):
    """cells: {(lang, source): count} → a documents-shaped frame."""
    rows, i = [], 0
    for (a, b), c in cells.items():
        for _ in range(c):
            rows.append((i, b, a, "text"))
            i += 1
    return spark.createDataFrame(rows, "doc_id bigint, source string, lang string, text string")


def _run(spark, cells):
    [r] = drift.categorical_association(_docs(spark, cells)).collect()
    return r


def test_independent_facets_zero_association(spark):
    cells = {("en", "s1"): 6, ("en", "s2"): 6, ("de", "s1"): 3, ("de", "s2"): 3}
    r = _run(spark, cells)
    assert r["n_docs"] == 18 and r["n_a"] == 2 and r["n_b"] == 2
    assert r["mi_nats"] == 0.0 and r["chi2"] == 0.0 and r["cramers_v"] == 0.0


def test_perfect_association_diagonal(spark):
    """Diagonal table: lang determines source — MI = ln 2, chi² = N,
    V = 1. The off-diagonal cells are ZERO-OBSERVED, so this also pins
    the Σ_zero e = N − Σ_obs e identity."""
    cells = {("en", "s1"): 10, ("de", "s2"): 10}
    r = _run(spark, cells)
    assert r["mi_nats"] == round(math.log(2.0), 6)
    assert r["chi2"] == 20.0
    assert r["cramers_v"] == 1.0


def test_matches_pure_python_contingency(spark):
    cells = {
        ("en", "s1"): 7, ("en", "s2"): 2, ("en", "s3"): 1,
        ("de", "s1"): 1, ("de", "s2"): 5, ("de", "s3"): 4,
    }
    r = _run(spark, cells)
    n = sum(cells.values())
    langs = {a for a, _ in cells}
    srcs = {b for _, b in cells}
    ra = {a: sum(c for (x, _), c in cells.items() if x == a) for a in langs}
    cb = {b: sum(c for (_, y), c in cells.items() if y == b) for b in srcs}
    mi = chi = 0.0
    for (a, b), c in sorted(cells.items()):
        e = ra[a] * cb[b] / n
        mi += (c / n) * math.log(n * c / (ra[a] * cb[b]))
        chi += (c - e) ** 2 / e - e
    chi += n
    v = math.sqrt(chi / (n * min(len(langs) - 1, len(srcs) - 1)))
    assert r["mi_nats"] == round(mi, 6)
    assert r["chi2"] == round(chi, 6)
    assert r["cramers_v"] == round(v, 6)


def test_single_facet_value_null_v(spark):
    cells = {("en", "s1"): 4, ("en", "s2"): 4}
    r = _run(spark, cells)
    assert r["n_a"] == 1 and r["cramers_v"] is None
    assert r["mi_nats"] == 0.0
