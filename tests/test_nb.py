"""Naive Bayes classifier: learnability on a separable planted corpus,
literal/broadcast strategy parity, tie-break determinism, plan shape.

Oracle parity for ``text_nb_langid`` (counts, libm-log weights, token-order
fold, argmax all replayed in DuckDB) runs in tests/test_oracle_parity.py.
The real synthetic corpus is NOT language-separable (all langs draw from
one shared vocabulary), so accuracy assertions live on planted data; the
real-corpus check is cross-engine exactness, same as ``text_lang_confusion``.
"""

from __future__ import annotations

from conftest import SF_DIR

from sql_data_warehouse_and_analytics_project_spark.operators import nb
from sql_data_warehouse_and_analytics_project_spark.plans import audit
from sql_data_warehouse_and_analytics_project_spark.sources import tpch


def _separable(spark):
    rows = []
    for i in range(30):
        rows.append((i, "alpha beta gamma alpha beta", "aa"))
        rows.append((100 + i, "delta epsilon zeta delta epsilon", "bb"))
        rows.append((200 + i, "iota kappa lambda iota kappa", "cc"))
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def test_nb_learns_separable_classes(spark):
    docs = _separable(spark)
    out = nb.nb_language_classifier(docs).collect()
    assert len(out) == 90
    assert all(r["hit"] == 1 for r in out), [r for r in out if not r["hit"]][:3]


def test_nb_strategies_agree_on_real_corpus(spark):
    docs = tpch.load(spark, SF_DIR, "documents")
    lit = nb.nb_language_classifier(docs, strategy="literal").collect()
    bro = nb.nb_language_classifier(docs, strategy="broadcast").collect()
    assert [tuple(r) for r in lit] == [tuple(r) for r in bro]


def test_nb_tiebreak_is_lexicographic(spark):
    """A doc scoring identically under every class must get the
    lexicographically smallest class — the cross-engine argmax contract."""
    rows = [
        (0, "x y", "bb"),
        (1, "x y", "aa"),  # same text, same counts per class → exact ties
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    out = {r["doc_id"]: r["pred_lang"] for r in nb.nb_language_classifier(docs).collect()}
    assert out == {0: "aa", 1: "aa"}


def test_nb_empty_corpus(spark):
    docs = tpch.load(spark, SF_DIR, "documents").limit(0)
    assert nb.nb_language_classifier(docs, strategy="literal").count() == 0
    assert nb.nb_language_classifier(docs, strategy="broadcast").count() == 0


def test_nb_scoring_is_a_projection(spark):
    """Once the KB model is built, scoring must add no shuffle beyond the
    output sort — no join, no window over the corpus (literal strategy)."""
    docs = tpch.load(spark, SF_DIR, "documents")
    df = nb.nb_language_classifier(docs, strategy="literal")
    plan = audit.executed_plan(df)
    assert audit.data_shuffle_count(plan) <= 1, plan  # the orderBy only
    assert "Join" not in plan and "Window" not in plan, plan
