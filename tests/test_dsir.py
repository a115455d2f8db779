"""DSIR importance resampling (r11): behavioral + plan-shape pins.

Oracle parity for `curation_dsir_select` runs automatically in
tests/test_oracle_parity.py (parametrized over the registry); here we pin
what parity alone cannot: that the weights actually tilt selection toward
the target domain, that a planted target-like document outranks a planted
off-domain one, and the scale shape (broadcast model, top-k cut, no
global sort).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_data_warehouse_and_analytics_project_spark.operators import dsir
from sql_data_warehouse_and_analytics_project_spark.plans import audit
from sql_data_warehouse_and_analytics_project_spark.sources import tpch

from conftest import SF_DIR


def _docs(spark):
    return tpch.load(spark, SF_DIR, "documents")


def test_selection_tilts_toward_target_lang(spark):
    """The selected sample's en-fraction must exceed the corpus
    en-fraction — the whole point of importance resampling."""
    docs = _docs(spark)
    sel = dsir.dsir_select(docs, k=100)
    langs = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", "lang").collect()}
    chosen = [langs[r["doc_id"]] for r in sel.collect()]
    assert len(chosen) == 100
    sel_frac = sum(1 for l in chosen if l == "en") / len(chosen)
    corpus_frac = sum(1 for l in langs.values() if l == "en") / len(langs)
    assert sel_frac > corpus_frac, (sel_frac, corpus_frac)


def test_planted_target_doc_outweighs_offdomain(spark):
    """Craft a corpus where target docs share a distinctive vocabulary:
    a held-out doc written in that vocabulary must carry a higher logw
    than one written in the off-domain vocabulary."""
    rows = []
    for i in range(40):
        rows.append((i, "tgt", "alpha beta gamma delta alpha beta gamma delta"))
    for i in range(40, 80):
        rows.append((i, "bg", "uno dos tres cuatro uno dos tres cuatro"))
    # held-out probes (neither in the target slice): 100 target-like,
    # 101 background-like
    rows.append((100, "probe", "alpha beta gamma delta"))
    rows.append((101, "probe", "uno dos tres cuatro"))
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    sel = dsir.dsir_select(docs, target=F.col("lang") == "tgt", k=200)
    w = {r["doc_id"]: r["logw"] for r in sel.collect()}
    assert w[100] > 0 > w[101], (w[100], w[101])


def test_feature_array_is_unigrams_then_bigrams(spark):
    docs = spark.createDataFrame(
        [(1, "x", "a b c")], "doc_id bigint, lang string, text string"
    )
    fb = dsir.hashed_ngram_features(docs, buckets=8).select("fb").first()["fb"]
    assert len(fb) == 3 + 2  # 3 unigrams + 2 bigrams
    assert all(0 <= b < 8 for b in fb)


def test_plan_broadcast_model_and_topk_cut(spark):
    """Scale pins: the λ model reaches the corpus via broadcast (never a
    shuffled join on the big side), and the k cut is
    TakeOrderedAndProject — no global Sort of the scored corpus."""
    q = dsir.dsir_select(_docs(spark))
    plan = audit.executed_plan(q)
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
