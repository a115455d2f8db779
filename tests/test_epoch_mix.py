"""Epoch-aware upsampling mix (r11): behavioral + plan pins.

Oracle parity for `mix_epoch_upsample` runs in tests/test_oracle_parity.py;
here we pin the replication semantics the hash alone can't prove: copy
counts stay within {floor(r), floor(r)+1} per stratum, the realized
stratum size lands on r·n_s, downsampled strata never repeat, and the
rate table reaches the corpus via broadcast.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from sql_data_warehouse_and_analytics_project_spark.operators import packing
from sql_data_warehouse_and_analytics_project_spark.plans import audit
from sql_data_warehouse_and_analytics_project_spark.sources import tpch

from conftest import SF_DIR


def _docs(spark):
    return tpch.load(spark, SF_DIR, "documents")


def test_copy_counts_bracket_the_rate(spark):
    docs = _docs(spark)
    n = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    n_total = sum(n.values())
    out = packing.mix_epoch_resample(docs).collect()
    by_lang: dict[str, Counter] = {}
    for r in out:
        by_lang.setdefault(r["lang"], Counter())[r["doc_id"]] += 1
    for lang, w in packing._EPOCH_MIX_WEIGHTS.items():
        r_s = (packing._EPOCH_MIX_BUDGET * n_total // 1) * w / n[lang]
        lo, hi = int(r_s), int(r_s) + 1
        copies = by_lang.get(lang, Counter())
        assert all(c in (lo, hi) for c in copies.values()), (lang, set(copies.values()))
        # realized size concentrates at r*n_s (binomial over the frac part)
        realized = sum(copies.values())
        assert abs(realized - r_s * n[lang]) <= 4 * (n[lang] ** 0.5) + 1, (
            lang,
            realized,
            r_s * n[lang],
        )
        if r_s < 1:  # downsampled strata never repeat a doc
            assert all(c == 1 for c in copies.values()), lang


def test_epoch_indices_are_dense_from_one(spark):
    out = packing.mix_epoch_resample(_docs(spark)).collect()
    per_doc: dict[tuple, list] = {}
    for r in out:
        per_doc.setdefault((r["lang"], r["doc_id"]), []).append(r["epoch"])
    for k, eps in per_doc.items():
        assert sorted(eps) == list(range(1, len(eps) + 1)), (k, eps)


def test_plan_rates_broadcast_no_corpus_shuffle_join(spark):
    plan = audit.executed_plan(packing.mix_epoch_resample(_docs(spark)))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
