"""Bit-identity pins for the r19 per-operator reworks: each optimization
that changed an operator's internals is pinned against the formulation it
replaced, on adversarial inputs the corpus may not exercise."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sql_data_warehouse_and_analytics_project_spark.operators import dedup


ADVERSARIAL_TEXTS = [
    ("a b c d e f g", "plain"),
    ("x x x x x x x x", "all-one-token"),
    ("a b a b a b a b c", "alternating"),
    ("\tlead tab text here", "tab-led: '' IS a token after trim"),
    ("one two", "too short for 3-shingles"),
    ("solo", "single token"),
    ("", "empty"),
    ("   ", "whitespace only"),
    ("z y x w v u t s r q p o n m", "descending, all distinct"),
    ("dup dup other dup dup dup end", "heavy repeat"),
]


def _docs_df(spark):
    rows = [(i, "en", t) for i, (t, _) in enumerate(ADVERSARIAL_TEXTS)]
    return spark.createDataFrame(rows, "doc_id bigint, lang string, text string")


def test_gopher_topword_runfold_equals_nested_hof(spark):
    """r19: the sorted run-length fold must equal the O(distinct*n) nested
    HOF it replaced, including the tab-led case where '' is a real token."""
    df = _docs_df(spark).select(
        "doc_id", dedup.tokens_col(F.col("text")).alias("t")
    ).filter(F.size("t") >= 2)
    old = F.array_max(
        F.transform(
            F.array_distinct("t"),
            lambda w: F.size(F.filter(F.col("t"), lambda x: x == w)).cast("bigint"),
        )
    )
    run_next = lambda acc, x: (
        F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("bigint"))
    )
    new = F.aggregate(
        F.array_sort("t"),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("bigint").alias("run"),
            F.lit(0).cast("bigint").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            run_next(acc, x).alias("run"),
            F.greatest(acc["best"], run_next(acc, x)).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    got = df.select("doc_id", old.alias("a"), new.alias("b")).collect()
    assert got, "filter must keep some docs"
    for r in got:
        assert r["a"] == r["b"], (r["doc_id"], r["a"], r["b"])


def test_tfidf_rle_equals_nested_hof_tf(spark):
    """r19: the sorted-RLE (term, tf) pairs must equal the per-distinct
    array-filter counts as a multiset."""
    from sql_data_warehouse_and_analytics_project_spark.operators import retrieval

    df = _docs_df(spark)
    tf_new = sorted(
        (r["doc_id"], r["term"], r["tf"])
        for r in retrieval.tfidf_keywords(df, k=100)
        .select("doc_id", "term", "tf")
        .collect()
    )
    # reference: explode + group count (independent formulation)
    t = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    ref = sorted(
        (r["doc_id"], r["term"], r["tf"])
        for r in df.select("doc_id", F.explode(t).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .collect()
    )
    assert tf_new == ref


def test_candidate_shared_arrays_shared_frame_equals_reps_path(spark):
    """r19: the shared shingle/signature frame path (sh=...) must be
    row-identical to the compute-from-reps path."""
    docs = _docs_df(spark)
    mem = dedup.token_dedup_members(docs)
    reps = mem.filter(F.col("doc_id") == F.col("rep_id")).select(
        "doc_id", "lang", "text"
    )
    cand = spark.createDataFrame(
        [(0, 2), (0, 8), (2, 8), (1, 9)], "doc_id_1 bigint, doc_id_2 bigint"
    )
    sh = dedup._rep_shingle_sigs(reps)
    a = sorted(
        map(str, dedup._candidate_shared_arrays(reps, cand).collect())
    )
    b = sorted(
        map(str, dedup._candidate_shared_arrays(reps, cand, sh=sh).collect())
    )
    assert a == b and len(a) == 4


def test_rep_shingle_sigs_matches_minhash_signatures(spark):
    """r19: the merged shingle+signature checkpoint must carry exactly the
    signatures minhash_signatures computes."""
    docs = _docs_df(spark)
    mem = dedup.token_dedup_members(docs)
    reps = mem.filter(F.col("doc_id") == F.col("rep_id")).select(
        "doc_id", "lang", "text"
    )
    merged = dedup._rep_shingle_sigs(reps).drop("_sh")
    direct = dedup.minhash_signatures(reps, spread=False)
    d = merged.exceptAll(direct).count() + direct.exceptAll(merged).count()
    assert d == 0


def test_token_dedup_members_one_tokenize_two_scans(spark):
    """r19 mem rework: same membership as a brute-force reference, and the
    text-side scan must NOT tokenize (the mapping join subsumes the
    filter)."""
    docs = _docs_df(spark)
    got = sorted(
        (r["doc_id"], r["rep_id"])
        for r in dedup.token_dedup_members(docs).select("doc_id", "rep_id").collect()
    )
    import re

    # mimic Spark exactly: F.trim strips SPACES only (a leading tab
    # survives and yields an '' first token)
    rows = [
        (i, tuple(re.split(r"\s+", t.strip(" "))))
        for i, (t, _) in enumerate(ADVERSARIAL_TEXTS)
    ]
    by_key = {}
    for i, toks in rows:
        if len(toks) >= 3:
            by_key.setdefault(toks, []).append(i)
    want = sorted((i, min(grp)) for grp in by_key.values() for i in grp)
    assert got == want


def test_winnow_gate_fold_drops_short_docs(spark):
    """r19: folding the eligibility gate into the encoding expression must
    keep fingerprint rows identical — short docs emit nothing."""
    docs = _docs_df(spark).select("doc_id", "text")
    fp = dedup_winnow(docs)
    ids = {r["doc_id"] for r in fp.select("doc_id").distinct().collect()}
    # docs under _K + _W - 1 tokens can never fingerprint
    from sql_data_warehouse_and_analytics_project_spark.operators import winnow

    min_tokens = winnow._K + winnow._W - 1
    for i, (t, _) in enumerate(ADVERSARIAL_TEXTS):
        import re

        n = len(re.split(r"\s+", t.strip().lower())) if t.strip() else 1
        if n < min_tokens:
            assert i not in ids, (i, t)


def dedup_winnow(docs):
    from sql_data_warehouse_and_analytics_project_spark.operators import winnow

    return winnow.winnow_fingerprints(docs, spread=False)
