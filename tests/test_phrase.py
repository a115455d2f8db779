"""Exact-phrase retrieval semantics: positional postings + adjacency joins.

Pins the properties the DuckDB oracle can't isolate: word-ORDER
sensitivity, overlapping-occurrence counting, case folding, and the
plan shape (per-leg term filters, no cartesian product).
"""

from __future__ import annotations

from sql_data_warehouse_and_analytics_project_spark.operators import retrieval as rt
from sql_data_warehouse_and_analytics_project_spark.plans import audit


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_phrase_requires_consecutive_order(spark):
    docs = _docs(
        spark,
        [
            (1, "stream data"),           # exact phrase
            (2, "data stream"),           # reversed — must NOT match
            (3, "stream the data"),       # gap — must NOT match
            (4, "a stream data b"),       # embedded — matches
        ],
    )
    got = {r["doc_id"]: r["n_matches"] for r in rt.phrase_match(docs, ("stream", "data")).collect()}
    assert got == {1: 1, 4: 1}


def test_phrase_counts_every_occurrence_including_overlaps(spark):
    docs = _docs(
        spark,
        [
            (1, "stream data stream data"),  # two disjoint occurrences
            (2, "go go go"),                 # overlapping "go go" ×2
        ],
    )
    assert {r["doc_id"]: r["n_matches"] for r in rt.phrase_match(docs, ("stream", "data")).collect()} == {1: 2}
    assert {r["doc_id"]: r["n_matches"] for r in rt.phrase_match(docs, ("go", "go")).collect()} == {2: 2}


def test_phrase_case_folds_both_sides(spark):
    docs = _docs(spark, [(1, "Stream DATA here")])
    got = rt.phrase_match(docs, ("STREAM", "data")).collect()
    assert [(r["doc_id"], r["n_matches"]) for r in got] == [(1, 1)]


def test_three_word_phrase_and_single_word_degenerate(spark):
    docs = _docs(
        spark,
        [
            (1, "the quick brown fox"),
            (2, "quick brown dog"),
            (3, "brown quick brown"),
        ],
    )
    got3 = {r["doc_id"]: r["n_matches"] for r in rt.phrase_match(docs, ("quick", "brown", "fox")).collect()}
    assert got3 == {1: 1}
    # k=1 degenerates to term frequency
    got1 = {r["doc_id"]: r["n_matches"] for r in rt.phrase_match(docs, ("brown",)).collect()}
    assert got1 == {1: 1, 2: 1, 3: 2}


def test_positional_postings_are_one_based_and_unique(spark):
    docs = _docs(spark, [(7, "a b a")])
    rows = sorted(
        (r["term"], r["pos"]) for r in rt.positional_postings(docs).collect()
    )
    assert rows == [("a", 1), ("a", 3), ("b", 2)]


def test_phrase_plan_filters_each_leg_no_cartesian(spark):
    """Each adjacency leg must be a single-term posting slice joined on
    (doc_id, pos) — equi-joins only, never a cartesian/nested-loop over
    the corpus, so join input sizes stay posting-list-bounded at scale."""
    docs = _docs(spark, [(1, "stream data stream")])
    df = rt.phrase_match(docs, ("stream", "data"))
    plan = audit.formatted_plan(df)
    joins = audit.join_counts(plan)
    assert joins["nested_loop"] == 0, plan
    assert joins["sort_merge"] + joins["shuffled_hash"] + joins["broadcast"] > 0
    # each leg's single-term filter survives into the physical plan,
    # BELOW the join (posting-list-sized join inputs)
    assert "(term" in plan and "= stream)" in plan and "= data)" in plan


def test_phrase_snippets_window_and_edges(spark):
    docs = _docs(
        spark,
        [
            # match at pos 1: left edge clips, window extends right
            (1, "stream data a b c d e f g h"),
            # match mid-doc: exactly 2 context tokens each side (window=2)
            (2, "w x stream data y z tail"),
            # two matches: snippet anchors on the FIRST
            (3, "a stream data b stream data c"),
            # match at the very end: right edge clips
            (4, "p q r stream data"),
        ],
    )
    got = {r["doc_id"]: (r["first_pos"], r["snippet"])
           for r in rt.phrase_snippets(docs, ("stream", "data"), window=2).collect()}
    assert got[1] == (1, "stream data a b")
    assert got[2] == (3, "w x stream data y z")
    assert got[3] == (2, "a stream data b stream")
    assert got[4] == (4, "q r stream data")


def test_phrase_snippets_preserve_original_case(spark):
    docs = _docs(spark, [(1, "Alpha STREAM Data Omega")])
    [r] = rt.phrase_snippets(docs, ("stream", "data"), window=1).collect()
    assert r["snippet"] == "Alpha STREAM Data Omega"


def test_ranker_agreement_extremes_and_hand_case(spark):
    """Identical rankings → rho 1.0; exactly reversed → −1.0; the classic
    4-item one-swap case → 0.8 (Spearman on ranks [1,2,3,4] vs [2,1,3,4])."""
    def leg(scores):
        rows = [(i + 1, float(s)) for i, s in enumerate(scores)]
        return (spark.createDataFrame(rows, "doc_id bigint, s double"), "s", "r")

    def rho(a, b):
        [r] = rt.ranker_agreement([leg(a), leg(b)]).collect()
        return r["spearman_rho"]

    assert rho([40, 30, 20, 10], [8, 6, 4, 2]) == 1.0
    assert rho([40, 30, 20, 10], [2, 4, 6, 8]) == -1.0
    # doc ranks: leg A = [1,2,3,4]; leg B swaps the top two → rho = 1 − 6·2/(4·15) = 0.8
    assert rho([40, 30, 20, 10], [30, 40, 20, 10]) == 0.8


def test_vocab_top_terms_by_source_semantics(spark):
    """Per-source rank-by-tf with term tie-break, plan compiles to the
    WindowGroupLimit pre-trim."""
    from sql_data_warehouse_and_analytics_project_spark.operators import packing as pk
    from sql_data_warehouse_and_analytics_project_spark.sources import tpch
    from conftest import SF_DIR

    df = pk.vocab_top_terms_by_source(spark, SF_DIR, k=3)
    rows = df.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append((r["rk"], r["tf"], r["term"]))
    for src, lst in by_src.items():
        assert [x[0] for x in sorted(lst)] == list(range(1, len(lst) + 1))
        tfs = [x[1] for x in sorted(lst)]
        assert tfs == sorted(tfs, reverse=True)
        assert len(lst) <= 3
    plan = audit.formatted_plan(df)
    assert "WindowGroupLimit" in plan
