"""BPE tokenizer training: pure-Python reference parity, greedy-merge
semantics, OOV fallback, determinism, and the broadcast-encode plan pin.

``text_bpe_tokenize`` is rows-only by design (iterative argmax training has
no single-statement SQL twin); the reference parity here IS its
cross-implementation check.
"""

from __future__ import annotations

import pytest

import re
from collections import Counter

from conftest import SF_DIR
from pyspark.sql import functions as F

from sql_data_warehouse_and_analytics_project_spark.operators import bpe
from sql_data_warehouse_and_analytics_project_spark.plans import audit
from sql_data_warehouse_and_analytics_project_spark.sources import tpch


def _ref_bpe(texts, n_merges, min_freq=2):
    """Reference BPE (Sennrich-style) with the module's exact conventions:
    whitespace words of lowercased text, </w> marker, greedy left-to-right
    merge, winner = (max count, lexicographic l, lexicographic r)."""
    wc = Counter()
    for t in texts:
        for w in re.sub(r"\s+", " ", t.strip().lower()).split(" "):
            if w:
                wc[w] += 1
    vocab = {w: list(w) + ["</w>"] for w in wc}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wc[w]
        if not pc:
            break
        (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if cnt < min_freq:
            break
        merges.append((l, r))
        for w, syms in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            vocab[w] = out
    return merges, vocab


def _planted(spark):
    return spark.createDataFrame(
        [
            (0, "low low low lower lower newest newest newest widest"),
            (1, "newest newest newest widest widest low"),
        ],
        "doc_id int, text string",
    )


def test_bpe_matches_reference_on_planted_corpus(spark):
    docs = _planted(spark)
    merges, seg = bpe.train_bpe(docs, n_merges=10, min_freq=2)
    ref_merges, ref_vocab = _ref_bpe([r["text"] for r in docs.collect()], 10)
    assert merges == ref_merges
    assert {r["word"]: list(r["symbols"]) for r in seg.collect()} == ref_vocab


def test_bpe_matches_reference_on_documents(spark):
    """The real corpus at sf0.001: merge list and final segmentation must be
    bit-identical to the reference implementation."""
    docs = tpch.load(spark, SF_DIR, "documents")
    merges, seg = bpe.train_bpe(docs, n_merges=16, min_freq=2)
    ref_merges, ref_vocab = _ref_bpe([r["text"] for r in docs.select("text").collect()], 16)
    assert merges == ref_merges
    assert len(merges) == 16  # a real corpus has at least 16 frequent pairs
    assert {r["word"]: list(r["symbols"]) for r in seg.collect()} == ref_vocab


def test_merge_pair_is_greedy_left_to_right(spark):
    """merge (a,a) over aaaa → [aa, aa], never the overlapping [a, aa, a]."""
    df = spark.createDataFrame([(["a", "a", "a", "a"],)], "symbols array<string>")
    out = df.select(bpe._merge_pair(F.col("symbols"), "a", "a").alias("s")).collect()
    assert list(out[0]["s"]) == ["aa", "aa"]


def test_merge_pair_exhaustive_vs_reference(spark):
    """The fold must reproduce greedy left-to-right pair replacement on
    EVERY symbol sequence up to length 4 over {a, b, ab} — including the
    overlap traps (aaa under (a,a)) and the re-formed-pair traps (ab,a
    under (ab,a) producing aba that must NOT re-merge)."""
    import itertools

    def ref_merge(syms, l, r):
        out = []
        for s in syms:
            if out and out[-1] == l and s == r:
                out[-1] = l + r
            else:
                out.append(s)
        return out

    alphabet = ["a", "b", "ab"]
    seqs = [
        list(s)
        for n in range(1, 5)
        for s in itertools.product(alphabet, repeat=n)
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(seqs)], "i int, symbols array<string>")
    for l, r in [("a", "a"), ("a", "b"), ("ab", "a"), ("b", "ab")]:
        got = {
            row["i"]: list(row["m"])
            for row in df.select("i", bpe._merge_pair(F.col("symbols"), l, r).alias("m")).collect()
        }
        for i, s in enumerate(seqs):
            assert got[i] == ref_merge(s, l, r), (s, l, r, got[i])


def test_bpe_encode_oov_falls_back_to_chars(spark):
    docs = _planted(spark)
    _, seg = bpe.train_bpe(docs, n_merges=10, min_freq=2)
    new = spark.createDataFrame([(9, "zq low")], "doc_id int, text string")
    row = bpe.bpe_encode(new, seg).collect()[0]
    toks = list(row["tokens"])
    assert toks[:3] == ["z", "q", "</w>"]  # OOV word → character units
    assert row["n_words"] == 2 and row["n_tokens"] == 3 + 1  # low → low</w> (1 unit)


def test_bpe_training_deterministic(spark):
    docs = _planted(spark)
    a, _ = bpe.train_bpe(docs, n_merges=8)
    b, _ = bpe.train_bpe(docs, n_merges=8)
    assert a == b


def test_bpe_encode_plan_broadcasts_vocab(spark):
    """Tokenization-by-lookup must broadcast the vocabulary side — the
    corpus is never shuffled by word for the join."""
    docs = tpch.load(spark, SF_DIR, "documents")
    _, seg = bpe.train_bpe(docs, n_merges=4, min_freq=2)
    plan = audit.executed_plan(bpe.bpe_encode(docs, seg))
    assert "BroadcastHashJoin" in plan, plan


@pytest.mark.slow
def test_batched_training_parity_adversarial(spark):
    """_select_merge_batch (r11): batched rounds must be bit-identical to
    one-at-a-time training even on corpora BUILT to interact — chained
    merges ((a,b) then (ab,ab)), merged-symbol collisions ((a,bc) vs
    (ab,c) both producing "abc"), and near-tie counts at the batch
    boundary. batch_k=1 degenerates to the old per-merge loop; every
    batch_k must agree with it and with the Python reference."""
    corpora = [
        # heavy repetition: (a,b) spawns (ab,ab) whose count rivals rank 2
        ["abababab abababab cdcdcdcd", "abababab cdcd cd cd"],
        # collision trap: "abc" reachable as (ab,c) and (a,bc)
        ["abc abc abc ab bc abc", "ab ab bc bc abc"],
        # flat counts: everything ties, lexicographic order decides all
        ["aa bb cc dd", "aa bb cc dd", "aa bb cc dd"],
        # one hot word dominating + long tail
        ["zzzz " * 8, "zz zy yz zzzz", "yy zz zzzz yyyy"],
    ]
    for texts in corpora:
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
        )
        ref_merges, ref_vocab = _ref_bpe(texts, 12, min_freq=2)
        for bk in (1, 4, 16):
            merges, seg = bpe.train_bpe(docs, n_merges=12, min_freq=2, batch_k=bk)
            assert merges == ref_merges, (texts, bk, merges, ref_merges)
            got = {r["word"]: list(r["symbols"]) for r in seg.collect()}
            assert got == ref_vocab, (texts, bk)


def test_batched_training_fewer_rounds(spark):
    """The batch must actually buy round-trips: on a corpus whose frequent
    pairs live on distinct characters (the typical shape — different words
    dominated by different letters), the 16-wide trainer needs strictly
    fewer pair-count rounds than merges learned (each round = one collect,
    so count rounds via a wrapped _select_merge_batch)."""
    import sql_data_warehouse_and_analytics_project_spark.operators.bpe as bpe_mod

    # doubled inner letters give each word a dominant pair that is disjoint
    # from the other words' dominant pairs AND strictly more frequent than
    # its own word-final (x, </w>) pairs — the shape that lets a round
    # accept several merges at once
    texts = ["aaab " * 5 + "cccd " * 4 + "eeef " * 3 + "gggh " * 2]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    calls = []
    orig = bpe_mod._select_merge_batch

    def counting(rows, min_freq, collection_full):
        out = orig(rows, min_freq, collection_full)
        calls.append(len(out))
        return out

    bpe_mod._select_merge_batch = counting
    try:
        merges, _ = bpe_mod.train_bpe(docs, n_merges=6, min_freq=2)
    finally:
        bpe_mod._select_merge_batch = orig
    ref_merges, _ = _ref_bpe(texts, 6, min_freq=2)
    assert merges == ref_merges
    assert len(merges) == sum(calls)
    assert len(calls) < len(merges), (calls, merges)


def test_select_merge_batch_property_parity():
    """Property test (r11): for randomized corpora, a pure-Python trainer
    that advances by _select_merge_batch rounds must produce EXACTLY the
    sequential reference merge list. This drives the subtle acceptance
    conditions (tie look-ahead, floor(cnt/2) bound, collection floor)
    through hundreds of corpora without paying a Spark job per example —
    the Spark trainer shares the same loop shape, so selection parity here
    plus the Spark-side adversarial test pins the whole algorithm."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from sql_data_warehouse_and_analytics_project_spark.operators.bpe import (
        _select_merge_batch,
    )

    def pair_counts(vocab, wc):
        pc = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wc[w]
        return pc

    def apply_merge(vocab, l, r):
        for w, syms in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            vocab[w] = out

    def sequential(wc, n_merges, min_freq):
        vocab = {w: list(w) + ["</w>"] for w in wc}
        merges = []
        for _ in range(n_merges):
            pc = pair_counts(vocab, wc)
            if not pc:
                break
            (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
            if cnt < min_freq:
                break
            merges.append((l, r))
            apply_merge(vocab, l, r)
        return merges

    def batched(wc, n_merges, min_freq, batch_k):
        vocab = {w: list(w) + ["</w>"] for w in wc}
        merges = []
        while len(merges) < n_merges:
            k = min(batch_k, n_merges - len(merges))
            pc = pair_counts(vocab, wc)
            rows = [
                {"l": l, "r": r, "cnt": c}
                for (l, r), c in sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
            ][:k]
            batch = _select_merge_batch(rows, min_freq, collection_full=len(rows) == k)
            if not batch:
                break
            for l, r in batch:
                apply_merge(vocab, l, r)
            merges.extend(batch)
        return merges

    words = st.text(alphabet="abc", min_size=1, max_size=6)
    corpus = st.dictionaries(words, st.integers(min_value=1, max_value=9), min_size=1, max_size=8)

    @settings(max_examples=300, deadline=None)
    @given(corpus, st.integers(min_value=1, max_value=12), st.sampled_from([2, 4, 16]))
    def check(wc, n_merges, batch_k):
        ref = sequential(wc, n_merges, min_freq=2)
        got = batched(wc, n_merges, min_freq=2, batch_k=batch_k)
        assert got == ref, (wc, n_merges, batch_k, got, ref)

    check()


def test_fixed_merge_training_matches_reference(spark):
    """train_bpe_fixed (the oracle-grade strict-sequential trainer) must
    reproduce the pure-Python reference at min_freq=1 for exactly
    n_merges rounds — same winners, same final segmentation."""
    docs = _planted(spark)
    texts = [r["text"] for r in docs.collect()]
    _, ref_vocab = _ref_bpe(texts, n_merges=8, min_freq=1)
    got = {
        r["word"]: r["pieces"] for r in bpe.train_bpe_fixed(docs, n_merges=8).collect()
    }
    want = {w: " ".join(syms) for w, syms in ref_vocab.items()}
    assert got == want, (got, want)


def test_fixed_merge_training_raises_when_exhausted(spark):
    """A corpus that runs out of mergeable pairs before n_merges must
    raise (the unrolled oracle cannot represent an early stop)."""
    import pytest as _pytest

    docs = spark.createDataFrame([(0, "a a a")], "doc_id int, text string")
    # word 'a' -> [a, </w>]: exactly one pair, so one merge exhausts it
    with _pytest.raises(ValueError, match="exhausted"):
        bpe.train_bpe_fixed(docs, n_merges=3)
