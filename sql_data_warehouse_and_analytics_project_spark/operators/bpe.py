"""Distributed BPE tokenizer training + corpus encoding.

The engine's token counting (``text.py``) assumes a tokenizer exists; this
module TRAINS one — byte-pair-encoding merge rules learned from the corpus
— and applies it, completing the tokenizer-induction stage of a training-
data pipeline.

Scale design (the part that matters at 100 TB): BPE statistics live on the
WORD VOCABULARY, not the corpus. The corpus is touched exactly twice —
once to build the (word, count) frame (one shuffle), once at encode time.
Every merge round then runs on the vocabulary frame only (|V| rows — tens
of millions at web scale, never terabytes): one adjacent-pair count
(partial-aggregated groupBy), one driver-side argmax over that KB-sized
aggregate, one shuffle-free merge projection. ``localCheckpoint`` per
round truncates the growing lineage the same way ``connected_components``
does (dedup.py). Encoding never replays merges over documents: the trained
vocabulary frame IS a word→tokens lookup table, so tokenization is a
broadcast join on the exploded words (word-level memoization — exactly how
fast BPE encoders work), with a character fallback for OOV words.

Determinism: the winning pair each round is (max count, then lexicographic
smallest left, then right) — total order, no RNG, so two trainings on the
same corpus are identical and a pure-Python reference implementation can
assert the merges bit-for-bit (tests/test_bpe.py). Training is inherently
sequential (merge N+1's counts depend on merge N), so there is no SQL
oracle; the registered query is rows-only by design and the cross-check
is the Python reference.

Pre-tokenization follows the house convention (``text.py``): whitespace
words of lowercased, trimmed text; each word gets a ``</w>`` end-of-word
marker so word-final units stay distinct (Sennrich et al., 2016).

ref: beyond the reference surface (north-star training-data extension).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import SparkSession

from ..registry import query
from ..sources import tpch
from .text import normalize_content

_EOW = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over whitespace words of normalized text — the ONE
    corpus-wide shuffle training pays. Empty strings (blank docs) drop."""
    return (
        docs.select(F.explode(F.split(normalize_content(F.col(text_col)), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("count"))
    )


def _init_symbols(word: Column) -> Column:
    """Character-split plus the end-of-word marker: "ab" → [a, b, </w>]."""
    chars = F.filter(F.split(word, ""), lambda c: c != "")
    return F.concat(chars, F.array(F.lit(_EOW)))


def _adjacent_pairs(symbols: Column) -> Column:
    """array<struct<l,r>> of adjacent symbol pairs (empty for 1-symbol words)."""
    n = F.size(symbols)
    return F.zip_with(
        F.slice(symbols, 1, n - 1),
        F.slice(symbols, 2, n - 1),
        lambda l, r: F.struct(l.alias("l"), r.alias("r")),
    )


def _merge_pair(symbols: Column, left: str, right: str) -> Column:
    """Greedy left-to-right replacement of the adjacent pair (left, right)
    with the concatenated symbol — one array fold, shuffle-free. The fold
    merges when the accumulator's last element is ``left`` and the incoming
    symbol is ``right``; a just-merged token can't re-trigger (it is longer
    than ``left``), which reproduces the standard non-overlapping scan —
    e.g. merge (a,a) turns aaaa into [aa, aa]."""
    lit_l, lit_r = F.lit(left), F.lit(right)
    merged = F.lit(left + right)
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == lit_l) & (x == lit_r),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _select_merge_batch(
    rows, min_freq: int, collection_full: bool
) -> list[tuple[str, str]]:
    """Greedily pick the longest PREFIX of the rank-ordered top-K pair
    counts that is provably identical to applying them one at a time —
    the r11 answer to "one driver round-trip per merge rule" (a 32K-merge
    vocabulary must not be 32K sequential Spark jobs).

    Exactness argument (each accepted pair is the pair sequential BPE would
    pick next): merging (a,b)→ab only touches adjacencies involving a or b
    — counts of symbol-disjoint pairs never change — and every NEW pair it
    creates is bounded by an old interacting pair's count ((x,ab) ≤ old
    (x,a), (ab,y) ≤ old (b,y)) or by floor(cnt/2) for (ab,ab). So a
    candidate is accepted only while ALL of:

    - it shares no symbol (including the merged symbols) with any accepted
      pair — its own count is therefore still exact;
    - its count strictly exceeds floor(cnt_j/2) for every accepted pair j —
      no (m_j,m_j) pair can outrank it;
    - the scan has not yet hit a pair that interacts with an accepted pair
      (first such hit STOPS the batch: that pair's post-merge count is
      unknown, and it outranks everything below it); interacting pairs
      STRICTLY below the candidate's count stay strictly below — their
      post-merge counts only decrease and the pairs they spawn are bounded
      by them;
    - no LATER collected row TIED at the candidate's count interacts with
      the batch's symbols (its spawned pair can keep the tied count under
      a brand-new name — e.g. merging (e,w) turns (w, est</w>) into
      (ew, est</w>), which beats a tied (l, o) lexicographically — so the
      batch stops rather than guess the tie-break);
    - if the collection hit its limit, its count strictly exceeds the
      collection floor — an uncollected pair (or a new pair bounded by
      one) could otherwise tie it.

    Worst case the batch is a single pair — exactly the old behavior;
    typical corpora yield large disjoint prefixes (the most frequent pairs
    live on different characters), so driver round-trips drop from
    O(n_merges) to O(n_merges / batch)."""
    floor_k = rows[-1]["cnt"] if (rows and collection_full) else 0
    batch: list[tuple[str, str]] = []
    dirty: set[str] = set()
    accepted_cnts: list[int] = []
    for idx, row in enumerate(rows):
        left, right, cnt = row["l"], row["r"], row["cnt"]
        if cnt < min_freq:
            break
        merged = left + right
        if batch:
            if {left, right, merged} & dirty:
                break
            if any(cnt <= c // 2 for c in accepted_cnts):
                break
            if collection_full and cnt <= floor_k:
                break
            nd = dirty | {left, right, merged}
            tied_interacting = any(
                rows[j]["cnt"] == cnt
                and ({rows[j]["l"], rows[j]["r"], rows[j]["l"] + rows[j]["r"]} & nd)
                for j in range(idx + 1, len(rows))
            )
            if tied_interacting:
                break
        batch.append((left, right))
        dirty |= {left, right, merged}
        accepted_cnts.append(cnt)
    return batch


def train_bpe(
    docs: DataFrame,
    n_merges: int = 32,
    min_freq: int = 2,
    text_col: str = "text",
    batch_k: int = 16,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn up to ``n_merges`` merge rules; returns (merges, segmentation)
    where segmentation is the final (word, count, symbols) vocabulary frame
    — the lookup table :func:`bpe_encode` joins against. Stops early when
    no pair reaches ``min_freq`` (rarer merges would be corpus noise).

    Per round: ONE pair-count groupBy over |V| rows → collect the top
    ``batch_k`` pairs → :func:`_select_merge_batch` picks the provably
    sequential-identical prefix → ALL selected merges apply as one composed
    shuffle-free projection. Driver state is the merge list (N rows) plus
    one ``batch_k``-row collect per round; a 32K-merge production
    vocabulary costs ~n_merges/batch driver round-trips instead of 32K
    (parity with one-at-a-time training is asserted bit-for-bit by
    tests/test_bpe.py against the pure-Python reference)."""
    words = (
        word_counts(docs, text_col)
        .select("word", "count", _init_symbols(F.col("word")).alias("symbols"))
        .repartition(4)
        .localCheckpoint()
    )
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        k = min(batch_k, n_merges - len(merges))
        rows = (
            words.select("count", F.explode(_adjacent_pairs(F.col("symbols"))).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("count").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(k)
            .collect()
        )
        batch = _select_merge_batch(rows, min_freq, collection_full=len(rows) == k)
        if not batch:
            break
        sym = F.col("symbols")
        for left, right in batch:  # disjoint ⇒ order-free; keep rank order anyway
            sym = _merge_pair(sym, left, right)
        merges.extend(batch)
        words = words.withColumn("symbols", sym).localCheckpoint()
    return merges, words


def bpe_encode(
    docs: DataFrame,
    segmentation: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_words, n_tokens, tokens) per document — tokenization by
    LOOKUP, never by replaying merges: explode the document's words in
    position order, broadcast-join the trained word→symbols table, fall
    back to character units for OOV words, reassemble in order. The only
    corpus-wide work is the explode + one aggregation back to documents;
    the vocabulary side is broadcast (KBs–MBs)."""
    wpos = docs.select(
        F.col(id_col),
        F.posexplode(F.split(normalize_content(F.col(text_col)), r"\s+")).alias("pos", "word"),
    ).filter(F.col("word") != "")
    seg = F.broadcast(segmentation.select("word", "symbols"))
    toks = wpos.join(seg, "word", "left").select(
        id_col,
        "pos",
        F.coalesce(F.col("symbols"), _init_symbols(F.col("word"))).alias("toks"),
    )
    return (
        toks.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.array_sort(F.collect_list(F.struct("pos", "toks"))).alias("ordered"),
        )
        .select(
            id_col,
            "n_words",
            F.flatten(F.transform("ordered", lambda s: s.toks)).alias("tokens"),
        )
        .withColumn("n_tokens", F.size("tokens").cast("bigint"))
        .select(id_col, "n_words", "n_tokens", "tokens")
    )


@query("text_bpe_tokenize")
def text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a 32-merge BPE tokenizer on the documents corpus and encode
    the corpus with it: per-doc word/token counts plus the compression the
    learned merges bought over raw character units. Rows-only by design:
    OPEN-ENDED training (min-freq early stop, batched merges) is an
    iterative argmax loop no single SQL statement expresses; the
    cross-engine check is the pure-Python reference parity test
    (tests/test_bpe.py). The fixed-merge-count trajectory IS
    hash-verified — see ``text_bpe_fixed_merges`` below."""
    docs = tpch.load(spark, sf_dir, "documents")
    _, seg = train_bpe(docs, n_merges=32)
    enc = bpe_encode(docs, seg)
    n_chars = F.aggregate(
        F.col("tokens"),
        F.lit(0).cast("bigint"),
        # </w> markers are segmentation bookkeeping, not characters
        lambda acc, t: acc + F.length(F.replace(t, F.lit(_EOW), F.lit(""))).cast("bigint"),
    )
    return (
        enc.withColumn("n_char_units", n_chars + F.col("n_words"))  # chars + one </w>/word
        .select(
            "doc_id",
            "n_words",
            "n_tokens",
            F.round(
                F.col("n_tokens").cast("double") / F.col("n_char_units").cast("double"), 6
            ).alias("tokens_per_char_unit"),
        )
        .orderBy("doc_id")
    )


# --- fixed-merge-count training with a HARD oracle (r11) ---------------------
#
# text_bpe_tokenize is rows-only because open-ended training (early stop on
# min_freq, batched merges) is not one SQL statement. But a FIXED merge
# count is — the lr.py/kmeans.py unrolled-CTE pattern applies, and BPE is
# the easiest member of the family: every quantity is an integer count
# (no float discipline at all) and the argmax tie-break is lexicographic.
# Each round r unrolls to three MATERIALIZED CTEs: p{r} adjacent-pair
# counts, m{r} the ONE winning pair (max count, then smallest (l, r)),
# s{r+1} the merge applied to every word's symbol array by the same
# greedy left-to-right fold _merge_pair uses. The driver hash-checks the
# full merge trajectory through the final per-word segmentation.

_FIXED_MERGES = 8


def train_bpe_fixed(docs: DataFrame, n_merges: int = _FIXED_MERGES) -> DataFrame:
    """Strict-sequential BPE for exactly ``n_merges`` rounds (no batching,
    no min-freq stop — the oracle-grade twin of :func:`train_bpe`; raises
    if the corpus exhausts mergeable pairs early, which the unrolled SQL
    could not represent). Returns the final (word, count, pieces)
    segmentation, pieces space-joined, ordered by word."""
    words = (
        word_counts(docs)
        .select("word", "count", _init_symbols(F.col("word")).alias("symbols"))
        .localCheckpoint()
    )
    for r in range(n_merges):
        top = (
            words.select(
                "count", F.explode(_adjacent_pairs(F.col("symbols"))).alias("p")
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("count").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            raise ValueError(
                f"corpus exhausted mergeable pairs at round {r} < {n_merges}"
            )
        words = words.withColumn(
            "symbols", _merge_pair(F.col("symbols"), top[0]["l"], top[0]["r"])
        ).localCheckpoint()
    return words.select(
        "word",
        "count",
        F.concat_ws(" ", F.col("symbols")).alias("pieces"),
    ).orderBy("word")


def _bpe_fixed_sql(n_merges: int = _FIXED_MERGES) -> str:
    # The merge application replays _merge_pair's greedy non-overlapping
    # left-to-right scan as a padded-string replace: separators are
    # doubled (' a  b  c ') so adjacent pair matches cannot share a
    # boundary space, the pair pattern ' l  r ' rewrites to ' lr ', and
    # un-padding restores single separators. A merged token is strictly
    # longer than its parts, so replaced text can never re-trigger the
    # pattern — the exact semantics of the Spark-side array fold.
    from .text import SQL_NORM

    parts = [
        f"""WITH words AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS count
  FROM (SELECT UNNEST(string_split({SQL_NORM}, ' ')) AS word FROM documents)
  WHERE word <> ''
  GROUP BY word
),
s0 AS MATERIALIZED (
  SELECT word, count,
         array_to_string(
           list_append(list_transform(range(1, length(word) + 1), i -> word[i]),
                       '</w>'), ' ') AS pieces
  FROM words
)"""
    ]
    for r in range(n_merges):
        parts.append(f"""p{r} AS MATERIALIZED (
  SELECT l, r, SUM(count) AS cnt
  FROM (
    SELECT count,
           UNNEST(list_slice(syms, 1, len(syms) - 1)) AS l,
           UNNEST(list_slice(syms, 2, len(syms))) AS r
    FROM (SELECT count, string_split(pieces, ' ') AS syms FROM s{r})
  )
  GROUP BY l, r
),
m{r} AS MATERIALIZED (
  SELECT l, r FROM p{r} ORDER BY cnt DESC, l, r LIMIT 1
),
s{r + 1} AS MATERIALIZED (
  SELECT s.word, s.count,
         trim(replace(
           replace(' ' || replace(s.pieces, ' ', '  ') || ' ',
                   ' ' || m.l || '  ' || m.r || ' ',
                   ' ' || m.l || m.r || ' '),
           '  ', ' ')) AS pieces
  FROM s{r} s CROSS JOIN m{r} m
)""")
    return (
        ",\n".join(parts)
        + f"""
SELECT word, count, pieces
FROM s{n_merges} ORDER BY word"""
    )


_BPE_FIXED_SQL = _bpe_fixed_sql()


@query("text_bpe_fixed_merges", oracle=_BPE_FIXED_SQL)
def text_bpe_fixed_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE training itself under the hash check: 8 strict-sequential
    merge rounds whose pair counts, lexicographic argmax, and greedy
    left-to-right merge folds the DuckDB oracle replays through unrolled
    MATERIALIZED CTEs — the fixed-merge-count answer to
    ``text_bpe_tokenize``'s rows-only caveat. Pure integer counts: the
    one member of the hash-verified iterative family (lr/kmeans/
    pagerank) that needs no float-order discipline."""
    return train_bpe_fixed(tpch.load(spark, sf_dir, "documents"))
