"""Sequence packing and corpus vocabulary — the last-mile training-data ops
that turn a curated corpus into model-ready batches (north-star extension;
the reference, a pure T-SQL warehouse, has no analog).

- **Sequence packing** assigns every document to a fixed token-budget chunk
  so a trainer can stream chunks instead of ragged documents. Greedy packing
  is inherently sequential, which fights a distributed engine; the standard
  scale shape is HASH-BUCKETED packing: route each doc to one of ``n_buckets``
  lanes by a deterministic key hash, then pack each lane independently with a
  running token sum. Each lane's cumulative window is a bounded sequential
  span (corpus/n_buckets); lanes are hash-uniform so no reducer is hot, and
  ``n_buckets`` scales with the cluster. The chunk id is
  ``floor(start_offset / budget)`` — a doc straddling a budget boundary
  starts its chunk late rather than splitting (assignment-level packing;
  token-level splitting is the trainer's job). Everything is md5-derived +
  integer arithmetic, so DuckDB replays the exact assignment.

- **Vocabulary top-k** is the seed step of tokenizer training and stopword
  discovery: corpus-wide term and document frequencies, top-k by count. Pure
  partial-aggregating groupBys + TakeOrderedAndProject — the same plan at
  any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch
from .text import _BPE_RE, _SQL_BPE_COUNT, SQL_TOKENS, tokens_col

_PACK_BUDGET = 2048  # tokens per chunk

# Packing-lane auto-sizing (r7, VERDICT r6 ask #2). A fixed lane count makes
# each lane's running-sum window a sequential span of corpus/n_buckets — at
# 100 TB with 32 lanes that is ~3 TB per reducer. Mirror similarity.py's
# auto_n_lists: derive the lane count from ONE cheap count aggregate so the
# per-lane span is bounded by _PACK_DOCS_PER_LANE regardless of corpus size.
# The formula is pure integer arithmetic on the count — ceil-div then clamp —
# so the DuckDB oracle replays the identical constant from the same COUNT(*)
# (see the nb CTE in _PACK_SQL) and assignments stay engine-reproducible.
_PACK_DOCS_PER_LANE = 50_000  # target lane span (rows per running-sum reducer)
_PACK_MIN_BUCKETS = 32  # floor: keep local[32]-grade parallelism even when tiny
_PACK_MAX_BUCKETS = 1 << 20  # sanity ceiling (at per-lane=50K: ~52e9 docs)


def auto_pack_buckets(n_docs: int, docs_per_lane: int = _PACK_DOCS_PER_LANE) -> int:
    """Lane count for ``n_docs`` documents: ceil(n_docs / docs_per_lane),
    clamped to [_PACK_MIN_BUCKETS, _PACK_MAX_BUCKETS]."""
    want = (n_docs + docs_per_lane - 1) // docs_per_lane
    return max(_PACK_MIN_BUCKETS, min(_PACK_MAX_BUCKETS, want))


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.load(spark, sf_dir, "documents")


_PACK_SQL = f"""
WITH nb AS (
  SELECT GREATEST({_PACK_MIN_BUCKETS}, LEAST({_PACK_MAX_BUCKETS},
         (COUNT(*) + {_PACK_DOCS_PER_LANE - 1}) // {_PACK_DOCS_PER_LANE})) AS n_buckets
  FROM documents
),
counted AS (
  SELECT doc_id,
         {_SQL_BPE_COUNT} AS n_bpe_tokens,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % (SELECT n_buckets FROM nb) AS bucket
  FROM documents
),
packed AS (
  SELECT doc_id, bucket, n_bpe_tokens,
         SUM(n_bpe_tokens) OVER (
           PARTITION BY bucket ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - n_bpe_tokens AS start_offset
  FROM counted
)
SELECT doc_id, bucket, n_bpe_tokens,
       CAST(start_offset // {_PACK_BUDGET} AS BIGINT) AS chunk_id
FROM packed
ORDER BY doc_id
"""


def pack_sequences(
    docs: DataFrame,
    budget: int = _PACK_BUDGET,
    n_buckets: int | None = None,
    docs_per_lane: int = _PACK_DOCS_PER_LANE,
) -> DataFrame:
    """(doc_id, bucket, n_bpe_tokens, chunk_id) chunk assignment — see the
    module docstring for the hash-bucketed packing shape. One narrow shuffle
    (hash-partition by bucket for the running sum); lanes are md5-uniform,
    so the plan has no hot key at any corpus size. ``n_buckets=None``
    (default) auto-sizes the lane count from a cheap count so each lane's
    sequential span stays ≤ ~_PACK_DOCS_PER_LANE rows at any corpus size;
    pass an explicit value to pin it."""
    if n_buckets is None:
        n_buckets = auto_pack_buckets(docs.count(), docs_per_lane)
    counted = docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(_BPE_RE)).cast("bigint").alias("n_bpe_tokens"),
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
                "bigint"
            )
            % n_buckets
        ).alias("bucket"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        counted.withColumn(
            "start_offset", F.sum("n_bpe_tokens").over(w) - F.col("n_bpe_tokens")
        )
        .select(
            "doc_id",
            "bucket",
            "n_bpe_tokens",
            F.floor(F.col("start_offset") / budget).cast("bigint").alias("chunk_id"),
        )
        .orderBy("doc_id")
    )


@query("pack_token_chunks", oracle=_PACK_SQL, defer=True)
def pack_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing over the documents table: every doc
    lands in a (bucket, chunk_id) training chunk of ~2048 BPE-ish tokens,
    deterministically and engine-reproducibly."""
    return pack_sequences(_docs(spark, sf_dir))


_VOCAB_SQL = f"""
WITH toks AS (
  SELECT doc_id, lower(UNNEST({SQL_TOKENS})) AS term FROM documents
),
stats AS (
  SELECT term,
         COUNT(*) AS tf,
         COUNT(DISTINCT doc_id) AS df
  FROM toks GROUP BY term
)
SELECT term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
FROM stats
ORDER BY tf DESC, term
LIMIT 100
"""


@query("vocab_top_terms", oracle=_VOCAB_SQL, defer=True)
def vocab_top_terms(spark: SparkSession, sf_dir: str, k: int = 100) -> DataFrame:
    """Corpus vocabulary: top-k lowercased whitespace terms by term
    frequency, with document frequency — the seed statistics for tokenizer
    training and stopword discovery. Plan: one explode → partial-aggregating
    groupBy(term, doc_id) for df → groupBy(term) rollup → ordered LIMIT
    (TakeOrderedAndProject); the only rows that reach the driver are k."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("raw")
    ).select("doc_id", F.lower(F.col("raw")).alias("term"))
    stats = toks.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf"),
        F.countDistinct("doc_id").cast("bigint").alias("df"),
    )
    return stats.orderBy(F.desc("tf"), F.asc("term")).limit(k)


_VOCAB_BY_SOURCE_SQL = f"""
WITH toks AS (
  SELECT source, lower(UNNEST({SQL_TOKENS})) AS term FROM documents
),
stats AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY source, term
)
SELECT source, term, tf, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT source, term, tf,
         row_number() OVER (PARTITION BY source ORDER BY tf DESC, term) AS rk
  FROM stats
)
WHERE rk <= 10
ORDER BY source, rk
"""


@query("vocab_top_terms_by_source", oracle=_VOCAB_BY_SOURCE_SQL, defer=True)
def vocab_top_terms_by_source(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Per-source top-k terms by frequency — the grouped twin of
    vocab_top_terms (per-slice stopword/template discovery; a source whose
    top terms diverge from its peers is a template or a contamination
    signal). Ranks on exact bigint counts with term tie-break; the
    row_number ≤ k filter compiles to WindowGroupLimit, so each source's
    candidate set is pre-trimmed before the shuffle."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "source", F.explode(tokens_col(F.col("text"))).alias("raw")
    ).select("source", F.lower(F.col("raw")).alias("term"))
    stats = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(F.desc("tf"), F.asc("term"))
    return (
        stats.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
        .orderBy("source", "rk")
    )


# --- Training-mix resampling ----------------------------------------------
#
# Rebalancing a corpus to target per-language (or per-source/domain)
# proportions is the composition step of every training-data pipeline.
# The exact-quota formulation (row_number per stratum over a hash order)
# needs a per-stratum global sort — one reducer per language is a hot key
# at 100 TB. The scale-right shape is DETERMINISTIC HASH THRESHOLDING:
# each stratum gets a keep-probability p = budget·weight / stratum_count
# (one KB-sized count aggregate, broadcast back), and a row is kept iff its
# md5-derived uniform u(doc_id) < p. Membership is a pure row function —
# no shuffle, no RNG, stable under repartitioning, identical in any engine
# — and the realized mix converges to the target at corpus scale (binomial
# error ~1/√n per stratum). u uses 13 md5 hex chars: 16^13 = 2^52 < 2^53,
# so the int→double division is exact in both engines.

_MIX_WEIGHTS = {"en": 0.40, "fr": 0.20, "de": 0.15, "es": 0.15, "zh": 0.10}
_MIX_BUDGET_FRAC = 0.5  # target corpus size as a fraction of the input

_MIX_CASE = "CASE " + " ".join(
    f"WHEN lang = '{k}' THEN {w}" for k, w in _MIX_WEIGHTS.items()
) + " ELSE 0.0 END"

_MIX_SQL = f"""
WITH counts AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_lang,
         CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n_total
  FROM documents GROUP BY lang
),
rates AS (
  SELECT lang, n_lang,
         least(1.0, (floor({_MIX_BUDGET_FRAC} * n_total) * ({_MIX_CASE})) / n_lang) AS p
  FROM counts
)
SELECT d.doc_id, d.lang
FROM documents d
JOIN rates r ON d.lang = r.lang
WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 13))::BIGINT
        / CAST(4503599627370496 AS DOUBLE) < r.p
ORDER BY d.doc_id
"""


def mix_resample(
    docs: DataFrame,
    weights: dict | None = None,
    budget_frac: float = _MIX_BUDGET_FRAC,
    stratum: str = "lang",
) -> DataFrame:
    """Deterministic hash-threshold resample of ``docs`` toward the target
    per-stratum ``weights`` at ``budget_frac`` of the input size — see the
    module note for why thresholding (not per-stratum quotas) is the shape
    that survives 100 TB. Returns the kept (doc_id, stratum) rows."""
    if weights is None:
        weights = _MIX_WEIGHTS
    counts = docs.groupBy(stratum).agg(F.count(F.lit(1)).cast("bigint").alias("n_s"))
    total = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    w_col = F.lit(0.0)
    for k, w in weights.items():
        w_col = F.when(F.col(stratum) == k, F.lit(float(w))).otherwise(w_col)
    rates = (
        counts.crossJoin(F.broadcast(total))
        .select(
            stratum,
            F.least(
                F.lit(1.0),
                (F.floor(F.lit(budget_frac) * F.col("n_total")) * w_col) / F.col("n_s"),
            ).alias("p"),
        )
    )
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10).cast(
        "bigint"
    ) / F.lit(float(1 << 52))
    return (
        docs.join(F.broadcast(rates), stratum)
        .filter(u < F.col("p"))
        .select("doc_id", stratum)
        .orderBy("doc_id")
    )


@query("mix_lang_resample", oracle=_MIX_SQL, headline=True, defer=True)
def mix_lang_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample the documents corpus to a target language mix (en 40 /
    fr 20 / de 15 / es 15 / zh 10) at half the corpus size, with
    deterministic engine-reproducible membership."""
    return mix_resample(_docs(spark, sf_dir))


# --- Temperature resampling -------------------------------------------------
#
# The multilingual-pretraining mixing rule (mBERT/XLM-R style): target
# share q_s ∝ p_s^α of the OBSERVED share p_s, α = 1/T < 1 (temperature
# T > 1), which flattens the distribution — tail strata keep a larger
# share than they have — without hand-writing a weights table. Same scale shape as mix_resample — membership stays a pure
# md5-threshold row function, zero data shuffle; only the per-stratum RATE
# derivation changes. Cross-engine float discipline: the exponent comes in
# as a literal, pow/floor/divide run on identical doubles via the SAME
# libm on both sides (rates are computed DRIVER-side with CPython's glibc
# pow — the oracle's DuckDB pow is the same glibc; a JVM Math.pow could
# drift a ulp, which is why the rate never touches F.pow), and the
# normalizer Σ p^(1/T) folds in SORTED-STRATUM order in both engines.

_TEMP_T = 2.0  # temperature; exponent alpha = 1/T = 0.5 as a literal in both engines
_TEMP_EXP = 0.5

_MIX_TEMP_SQL = f"""
WITH counts AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_lang,
         CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n_total
  FROM documents GROUP BY lang
),
expo AS (
  SELECT lang, n_lang, n_total,
         pow(CAST(n_lang AS DOUBLE) / CAST(n_total AS DOUBLE), {_TEMP_EXP}) AS e
  FROM counts
),
z AS (
  SELECT list_reduce(list(e ORDER BY lang), (a, b) -> a + b) AS z FROM expo
),
rates AS (
  SELECT lang, n_lang,
         least(1.0, (floor({_MIX_BUDGET_FRAC} * n_total) * (e / (SELECT z FROM z))) / n_lang) AS p
  FROM expo
)
SELECT d.doc_id, d.lang
FROM documents d
JOIN rates r ON d.lang = r.lang
WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 13))::BIGINT
        / CAST(4503599627370496 AS DOUBLE) < r.p
ORDER BY d.doc_id
"""


def temperature_rates(
    docs: DataFrame,
    exponent: float = _TEMP_EXP,
    budget_frac: float = _MIX_BUDGET_FRAC,
    stratum: str = "lang",
) -> dict[str, float]:
    """Per-stratum keep probabilities for temperature resampling, computed
    driver-side from the KB (stratum, count) aggregate: q_s ∝ (n_s/n)^exp
    normalized over a sorted-stratum fold, rate = min(1, ⌊budget·n⌋·q_s/n_s);
    exponent < 1 flattens, 1 is proportional thinning, > 1 sharpens.
    Driver libm == the oracle's libm, so rates are engine-exact."""
    import math

    rows = sorted(
        docs.groupBy(stratum).agg(F.count(F.lit(1)).cast("bigint").alias("n_s")).collect(),
        key=lambda r: r[stratum],
    )
    if not rows:
        return {}
    n_total = sum(r["n_s"] for r in rows)
    exps = [(r[stratum], math.pow(float(r["n_s"]) / float(n_total), exponent), r["n_s"]) for r in rows]
    z = 0.0
    for _, e, _ in exps:  # sorted-stratum fold, mirrored by the oracle
        z = z + e
    return {
        k: min(1.0, (math.floor(budget_frac * n_total) * (e / z)) / float(n_s))
        for k, e, n_s in exps
    }


def mix_temperature_resample(
    docs: DataFrame,
    exponent: float = _TEMP_EXP,
    budget_frac: float = _MIX_BUDGET_FRAC,
    stratum: str = "lang",
) -> DataFrame:
    """Deterministic temperature resample: tail strata keep a larger share
    than their observed one (exponent < 1 ⇔ T > 1 flattens). Membership is
    the same md5-threshold row function as :func:`mix_resample` — a scan-
    side filter with literal rates, no joins, no shuffle of the corpus."""
    rates = temperature_rates(docs, exponent, budget_frac, stratum)
    if not rates:
        return docs.select("doc_id", stratum).limit(0)
    p = F.lit(0.0)
    for k, rate in rates.items():
        p = F.when(F.col(stratum) == k, F.lit(rate)).otherwise(p)
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10).cast(
        "bigint"
    ) / F.lit(float(1 << 52))
    return docs.filter(u < p).select("doc_id", stratum).orderBy("doc_id")


@query("mix_temperature_lang", oracle=_MIX_TEMP_SQL, defer=True)
def mix_temperature_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened language resample (T = 2, half-corpus
    budget) with engine-reproducible membership."""
    return mix_temperature_resample(_docs(spark, sf_dir))


# --- Epoch-aware upsampling mix (r11) ---------------------------------------
#
# The missing half of the mixing family: mix_resample / temperature
# resampling can only THIN a stratum (keep-probability capped at 1), but
# real pretraining recipes REPEAT small high-quality sources — a stratum
# whose target share exceeds its observed share gets a rate r > 1, i.e.
# ~r epochs of that stratum in the output (the LLaMA-style "epochs per
# source" column). Deterministic shape: every doc of a stratum with rate
# r is emitted floor(r) times, plus one more iff its md5-13-hex uniform
# u < frac(r) — so the realized stratum size concentrates at r·n_s
# (exactly the hash-threshold rule, extended past 1.0). The replication
# is a per-row ``explode(sequence(1, c))`` with c ≤ ceil(r) — a pure
# row function over a broadcast rate table, zero corpus shuffle, and the
# output carries the epoch index so downstream packing can interleave
# epochs instead of concatenating them. Cross-engine: rates are plain
# double arithmetic on counts (identical IEEE ops in both engines — the
# mix_resample precedent), floor/frac/compare replay bit-for-bit.

_EPOCH_MIX_WEIGHTS = {"zh": 0.40, "en": 0.30, "fr": 0.10, "de": 0.10, "es": 0.10}
_EPOCH_MIX_BUDGET = 1.0  # output size target = 1.0x the corpus, re-mixed

_EPOCH_MIX_CASE = "CASE " + " ".join(
    f"WHEN lang = '{k}' THEN {w}" for k, w in _EPOCH_MIX_WEIGHTS.items()
) + " ELSE 0.0 END"

_EPOCH_MIX_SQL = f"""
WITH counts AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_lang,
         CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n_total
  FROM documents GROUP BY lang
),
rates AS (
  SELECT lang,
         (floor({_EPOCH_MIX_BUDGET} * n_total) * ({_EPOCH_MIX_CASE})) / n_lang AS r
  FROM counts
),
kept AS (
  SELECT d.doc_id, d.lang,
         CAST(FLOOR(r) AS BIGINT)
         + CASE WHEN ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 13))::BIGINT
                       / CAST(4503599627370496 AS DOUBLE) < r - FLOOR(r)
                THEN 1 ELSE 0 END AS c
  FROM documents d JOIN rates USING (lang)
)
SELECT doc_id, lang, CAST(UNNEST(range(1, c + 1)) AS BIGINT) AS epoch
FROM kept
WHERE c >= 1
ORDER BY doc_id, epoch
"""


def mix_epoch_resample(
    docs: DataFrame,
    weights: dict | None = None,
    budget_frac: float = _EPOCH_MIX_BUDGET,
    stratum: str = "lang",
) -> DataFrame:
    """(doc_id, stratum, epoch): the corpus re-mixed toward ``weights`` at
    ``budget_frac``x its size, with strata whose target exceeds their
    supply UPSAMPLED (docs repeated across epoch indices 1..c) — see the
    section note for the deterministic replication rule and why it stays
    a zero-shuffle row function at 100 TB."""
    if weights is None:
        weights = _EPOCH_MIX_WEIGHTS
    counts = docs.groupBy(stratum).agg(F.count(F.lit(1)).cast("bigint").alias("n_s"))
    total = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    w_col = F.lit(0.0)
    for k, w in weights.items():
        w_col = F.when(F.col(stratum) == k, F.lit(float(w))).otherwise(w_col)
    rates = counts.crossJoin(F.broadcast(total)).select(
        stratum,
        ((F.floor(F.lit(budget_frac) * F.col("n_total")) * w_col) / F.col("n_s")).alias(
            "r"
        ),
    )
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10).cast(
        "bigint"
    ) / F.lit(float(1 << 52))
    c = (
        F.floor("r").cast("bigint")
        + F.when(u < F.col("r") - F.floor("r"), F.lit(1)).otherwise(F.lit(0))
    ).alias("c")
    return (
        docs.join(F.broadcast(rates), stratum)
        .select("doc_id", stratum, c)
        .filter(F.col("c") >= 1)
        .select(
            "doc_id",
            stratum,
            F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("c"))).alias("epoch"),
        )
        .orderBy("doc_id", "epoch")
    )


@query("mix_epoch_upsample", oracle=_EPOCH_MIX_SQL, defer=True)
def mix_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-aware re-mix of the documents corpus toward (zh 40 / en 30 /
    fr 10 / de 10 / es 10) at 1.0x size — zh is upsampled to ~2.7 epochs,
    the rest thinned, all engine-reproducible."""
    return mix_epoch_resample(_docs(spark, sf_dir))


# --- Length-bucketed batching ----------------------------------------------
#
# Batches of similar-length sequences minimize padding waste (every batch
# pads to ITS max, not the corpus max — typically a 2-3x token saving for
# ragged corpora). The naive shape ranks the whole corpus in one
# ORDER BY n_tokens window; worse, real length distributions PILE UP
# around the median, so even banding alone leaves the median band a hot
# reducer. The scale shape reuses the packing-lane trick: partition by
# (length band × md5 lane) so every rank window's span is bounded by
# band_population/n_lanes, then cut each lane's hash-ordered run into
# fixed-size batches. Per-batch padding accounting (n·max − Σ) comes out
# of the same aggregate.

_BATCH_SIZE = 16       # sequences per batch
_BATCH_BAND_TOKENS = 8  # band width in BPE tokens
_BATCH_LANES = 8       # md5 lanes per band (auto-size like packing at scale)

_BATCH_SQL = f"""
WITH counted AS (
  SELECT doc_id,
         {_SQL_BPE_COUNT} AS n_toks,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT % {_BATCH_LANES} AS lane
  FROM documents
),
banded AS (
  SELECT doc_id, n_toks, lane, n_toks // {_BATCH_BAND_TOKENS} AS band FROM counted
),
pos AS (
  SELECT band, lane, n_toks,
         ROW_NUMBER() OVER (PARTITION BY band, lane
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS p
  FROM banded
)
SELECT CAST(band AS BIGINT) AS band,
       CAST(lane AS BIGINT) AS lane,
       CAST(p // {_BATCH_SIZE} AS BIGINT) AS batch_idx,
       CAST(COUNT(*) AS BIGINT) AS n_seqs,
       CAST(MAX(n_toks) AS BIGINT) AS max_len,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
       CAST(COUNT(*) * MAX(n_toks) - SUM(n_toks) AS BIGINT) AS padded_tokens
FROM pos
GROUP BY band, lane, p // {_BATCH_SIZE}
ORDER BY band, lane, batch_idx
"""


def batch_by_length(
    docs: DataFrame,
    batch_size: int = _BATCH_SIZE,
    band_tokens: int = _BATCH_BAND_TOKENS,
    n_lanes: int = _BATCH_LANES,
) -> DataFrame:
    """(band, lane, batch_idx, n_seqs, max_len, total_tokens,
    padded_tokens): fixed-size batches of length-banded sequences with
    per-batch padding accounting — see the section note for why the rank
    window partitions by (band × lane), never the corpus."""
    from pyspark.sql import Window

    if batch_size <= 0 or band_tokens <= 0 or n_lanes <= 0:
        raise ValueError("batch_size, band_tokens and n_lanes must be positive")
    md5 = F.md5(F.col("doc_id").cast("string"))
    counted = docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(_BPE_RE)).cast("bigint").alias("n_toks"),
        (F.conv(F.substring(md5, 9, 8), 16, 10).cast("bigint") % n_lanes).alias("lane"),
    ).withColumn("band", F.floor(F.col("n_toks") / band_tokens).cast("bigint"))
    w = Window.partitionBy("band", "lane").orderBy(md5, F.asc("doc_id"))
    pos = counted.withColumn("p", F.row_number().over(w) - 1)
    return (
        pos.groupBy(
            F.col("band").cast("bigint").alias("band"),
            F.col("lane").cast("bigint").alias("lane"),
            F.floor(F.col("p") / batch_size).cast("bigint").alias("batch_idx"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_seqs"),
            F.max("n_toks").cast("bigint").alias("max_len"),
            F.sum("n_toks").cast("bigint").alias("total_tokens"),
            (F.count(F.lit(1)) * F.max("n_toks") - F.sum("n_toks"))
            .cast("bigint")
            .alias("padded_tokens"),
        )
        .orderBy("band", "lane", "batch_idx")
    )


@query("pack_length_batches", oracle=_BATCH_SQL, defer=True)
def pack_length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed training batches over the documents corpus: 16
    sequences per batch within 8-token length bands, with the per-batch
    padding cost the trainer would pay."""
    return batch_by_length(_docs(spark, sf_dir))
