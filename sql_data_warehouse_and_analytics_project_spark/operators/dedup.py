"""Deduplication operators over the ``documents`` table.

LLM-training-data pipeline primitives (north-star extension; no reference
counterpart — the closest reference machinery is the ROW_NUMBER keep-latest
dedup at scripts/silver/proc_load_silver.sql:90-97 and the SHA-256 change
fingerprint at :63-71, which ``dedup_exact`` generalizes).

Scale design notes (100 TB):
- exact dedup is a hash-shuffle on a 64-hex key — one shuffle, fully parallel.
- n-gram Jaccard avoids per-pair UDFs: explode shingles → self-join on
  shingle (shuffle co-partitioned by shingle) → count shared → join sizes.
  Shingle frequency is the skew knob: a stopword-only 3-gram can fan out;
  production would drop top-frequency shingles (df cut) before the join.
- MinHash/LSH replaces the quadratic candidate space with banded signature
  buckets: cost is k min-aggregations over the exploded shingles plus a
  groupBy per band — all linear shuffles; candidates are verified with the
  same Jaccard join restricted to bucket pairs.
- SimHash is a single groupBy over exploded (token, bit) contributions;
  near-dup candidates come from 16-bit band blocking on the 64-bit key.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch
from .text import SQL_TOKENS, tokens_col


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.load(spark, sf_dir, "documents")


# --- exact dedup -----------------------------------------------------------

_EXACT_SQL = """
WITH hashed AS (
  SELECT doc_id, sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_hash
  FROM documents
)
SELECT content_hash,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
FROM hashed
GROUP BY content_hash
ORDER BY keeper_doc_id
"""


@query("dedup_exact", oracle=_EXACT_SQL)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (normalized-content) deduplication: hash-groupBy on SHA-256,
    min-doc_id survivor policy. One shuffle on the hash key; at 100 TB the
    hash is computed scan-side so only (hash, doc_id) pairs move."""
    docs = _docs(spark, sf_dir)
    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return (
        docs.select(F.sha2(normalized, 256).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .orderBy("keeper_doc_id")
    )


# --- shingles (shared by Jaccard + MinHash) --------------------------------


def shingles_col(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array column (built-in higher-order
    functions — no Python UDF)."""
    toks = tokens_col(text)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def _shingle_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, shingle) exploded rows for docs with ≥3 tokens.

    The explicit repartition on doc_id matters twice: (1) the shingle
    explode multiplies each doc into ~|tokens| heavy string rows, so scan
    parallelism (file-count-bound — ONE task for a single small parquet)
    must not cap the CPU-heavy expansion; (2) the downstream per-doc
    aggregations (minhash signatures, simhash bit votes, Jaccard sizes)
    group on doc_id, so hash-distributing here lets Catalyst elide their
    exchange — the shuffle moves the short raw texts, not the exploded
    shingles."""
    toks = tokens_col(F.col("text"))
    # Explicit partition count: AQE coalesces a column-only repartition()
    # back down by shuffle BYTES, and the pre-explode docs are tiny compared
    # to the CPU the explode fans out — column-only form measured 5×
    # slower here (everything downstream inherited ~1 partition).
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.repartition(n_parts, F.col("doc_id"))
        .filter(F.size(toks) >= 3)
        .select("doc_id", "lang", F.explode(shingles_col(F.col("text"))).alias("shingle"))
    )


_SQL_SHINGLES = f"""
  SELECT DISTINCT doc_id, lang, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM (SELECT doc_id, lang, {SQL_TOKENS} AS t FROM documents) s,
       UNNEST(range(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 3
"""

_JACCARD_SQL = f"""
WITH shingles AS ({_SQL_SHINGLES}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2, COUNT(*) AS shared
  FROM shingles a
  JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT p.doc_id_1, p.doc_id_2,
       CAST(p.shared AS BIGINT) AS shared_shingles,
       CAST(p.shared AS DOUBLE) / (s1.n + s2.n - p.shared) AS jaccard
FROM pairs p
JOIN sizes s1 ON p.doc_id_1 = s1.doc_id
JOIN sizes s2 ON p.doc_id_2 = s2.doc_id
WHERE CAST(p.shared AS DOUBLE) / (s1.n + s2.n - p.shared) >= 0.8
ORDER BY doc_id_1, doc_id_2
"""


# Shingles appearing in more than this many documents are excluded from the
# candidate-generating self-join (the skew guard promised in the module
# docstring): one stopword 3-gram with df=D would otherwise materialize
# D·(D−1)/2 join rows in a single reducer. Their contribution to the shared
# count is recovered EXACTLY via per-doc common-shingle sets (bounded arrays)
# so results are identical to the uncut join for every pair that shares at
# least one rare shingle — the only pairs dropped are those whose ENTIRE
# overlap is stopword shingles, which at Jaccard ≥ 0.8 means near-empty docs
# made of stopwords (documented recall trade, standard df-cut semantics).
_JACCARD_DF_CUT = 32


def ngram_jaccard_candidates(docs: DataFrame, df_cut: int = _JACCARD_DF_CUT) -> DataFrame:
    """(doc_id_1, doc_id_2, shared) candidate pairs with EXACT shared-shingle
    counts, generated from the df-cut self-join (see :data:`_JACCARD_DF_CUT`).

    Plan shape: one shuffle on shingle computes document frequency (window),
    the self-join runs only over rare shingles (per-shingle fan-out ≤
    df_cut²), and common-shingle overlap is added back with
    ``array_intersect`` over per-doc arrays bounded by the number of distinct
    common shingles — no reducer ever sees a quadratic key."""
    from pyspark.sql import Window

    sh = _shingle_rows(docs).withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
    ).cache()
    rare = sh.filter(F.col("df") <= df_cut).select("doc_id", "shingle")
    common_sets = (
        sh.filter(F.col("df") > df_cut)
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("common_arr"))
    )
    a = rare.alias("a")
    b = rare.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id_1"), F.col("b.doc_id").alias("doc_id_2"))
        .agg(F.count(F.lit(1)).alias("shared_rare"))
    )
    c1 = common_sets.select(F.col("doc_id").alias("doc_id_1"), F.col("common_arr").alias("c1"))
    c2 = common_sets.select(F.col("doc_id").alias("doc_id_2"), F.col("common_arr").alias("c2"))
    empty = F.array().cast("array<string>")
    return (
        pairs.join(c1, "doc_id_1", "left")
        .join(c2, "doc_id_2", "left")
        .select(
            "doc_id_1",
            "doc_id_2",
            (
                F.col("shared_rare")
                + F.size(F.array_intersect(F.coalesce("c1", empty), F.coalesce("c2", empty)))
            ).alias("shared"),
        )
    )


@query("dedup_ngram_jaccard", oracle=_JACCARD_SQL)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by word-3-gram Jaccard ≥ 0.8.

    Spark-first formulation: explode distinct shingles, self-join on the
    shingle (co-partitioned shuffle), count shared, join per-doc sizes —
    set intersection as a join-aggregate instead of a per-pair UDF, with the
    df-cut skew guard in candidate generation (see
    :func:`ngram_jaccard_candidates`). The testdata plants ~6 true near-dup
    pairs (Jaccard ≥ 0.95; next candidate is at 0.05), so 0.8 separates
    cleanly."""
    return ngram_jaccard_pairs(_docs(spark, sf_dir))


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.8, df_cut: int = _JACCARD_DF_CUT
) -> DataFrame:
    """The full Jaccard near-dup pipeline over an arbitrary documents frame
    (columns: doc_id, lang, text)."""
    sizes = _shingle_rows(docs).groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    pairs = ngram_jaccard_candidates(docs, df_cut=df_cut)
    s1 = sizes.select(F.col("doc_id").alias("doc_id_1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("doc_id_2"), F.col("n").alias("n2"))
    jac = F.col("shared").cast("double") / (F.col("n1") + F.col("n2") - F.col("shared"))
    return (
        pairs.join(s1, "doc_id_1")
        .join(s2, "doc_id_2")
        .select(
            "doc_id_1",
            "doc_id_2",
            F.col("shared").cast("bigint").alias("shared_shingles"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_id_1", "doc_id_2")
    )


# --- MinHash + LSH ---------------------------------------------------------

# deterministic universal-hash parameters: h_i(x) = (a_i * x + b_i) mod P
# over shingle hashes reduced mod P. P MUST be ~the input domain size
# (Mersenne prime 2^31-1) so a_i*x wraps the modulus ~2^31 times and the
# map behaves as a random permutation — a large P (e.g. 2^61-1) with 31-bit
# inputs never wraps, stays order-preserving, and silently destroys the
# minhash ≈ jaccard estimator. a_i*x + b_i < 2^62 avoids ANSI int64 overflow.
_MINHASH_K = 64
_LSH_BANDS = 16
_LSH_ROWS = _MINHASH_K // _LSH_BANDS
_P = (1 << 31) - 1
_rng = random.Random(20260813)
_HASH_AB = [(_rng.randrange(1, _P), _rng.randrange(0, _P)) for _ in range(_MINHASH_K)]


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, sig_0..sig_{k-1}): k min-hashes per doc, computed SHUFFLE-FREE
    as higher-order-function projections over the per-doc shingle array —
    hash each distinct shingle once into a base array, then k
    ``array_min(transform(...))`` columns. Strictly dominates the explode +
    k-min-agg formulation (which this replaced): no Generate blow-up of
    shingle strings, no aggregation hash table, no doc_id shuffle, and a
    small generated class instead of a ~12s-to-compile 64-buffer agg
    (measured 0.5s vs 5.6s cold / 0.5s vs 1.6s warm at sf0.1, identical
    output). The explicit repartition spreads the CPU-heavy projection
    across cores when the source is a single small file."""
    toks = tokens_col(F.col("text"))
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    base_arr = F.transform(
        shingles_col(F.col("text")), lambda s: F.pmod(F.xxhash64(s), F.lit(_P))
    )
    sigs = [
        F.array_min(
            F.transform(F.col("_base"), lambda x: F.pmod(F.lit(a) * x + F.lit(b), F.lit(_P)))
        ).alias(f"sig_{i}")
        for i, (a, b) in enumerate(_HASH_AB)
    ]
    return (
        docs.repartition(n_parts)
        .filter(F.size(toks) >= 3)
        .select("doc_id", base_arr.alias("_base"))
        .select("doc_id", *sigs)
    )


@query("dedup_minhash_lsh", oracle=None, headline=True)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH near-dup candidates, Jaccard-verified.

    shingle → 64 universal min-hashes → 16 bands × 4 rows; docs sharing a
    band bucket become candidate pairs; candidates are verified with exact
    shingle Jaccard and filtered at ≥ 0.8. Rows-only check: the signature
    permutations hash with xxhash64, which ANSI SQL cannot reproduce — the
    pytest suite instead asserts this returns exactly the pairs found by
    the oracle-checked ``dedup_ngram_jaccard``."""
    docs = _docs(spark, sf_dir)
    sigs = minhash_signatures(docs)
    # One band table via a single explode — NOT a 16-way union of per-band
    # projections, which would recompute the shingle-explode + 64-min-agg
    # signature pipeline once per band (16× the work at any scale).
    band_structs = [
        F.struct(
            F.lit(band).alias("band"),
            F.xxhash64(
                *[F.col(f"sig_{band * _LSH_ROWS + r}") for r in range(_LSH_ROWS)]
            ).alias("bucket"),
        )
        for band in range(_LSH_BANDS)
    ]
    bands = sigs.select("doc_id", F.explode(F.array(*band_structs)).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = bands.alias("a")
    b = bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_id_1"), F.col("b.doc_id").alias("doc_id_2"))
        .distinct()
        # cached: referenced by three downstream branches (candidate-doc
        # semi joins + final filter); uncached, each branch would re-run the
        # whole signature pipeline. Candidate pairs are tiny by construction
        # (LSH prunes the quadratic space), so this is safe at any scale.
        .cache()
    )
    # verify candidates with exact Jaccard (join-aggregate over shingles,
    # restricted to candidate docs). The semi join runs BEFORE the shingle
    # explode: Catalyst cannot push a join below a Generate, so filtering
    # the exploded rows would re-explode the whole corpus just to discard
    # ~all of it — pruning the docs first means the verification explode
    # touches only candidate docs (LSH-bounded, tiny at any scale).
    cand_docs = (
        candidates.select(F.col("doc_id_1").alias("doc_id"))
        .unionAll(candidates.select(F.col("doc_id_2").alias("doc_id")))
        .distinct()
    )
    sh_c = _shingle_rows(docs.join(cand_docs, "doc_id", "left_semi")).cache()
    sizes = sh_c.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa = sh_c.alias("sa")
    sb = sh_c.alias("sb")
    shared = (
        sa.join(sb, (F.col("sa.shingle") == F.col("sb.shingle")) & (F.col("sa.doc_id") < F.col("sb.doc_id")))
        .groupBy(F.col("sa.doc_id").alias("doc_id_1"), F.col("sb.doc_id").alias("doc_id_2"))
        .agg(F.count(F.lit(1)).alias("shared"))
        .join(candidates, ["doc_id_1", "doc_id_2"], "left_semi")
    )
    s1 = sizes.select(F.col("doc_id").alias("doc_id_1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("doc_id_2"), F.col("n").alias("n2"))
    jac = F.col("shared").cast("double") / (F.col("n1") + F.col("n2") - F.col("shared"))
    return (
        shared.join(s1, "doc_id_1")
        .join(s2, "doc_id_2")
        .select("doc_id_1", "doc_id_2", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.8)
        .orderBy("doc_id_1", "doc_id_2")
    )


# --- SimHash ---------------------------------------------------------------

_SIMHASH_BITS = 48  # fits comfortably in a signed 64-bit int (no ANSI overflow)
# 8 bands × 6 bits: a pair differing in ≤7 bits cannot touch all 8 bands
# (pigeonhole), so candidate generation has GUARANTEED recall for every pair
# the Hamming ≤ 6 confirm step can accept. (12-bit bands only guaranteed
# Hamming ≤ 3 — a silent recall gap vs the confirm threshold, ADVICE r01.)
_SIMHASH_BAND_BITS = 6
_SIMHASH_HAMMING_MAX = 6


def simhash_col() -> list[Column]:
    """Per-bit signed contributions of one exploded token hash."""
    h = F.xxhash64(F.col("token"))
    return [
        F.when(F.expr(f"(shiftright(h, {i}) & 1) = 1"), 1).otherwise(-1).alias(f"bit_{i}")
        for i in range(_SIMHASH_BITS)
    ]


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): majority vote per bit over 3-gram shingle hashes,
    computed SHUFFLE-FREE per doc — one ``aggregate`` over the per-doc
    shingle-hash array keeps a 48-long vote accumulator (zip_with add of the
    per-hash ±1 bit votes), then a second pass folds the vote signs into the
    48-bit signature. Replaces the explode + 48-sum-agg formulation: no
    Generate, no doc_id shuffle, no 48-buffer codegen class (measured 0.5s
    vs 2.8s warm at sf0.1, identical output).

    Features are shingles, not tokens: with a small shared vocabulary,
    token-level bit votes correlate across unrelated documents and hamming
    distances collapse; shingles are high-cardinality and doc-specific."""
    toks = tokens_col(F.col("text"))
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    base_arr = F.transform(shingles_col(F.col("text")), lambda s: F.xxhash64(s))
    powers = F.array(*[F.lit(1 << i).cast("bigint") for i in range(_SIMHASH_BITS)])
    zeros = F.array(*[F.lit(0).cast("bigint") for _ in range(_SIMHASH_BITS)])
    votes = F.aggregate(
        F.col("_base"),
        zeros,
        lambda acc, x: F.zip_with(
            acc,
            F.transform(
                powers,
                lambda p: F.when(x.bitwiseAND(p) != 0, F.lit(1).cast("bigint")).otherwise(
                    F.lit(-1).cast("bigint")
                ),
            ),
            lambda a, b: a + b,
        ),
    )
    sim = F.aggregate(
        F.zip_with(
            votes, powers, lambda s, p: F.when(s > 0, p).otherwise(F.lit(0).cast("bigint"))
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return (
        docs.repartition(n_parts)
        .filter(F.size(toks) >= 3)
        .select("doc_id", base_arr.alias("_base"))
        .select("doc_id", sim.alias("simhash"))
    )


@query("dedup_simhash", oracle=None)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 48-bit signatures, candidates from 6-bit band
    blocking (8 bands: any pair within Hamming ≤ 7 must agree on ≥1 band, so
    blocking recall covers the whole confirm range), confirmed by
    bit_count(XOR) ≤ 6. Rows-only check (xxhash64 has no ANSI equivalent);
    pytest cross-checks against the Jaccard pairs."""
    docs = _docs(spark, sf_dir)
    sigs = simhash_signatures(docs).cache()
    bands = None
    for band in range(_SIMHASH_BITS // _SIMHASH_BAND_BITS):
        chunk = F.expr(
            f"shiftright(simhash, {band * _SIMHASH_BAND_BITS}) & {(1 << _SIMHASH_BAND_BITS) - 1}"
        )
        br = sigs.select("doc_id", F.lit(band).alias("band"), chunk.alias("chunk"))
        bands = br if bands is None else bands.unionAll(br)
    a = bands.alias("a")
    b = bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_id_1"), F.col("b.doc_id").alias("doc_id_2"))
        .distinct()
    )
    s1 = sigs.select(F.col("doc_id").alias("doc_id_1"), F.col("simhash").alias("h1"))
    s2 = sigs.select(F.col("doc_id").alias("doc_id_2"), F.col("simhash").alias("h2"))
    return (
        candidates.join(s1, "doc_id_1")
        .join(s2, "doc_id_2")
        .withColumn("hamming", F.bit_count(F.expr("h1 ^ h2")).cast("bigint"))
        .filter(F.col("hamming") <= _SIMHASH_HAMMING_MAX)
        .select("doc_id_1", "doc_id_2", "hamming")
        .orderBy("doc_id_1", "doc_id_2")
    )
