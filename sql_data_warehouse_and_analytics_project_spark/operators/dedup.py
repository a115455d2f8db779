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
from .text import SQL_NORM, SQL_TOKENS, normalize_content, tokens_col


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


@query("dedup_exact", oracle=_EXACT_SQL, defer=True)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (normalized-content) deduplication: hash-groupBy on SHA-256,
    min-doc_id survivor policy. One shuffle on the hash key; at 100 TB the
    hash is computed scan-side so only (hash, doc_id) pairs move."""
    docs = _docs(spark, sf_dir)
    normalized = normalize_content(F.col("text"))
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


def shingles_from(tcol: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a MATERIALIZED token-array
    column (built-in higher-order functions — no Python UDF).

    ``tcol`` must be a bound column, not a tokenizer expression: HOF
    lambdas are interpreted, so a lambda body that references an
    expression re-evaluates it PER ELEMENT — ``slice(split(text), …)``
    inside this transform re-tokenized the whole document once per
    shingle position, O(|tokens|²) per doc (r18 profile: the CDC variant
    of the same bug burned 114 CPU-seconds on a 0.3 CPU-second boundary
    scan). Callers stage ``tokens_col(text)`` into a column first (the
    winnow_fingerprints discipline); multi-use of a non-cheap alias
    keeps CollapseProject from re-inlining it."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(tcol) - n),
            lambda i: F.concat_ws(" ", F.slice(tcol, i + 1, n)),
        )
    )


def shingles_col(text: Column, n: int = 3) -> Column:
    """Shingles straight from a text expression — convenience form for
    row-at-a-time tests; pipeline code stages tokens first and calls
    :func:`shingles_from` (see its warning)."""
    return shingles_from(tokens_col(text), n)


def _spread(docs: DataFrame, spread: bool) -> DataFrame:
    """Round-robin repartition to core count, applied ONLY when the caller
    says the input may be narrow (``spread=True``, the default for direct
    calls) — a single small parquet file scans as one task, and the
    CPU-heavy signature projections downstream must not inherit that cap.
    Pipeline callers whose input is already post-shuffle (the LSH pipelines
    feed the exact-collapse join output, always shuffle.partitions wide)
    pass ``spread=False``: repartitioning there re-shuffles the full text
    payload for zero added parallelism — measured ~20% of the whole minhash
    pipeline at sf0.1 (5.1→3.9s). The caller-flag design is deliberate: a
    runtime ``.rdd.getNumPartitions()`` probe would finalize the AQE plan
    and execute the upstream shuffle stages as a side job — costlier than
    the repartition it avoids."""
    if spread:
        return docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    return docs


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
    # Explicit partition count: AQE coalesces a column-only repartition()
    # back down by shuffle BYTES, and the pre-explode docs are tiny compared
    # to the CPU the explode fans out — column-only form measured 5×
    # slower here (everything downstream inherited ~1 partition).
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    # r19: the >=3-token gate lives INSIDE the shingle expression (short
    # docs shingle to an empty array, which explode drops) — a separate
    # Filter would be pushed below the token projection with the alias
    # substituted, re-tokenizing every row a second time.
    guarded = F.when(F.size("_t") >= 3, shingles_from(F.col("_t"))).otherwise(
        F.array().cast("array<string>")
    )
    return (
        docs.repartition(n_parts, F.col("doc_id"))
        # stage tokens as a column so the shingle lambda doesn't
        # re-tokenize per element (see shingles_from)
        .select("doc_id", "lang", tokens_col(F.col("text")).alias("_t"))
        .select("doc_id", "lang", F.explode(guarded).alias("shingle"))
    )


def _sql_shingles(src: str) -> str:
    """The one shingle CTE both the Jaccard and MinHash/SimHash oracles
    share — a single source so the three oracles can never desynchronize."""
    return f"""
  SELECT DISTINCT doc_id, lang, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM (SELECT doc_id, lang, {SQL_TOKENS} AS t FROM {src}) s,
       UNNEST(range(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 3
"""


_SQL_SHINGLES = _sql_shingles("documents")

# one constant drives the Spark defaults AND the oracle SQL thresholds —
# hand-synced literal pairs silently desynchronize engines (review r6)
_NEARDUP_THRESHOLD = 0.8

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
WHERE CAST(p.shared AS DOUBLE) / (s1.n + s2.n - p.shared) >= {_NEARDUP_THRESHOLD}
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


def ngram_jaccard_candidates(
    docs: DataFrame,
    df_cut: int = _JACCARD_DF_CUT,
    shingles: DataFrame | None = None,
    _caches: list | None = None,
) -> DataFrame:
    """(doc_id_1, doc_id_2, shared) candidate pairs with EXACT shared-shingle
    counts, generated from the df-cut self-join (see :data:`_JACCARD_DF_CUT`).

    Plan shape: document frequency is a partial-aggregating ``groupBy`` over
    narrow (shingle) rows — map-side combine means the hottest shingle's
    reducer receives at most one partial count per map task, never the full
    row set (a Window over the shingle key would; VERDICT r04 #1). The
    high-df shingle list is then small by construction (≤ rows/df_cut), so
    the rare/common split is an anti/semi join that AQE converts to
    broadcast when it fits and skew-splits otherwise. The self-join runs
    only over rare shingles (per-shingle fan-out ≤ df_cut²), and
    common-shingle overlap is added back with ``array_intersect`` over
    per-doc arrays bounded by the number of distinct common shingles — no
    reducer ever sees a quadratic key.

    ``shingles`` lets a caller that already materialized the exploded
    shingle frame (e.g. :func:`ngram_jaccard_pairs`, which also needs
    per-doc sizes) share it instead of re-exploding the corpus.

    Cache contract (same as :func:`minhash_lsh_pairs`): when ``shingles``
    is None this function caches the shingle frame itself; that cache lives
    for the session unless the caller passes ``_caches=[]`` and unpersists
    the collected frames after materializing the result."""
    sh = shingles
    if sh is None:
        sh = _shingle_rows(docs).cache()
        if _caches is not None:
            _caches.append(sh)
    common = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > df_cut)
        .select("shingle")
    )
    rare = sh.join(common, "shingle", "left_anti").select("doc_id", "shingle")
    common_sets = (
        sh.join(common, "shingle", "left_semi")
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


def _materialized(df: DataFrame, caches: list, order: list[str] | None = None) -> DataFrame:
    """Registry-call cache discipline (ADVICE r6 / VERDICT r6 ask #5): run
    the pipeline NOW — eagerly localCheckpoint the small result frame —
    then free every internal cache, so no cached frame outlives the query
    call. The checkpoint holds only the result rows (near-dup pair sets,
    tiny by LSH/cap construction) and its blocks are released by Spark's
    ContextCleaner once the returned frame is dropped. Total work is
    unchanged: the harness was about to materialize the frame anyway.

    ``order`` re-applies the presentation sort AFTER the checkpoint: the
    checkpointed frame should be the pipeline's UNSORTED output, because
    eagerly executing a global orderBy pays a range-sampling job over the
    pipeline plus the sort itself — cost that an aggregate-only consumer
    (bench's count()) never pays on the lazy path, where Catalyst elides
    the sort. Sorting the checkpointed rows is trivial at result size."""
    out = df.localCheckpoint(eager=True)
    for c in caches:
        c.unpersist()
    if order:
        out = out.orderBy(*order)
    return out


@query("dedup_ngram_jaccard", oracle=_JACCARD_SQL, defer=True)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by word-3-gram Jaccard ≥ 0.8.

    Spark-first formulation: explode distinct shingles, self-join on the
    shingle (co-partitioned shuffle), count shared, join per-doc sizes —
    set intersection as a join-aggregate instead of a per-pair UDF, with the
    df-cut skew guard in candidate generation (see
    :func:`ngram_jaccard_candidates`). The testdata plants ~6 true near-dup
    pairs (Jaccard ≥ 0.95; next candidate is at 0.05), so 0.8 separates
    cleanly. The registry call materializes eagerly and releases the
    internal shingle cache before returning (see :func:`_materialized`)."""
    caches: list = []
    return _materialized(
        ngram_jaccard_pairs(_docs(spark, sf_dir), _caches=caches, _sorted=False),
        caches,
        order=["doc_id_1", "doc_id_2"],
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = _NEARDUP_THRESHOLD,
    df_cut: int = _JACCARD_DF_CUT,
    _caches: list | None = None,
    _sorted: bool = True,
) -> DataFrame:
    """The full Jaccard near-dup pipeline over an arbitrary documents frame
    (columns: doc_id, lang, text). The exploded shingle frame is
    materialized ONCE (cached) and shared between candidate generation and
    the per-doc size aggregate — the corpus explodes a single time
    (VERDICT r04 #2). ``_caches`` collects the cached frame for callers
    that run the pipeline repeatedly — same contract as
    :func:`minhash_lsh_pairs`."""
    sh = _shingle_rows(docs).cache()
    if _caches is not None:
        _caches.append(sh)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    pairs = ngram_jaccard_candidates(docs, df_cut=df_cut, shingles=sh)
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
    )
    return out.orderBy("doc_id_1", "doc_id_2") if _sorted else out


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

# Band buckets are capped at this many member docs (smallest doc_ids win,
# deterministically): a hot bucket — e.g. a boilerplate-heavy corpus where
# thousands of distinct near-dup clusters collide on one band — would
# otherwise fan out O(n²) candidate pairs inside a single reducer. Exact
# duplicates NEVER hit the cap (they are collapsed to one representative
# before LSH, see :func:`token_dedup_members`), so the cap only trims
# candidate recall across >cap DISTINCT clusters per bucket; audit what a
# corpus actually drops with :func:`lsh_bucket_overflow` (no-silent-caps).
_LSH_BUCKET_CAP = 64


def _md5_long(col: Column, n_hex: int) -> Column:
    """First ``n_hex`` hex chars of md5 as a positive bigint — the
    cross-engine-deterministic base hash (md5 is md5 everywhere; DuckDB
    reproduces it as ``('0x' || substr(md5(x), 1, n))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, n_hex), 16, 10).cast("bigint")


def _sql_md5_long(expr: str, n_hex: int) -> str:
    return f"('0x' || substr(md5({expr}), 1, {n_hex}))::BIGINT"


def token_dedup_members(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, text, rep_id) for docs with ≥3 tokens: exact-duplicate
    collapse keyed on md5 of the whitespace-token sequence (the strongest
    key under which shingle sets — hence signatures AND true Jaccard — are
    provably identical). rep_id = min doc_id of the group.

    Plan shape (VERDICT r05 #1): rep_id comes from a partial-aggregating
    ``groupBy("tkey")`` over NARROW (tkey, doc_id) rows — map-side combine
    means the hottest content key's reducer receives at most one partial
    min per map task, never the member rows. The (doc_id → rep_id) mapping
    is built by a second narrow join on tkey (34-byte keys + two bigints;
    10⁶ copies of a boilerplate page is ~50 MB on one reducer, vs the same
    10⁶ rows WITH their text payloads under the previous
    ``min() OVER (PARTITION BY tkey)`` formulation), and text is reattached
    by joining on doc_id — a unique key, so no reducer is ever hot. Costs
    one extra corpus scan vs the window form; scans parallelize, hot keys
    don't."""
    toks = tokens_col(F.col("text"))
    # r19: ONE tokenize pass for the whole collapse (was five over three
    # corpus scans). The size guard and the key share one split via
    # codegen subexpression elimination — valid ONLY because both live in
    # the SAME projection (a separate Filter re-evaluates it, measured
    # +33%); short docs get a NULL tkey and are dropped AFTER the narrow
    # checkpoint, which is a pushdown barrier. The text reattachment needs
    # no filter at all: the mapping's doc_ids are exactly the >=3-token
    # docs, so the inner join drops short docs for free and the text scan
    # never tokenizes.
    narrow = (
        docs.select(
            "doc_id",
            F.when(F.size(toks) >= 3, F.md5(F.concat_ws(" ", toks))).alias("tkey"),
        )
        .localCheckpoint(eager=True)
        .filter(F.col("tkey").isNotNull())
    )
    reps = narrow.groupBy("tkey").agg(F.min("doc_id").alias("rep_id"))
    mapping = narrow.join(reps, "tkey").select("doc_id", "rep_id")
    return docs.select("doc_id", "lang", "text").join(mapping, "doc_id")


def _cap_buckets(bands: DataFrame, cap: int) -> DataFrame:
    """Keep the ``cap`` smallest doc_ids per (band, bucket) — deterministic,
    so the DuckDB oracle reproduces it bit-for-bit via QUALIFY.

    Although written as a window, the ``row_number() <= cap`` filter
    triggers Catalyst's WindowGroupLimit pushdown (Partial before the
    Exchange, Final after — pinned in tests/test_plans.py): every map task
    pre-trims its slice of a hot bucket to ``cap`` rows before the shuffle,
    so the reducer for a pathological bucket receives O(cap × map_tasks)
    narrow rows, never the bucket's full membership."""
    from pyspark.sql import Window

    w = Window.partitionBy("band", "bucket").orderBy("doc_id")
    return (
        bands.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def lsh_bucket_overflow(bands: DataFrame, cap: int = _LSH_BUCKET_CAP) -> DataFrame:
    """(band, bucket, n_docs) for buckets larger than the cap — the audit
    surface for the deterministic candidate cap (no-silent-caps rule): a
    pipeline run at scale should count/log these before trusting recall."""
    return (
        bands.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > cap)
    )


def _expand_member_pairs(
    rep_pairs: DataFrame, members: DataFrame, intra_cols: list[Column], carry: list[str]
) -> DataFrame:
    """Expand representative-level near-dup pairs back to ALL member pairs so
    the collapsed pipeline's output is bit-identical to the uncollapsed
    ground truth: cross-group pairs inherit the rep pair's score (members
    have identical shingle sets, so identical Jaccard/Hamming), intra-group
    pairs get the exact-duplicate score (``intra_cols``). Joins are linear
    in output size — the quadratic intra-group blowup is inherent to the
    requested all-pairs OUTPUT, not to any shuffle key."""
    m1 = members.select(F.col("rep_id").alias("doc_id_1"), F.col("doc_id").alias("m1"))
    m2 = members.select(F.col("rep_id").alias("doc_id_2"), F.col("doc_id").alias("m2"))
    cross = (
        rep_pairs.join(m1, "doc_id_1")
        .join(m2, "doc_id_2")
        .select(
            F.least("m1", "m2").alias("doc_id_1"),
            F.greatest("m1", "m2").alias("doc_id_2"),
            *carry,
        )
    )
    a = members.alias("ma")
    b = members.alias("mb")
    intra = (
        a.join(
            b,
            (F.col("ma.rep_id") == F.col("mb.rep_id"))
            & (F.col("ma.doc_id") < F.col("mb.doc_id")),
        )
        .select(
            F.col("ma.doc_id").alias("doc_id_1"),
            F.col("mb.doc_id").alias("doc_id_2"),
            *intra_cols,
        )
    )
    return cross.unionAll(intra)


def _rep_shingle_sigs(reps: DataFrame) -> DataFrame:
    """(doc_id, _sh, sig_0..sig_63): per-rep distinct-shingle arrays AND
    their 64 min-hash signatures in ONE eager checkpoint — the single
    tokenize+shingle+hash pass that the band table, the Hamming-free verify
    leg, and the signature joins all read (r19; in r18 the verify leg
    re-tokenized + re-shingled candidate docs from text, and the first r19
    cut still paid two sequential checkpoint jobs — shingles, then
    signatures — where one materialization serves both).

    ``reps`` must already be filtered to >=3 tokens (token_dedup_members
    guarantees it), so no size filter here — a ``size(tokens)`` filter above
    the staged token projection re-tokenizes every row a second time:
    PushDownPredicates substitutes the alias into the pushed Filter, and
    whole-stage codegen does not share subexpressions across the
    Filter/Project boundary (verified on the executed plan). The hash chain
    is exactly :func:`minhash_signatures`'s (md5-derived, oracle-replayed)."""
    sigs = [
        F.array_min(
            F.transform(F.col("_base"), lambda x: F.pmod(F.lit(a) * x + F.lit(b), F.lit(_P)))
        ).alias(f"sig_{i}")
        for i, (a, b) in enumerate(_HASH_AB)
    ]
    return (
        reps.select("doc_id", tokens_col(F.col("text")).alias("_t"))
        .select("doc_id", shingles_from(F.col("_t")).alias("_sh"))
        .select(
            "doc_id",
            "_sh",
            F.transform(F.col("_sh"), lambda s: F.pmod(_md5_long(s, 15), F.lit(_P))).alias(
                "_base"
            ),
        )
        .select("doc_id", "_sh", *sigs)
        .localCheckpoint(eager=True)
    )


def minhash_signatures(docs: DataFrame, spread: bool = True) -> DataFrame:
    """(doc_id, sig_0..sig_{k-1}): k min-hashes per doc, computed SHUFFLE-FREE
    as higher-order-function projections over the per-doc shingle array —
    hash each distinct shingle once into a base array, then k
    ``array_min(transform(...))`` columns. Strictly dominates the explode +
    k-min-agg formulation (which this replaced): no Generate blow-up of
    shingle strings, no aggregation hash table, no doc_id shuffle, and a
    small generated class instead of a ~12s-to-compile 64-buffer agg
    (measured 0.5s vs 5.6s cold / 0.5s vs 1.6s warm at sf0.1, identical
    output). :func:`_spread` widens the CPU-heavy projection only when the
    source scan is narrower than the core count. The base hash is
    md5-derived (not xxhash64) so the DuckDB oracle can replay the exact
    signature pipeline."""
    sigs = [
        F.array_min(
            F.transform(F.col("_base"), lambda x: F.pmod(F.lit(a) * x + F.lit(b), F.lit(_P)))
        ).alias(f"sig_{i}")
        for i, (a, b) in enumerate(_HASH_AB)
    ]
    return (
        _spread(docs, spread)
        # stage tokens as a column so the shingle lambda doesn't
        # re-tokenize per element (see shingles_from; measured 1.6×
        # on this pass at sf0.1, bit-identical output)
        .select("doc_id", tokens_col(F.col("text")).alias("_t"))
        .filter(F.size("_t") >= 3)
        .select(
            "doc_id",
            F.transform(
                shingles_from(F.col("_t")), lambda s: F.pmod(_md5_long(s, 15), F.lit(_P))
            ).alias("_base"),
        )
        .select("doc_id", *sigs)
    )


# Shared oracle scaffolding: exact-dup collapse → rep shingles → (engine-
# specific signature/band CTEs) → capped buckets → candidate rep pairs →
# verify → expand back to member pairs. Mirrors the Spark pipeline step for
# step so the deterministic bucket cap binds identically in both engines.
def _sql_collapse(src: str) -> str:
    """The exact-dup-collapse CTE chain over an arbitrary source relation
    (doc_id, lang, text) — parameterized so composed-pipeline oracles
    (curation_report) can replay the collapse over intermediate stages."""
    return f"""
keyed AS (
  SELECT doc_id, lang, text,
         md5(array_to_string({SQL_TOKENS}, ' ')) AS tkey
  FROM {src}
  WHERE len({SQL_TOKENS}) >= 3
),
members AS (
  SELECT doc_id, lang, text, MIN(doc_id) OVER (PARTITION BY tkey) AS rep_id
  FROM keyed
),
reps AS (SELECT doc_id, lang, text FROM members WHERE doc_id = rep_id),
shingles AS ({_sql_shingles("reps")})
"""


_SQL_COLLAPSE = _sql_collapse("documents")

_SQL_MINHASH_SIGS = ",\n         ".join(
    f"MIN(({a}::BIGINT * h + {b}) % {_P}) AS sig_{i}" for i, (a, b) in enumerate(_HASH_AB)
)

_SQL_MINHASH_BANDS = "\n  UNION ALL\n".join(
    f"  SELECT doc_id, {band} AS band, "
    + " || ':' || ".join(f"sig_{band * _LSH_ROWS + r}::VARCHAR" for r in range(_LSH_ROWS))
    + " AS bucket FROM sigs"
    for band in range(_LSH_BANDS)
)

_SQL_CAP_CANDIDATES = f"""
capped AS (
  SELECT doc_id, band, bucket FROM bands
  QUALIFY row_number() OVER (PARTITION BY band, bucket ORDER BY doc_id) <= {_LSH_BUCKET_CAP}
),
candidates AS (
  SELECT DISTINCT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2
  FROM capped a
  JOIN capped b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)
"""

def _sql_minhash_pairs_over(src: str) -> str:
    """The COMPLETE MinHash/LSH pair oracle over an arbitrary (doc_id,
    lang, text) relation — `_MINHASH_SQL` is this over ``documents``; the
    curation_report oracle nests it per near-dedup pass."""
    return f"""
WITH
{_sql_collapse(src)},
hashed AS (
  SELECT doc_id, {_sql_md5_long("shingle", 15)} % {_P} AS h FROM shingles
),
sigs AS (
  SELECT doc_id,
         {_SQL_MINHASH_SIGS}
  FROM hashed GROUP BY doc_id
),
bands AS (
{_SQL_MINHASH_BANDS}
),
{_SQL_CAP_CANDIDATES},
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
shared AS (
  SELECT c.doc_id_1, c.doc_id_2, COUNT(*) AS shared
  FROM candidates c
  JOIN shingles sa ON sa.doc_id = c.doc_id_1
  JOIN shingles sb ON sb.doc_id = c.doc_id_2 AND sb.shingle = sa.shingle
  GROUP BY c.doc_id_1, c.doc_id_2
),
rep_pairs AS (
  SELECT p.doc_id_1, p.doc_id_2,
         CAST(p.shared AS DOUBLE) / (s1.n + s2.n - p.shared) AS jaccard
  FROM shared p
  JOIN sizes s1 ON p.doc_id_1 = s1.doc_id
  JOIN sizes s2 ON p.doc_id_2 = s2.doc_id
  WHERE CAST(p.shared AS DOUBLE) / (s1.n + s2.n - p.shared) >= {_NEARDUP_THRESHOLD}
)
SELECT least(m1.doc_id, m2.doc_id) AS doc_id_1,
       greatest(m1.doc_id, m2.doc_id) AS doc_id_2,
       p.jaccard
FROM rep_pairs p
JOIN members m1 ON m1.rep_id = p.doc_id_1
JOIN members m2 ON m2.rep_id = p.doc_id_2
UNION ALL
SELECT a.doc_id, b.doc_id, CAST(1.0 AS DOUBLE)
FROM members a JOIN members b ON a.rep_id = b.rep_id AND a.doc_id < b.doc_id
ORDER BY doc_id_1, doc_id_2
"""


_MINHASH_SQL = _sql_minhash_pairs_over("documents")


@query("dedup_minhash_lsh", oracle=_MINHASH_SQL, headline=True, defer=True)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH near-dup pairs, Jaccard-verified.

    exact-dup collapse (token-sequence key) → shingle → 64 md5-derived
    universal min-hashes → 16 bands × 4 rows → deterministically capped
    band buckets → candidate rep pairs → exact-Jaccard verify at ≥ 0.8 →
    expand back to all member pairs. Oracle-checked end to end: every hash
    in the pipeline is md5-derived, so DuckDB replays signatures, banding,
    the bucket cap, and verification bit-for-bit. The registry call
    materializes eagerly and releases the three internal caches before
    returning (see :func:`_materialized`)."""
    caches: list = []
    return _materialized(
        minhash_lsh_pairs(_docs(spark, sf_dir), _caches=caches, _sorted=False),
        caches,
        order=["doc_id_1", "doc_id_2"],
    )


def minhash_band_table(sigs: DataFrame) -> DataFrame:
    """(doc_id, band, bucket) LSH band table from a signature frame.

    One band table via a single explode — NOT a 16-way union of per-band
    projections, which would recompute the shingle-explode + 64-min-hash
    signature pipeline once per band (16× the work at any scale). The
    bucket id is the concatenated row signature (cross-engine string, no
    xxhash64) — band id disambiguates buckets across bands in the join."""
    band_structs = [
        F.struct(
            F.lit(band).alias("band"),
            F.concat_ws(
                ":", *[F.col(f"sig_{band * _LSH_ROWS + r}").cast("string") for r in range(_LSH_ROWS)]
            ).alias("bucket"),
        )
        for band in range(_LSH_BANDS)
    ]
    return sigs.select("doc_id", F.explode(F.array(*band_structs)).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def _candidate_shared_counts(
    sh_c: DataFrame, candidates: DataFrame, df_cut: int = _JACCARD_DF_CUT
) -> DataFrame:
    """EXACT (doc_id_1, doc_id_2, shared) distinct-shingle overlap for
    EVERY candidate pair, with the hot-shingle df-cut guard of
    :func:`ngram_jaccard_candidates` (r13 VERDICT ask #2).

    The naive verify leg self-joins candidate-doc shingles on the shingle
    key, so one boilerplate shingle present in ~all candidate docs fans
    out quadratically on a single reducer key. Here shingles with
    df > ``df_cut`` are split out: the self-join runs only over rare
    shingles (per-key fan-out ≤ df_cut²), and the hot shingles' overlap is
    recovered exactly via per-doc common-shingle arrays (bounded by the
    number of distinct hot shingles) intersected per pair. Unlike the
    ngram candidate GENERATOR — where a pair overlapping only in hot
    shingles is never generated (documented recall trade) — the pair list
    here is the LSH candidate set itself, so the recovery is exact for
    every pair: shared = shared_rare + |common₁ ∩ common₂|, bit-identical
    to the unguarded join.

    Form (r15, quiet-host bisect of the r14 1.76x bench reading): the
    guard consumes ``sh_c`` from several branches (df stats, the rare
    self-join's two sides, the hot collect_set), and without
    materialization EACH branch re-executes the whole candidate-shingle
    lineage (LSH banding + explode) — that recompute, plus the full
    shuffle+sort the r14 window-df form paid to annotate df, was the
    real cost, not ambient noise. So: (1) ``sh_c`` is localCheckpoint-ed
    once (bounded — candidate docs' shingles only, post-semi-join);
    (2) df stats partial-aggregate into a hot-shingle list that is tiny
    by construction (≤ occurrences/df_cut rows) and BROADCAST back for
    the rare/hot split — two map-side joins, no window sort. Measured
    interleaved at sf0.1 on a quiet host (probes at r13 levels):
    unguarded+ckpt 4.21 s, THIS form 4.88 s, r14 window-df 6.11 s —
    the protection now costs ~0.65 s instead of ~1.9 s, output
    bit-identical across all three."""
    sh_c = sh_c.localCheckpoint(eager=True)
    hot = F.broadcast(
        sh_c.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > df_cut)
        .select("shingle")
    )
    rare = sh_c.join(hot, "shingle", "left_anti").select("doc_id", "shingle")
    common_sets = (
        sh_c.join(hot, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("common_arr"))
    )
    ra, rb = rare.alias("ra"), rare.alias("rb")
    shared_rare = (
        ra.join(
            rb,
            (F.col("ra.shingle") == F.col("rb.shingle"))
            & (F.col("ra.doc_id") < F.col("rb.doc_id")),
        )
        .groupBy(F.col("ra.doc_id").alias("doc_id_1"), F.col("rb.doc_id").alias("doc_id_2"))
        .agg(F.count(F.lit(1)).alias("shared_rare"))
        .join(candidates, ["doc_id_1", "doc_id_2"], "left_semi")
    )
    c1 = common_sets.select(F.col("doc_id").alias("doc_id_1"), F.col("common_arr").alias("c1"))
    c2 = common_sets.select(F.col("doc_id").alias("doc_id_2"), F.col("common_arr").alias("c2"))
    empty = F.array().cast("array<string>")
    return (
        candidates.join(shared_rare, ["doc_id_1", "doc_id_2"], "left")
        .join(c1, "doc_id_1", "left")
        .join(c2, "doc_id_2", "left")
        .select(
            "doc_id_1",
            "doc_id_2",
            (
                F.coalesce(F.col("shared_rare"), F.lit(0))
                + F.size(F.array_intersect(F.coalesce("c1", empty), F.coalesce("c2", empty)))
            )
            .cast("bigint")
            .alias("shared"),
        )
    )


def _candidate_shared_arrays(
    reps: DataFrame,
    candidates: DataFrame,
    _caches: list | None = None,
    sh: DataFrame | None = None,
) -> DataFrame:
    """(doc_id_1, doc_id_2, shared, n1, n2): EXACT distinct-shingle overlap
    and per-doc distinct-shingle counts for every candidate pair, via
    per-doc shingle ARRAYS instead of a shingle-keyed self-join (r18).

    The r13–r17 verify leg re-exploded candidate docs to shingle rows,
    self-joined them on the shingle key (with the df-cut hot-shingle
    guard), partial-aggregated shared counts, and joined sizes back — five
    shuffles plus a checkpoint. But the candidate pair list ALREADY exists
    here (LSH-bounded), so overlap needs no join by shingle at all: build
    each candidate doc's distinct-shingle array once (the same projection
    the signature pass runs, no explode), attach both docs' arrays to each
    pair by doc_id — a unique key, so no reducer is ever hot — and fold
    ``size(array_intersect(...))`` per pair (hash-set intersection,
    O(|a|+|b|) per pair). Bit-identical to the guarded self-join (both
    count distinct shared shingles; pinned against it and a pure-Python
    oracle in tests/test_hot_shingle_guard.py), with NO shingle-keyed
    shuffle anywhere — the hot-boilerplate reducer blow-up the df-cut
    guard existed to contain simply has no join key to land on.

    Scale shape: each doc's array crosses the shuffle once per candidate
    pair it appears in (bounded by the band × bucket-cap discipline), and
    per-pair work is linear in the two docs' shingle counts — the same
    bytes the exploded form shuffled through its rare-join legs, in a
    quarter of the stages."""
    cand_docs = (
        candidates.select(F.col("doc_id_1").alias("doc_id"))
        .unionAll(candidates.select(F.col("doc_id_2").alias("doc_id")))
        .distinct()
    )
    if sh is not None:
        # shared-frame path (r19): the shingle arrays were already
        # materialized once for the signature pass — just prune to
        # candidate docs, no second tokenize+shingle pass
        src = sh.join(cand_docs, "doc_id", "left_semi")
    else:
        src = (
            reps.join(cand_docs, "doc_id", "left_semi")
            # staged token column — see shingles_from
            .select("doc_id", tokens_col(F.col("text")).alias("_t"))
            .filter(F.size("_t") >= 3)
            .select("doc_id", shingles_from(F.col("_t")).alias("_sh"))
        )
    arr = (
        src.select("doc_id", "_sh", F.size("_sh").cast("bigint").alias("_n"))
        # two consumers (the pair join's both sides) whose stages launch
        # concurrently — an EAGER checkpoint runs the candidate-doc shingle
        # projection exactly once AND sequentially materializes the
        # upstream mem/candidates caches before the final join job reads
        # them from several branches at once (a lazy .cache() here would
        # let those branches race and duplicate the signature pipeline)
        .localCheckpoint(eager=True)
    )
    if _caches is not None:
        _caches.append(arr)
    a1 = arr.select(
        F.col("doc_id").alias("doc_id_1"),
        F.col("_sh").alias("_sh1"),
        F.col("_n").alias("n1"),
    )
    a2 = arr.select(
        F.col("doc_id").alias("doc_id_2"),
        F.col("_sh").alias("_sh2"),
        F.col("_n").alias("n2"),
    )
    return (
        candidates.join(a1, "doc_id_1")
        .join(a2, "doc_id_2")
        .select(
            "doc_id_1",
            "doc_id_2",
            F.size(F.array_intersect("_sh1", "_sh2")).cast("bigint").alias("shared"),
            "n1",
            "n2",
        )
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = _NEARDUP_THRESHOLD,
    cap: int = _LSH_BUCKET_CAP,
    _caches: list | None = None,
    _sorted: bool = True,
) -> DataFrame:
    """The full MinHash/LSH near-dup pipeline over an arbitrary documents
    frame (columns: doc_id, lang, text). See :func:`dedup_minhash_lsh`.

    The pipeline caches three intermediates (members, candidate pairs,
    candidate shingles) that live for the session by default; a caller that
    materializes the result and moves on (e.g. the curation pipeline's
    repeated passes) should pass ``_caches=[]`` and unpersist the collected
    frames afterwards, or executor storage accumulates per call."""
    mem = token_dedup_members(docs).cache()
    if _caches is not None:
        _caches.append(mem)
    members = mem.select("doc_id", "rep_id")
    reps = mem.filter(F.col("doc_id") == F.col("rep_id")).select("doc_id", "lang", "text")
    # ONE tokenize+shingle+hash checkpoint shared by the band table, the
    # signature joins, and the verify leg (r19 — in r18 the verify leg
    # re-projected shingles from text, and the band self-join's sides would
    # re-run the 64-hash projection without an ordering point); the eager
    # checkpoint also materializes the mem cache sequentially before the
    # concurrent downstream branches read it
    sh = _rep_shingle_sigs(reps)
    # narrow signature copy, re-checkpointed: the band table and both
    # confirm joins read these blocks several times, and a localCheckpoint
    # does NOT column-prune — without the copy every downstream scan
    # deserializes the full shingle arrays it never uses (profiled: the
    # band-side stages tripled their executor CPU reading the wide blocks)
    sigs = sh.drop("_sh").localCheckpoint(eager=True)
    if _caches is not None:
        _caches.extend([sh, sigs])
    bands = minhash_band_table(sigs)
    capped = _cap_buckets(bands, cap)
    a = capped.alias("a")
    b = capped.alias("b")
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
        # (LSH prunes the quadratic space + the bucket cap bounds hot
        # buckets), so this is safe at any scale.
        .cache()
    )
    if _caches is not None:
        _caches.append(candidates)
    # verify candidates with exact Jaccard over per-doc shingle ARRAYS
    # (r18, see _candidate_shared_arrays): the semi join prunes to
    # candidate docs, overlap + sizes come from one array-intersect pair
    # join — no shingle-keyed shuffle, no hot-shingle guard needed, five
    # shuffles and a checkpoint fewer than the exploded self-join it
    # replaces (output bit-identical, pinned in
    # tests/test_hot_shingle_guard.py). r19: reads the shared shingle
    # frame instead of re-projecting shingles from text.
    shared = _candidate_shared_arrays(reps, candidates, _caches=_caches, sh=sh)
    jac = F.col("shared").cast("double") / (F.col("n1") + F.col("n2") - F.col("shared"))
    rep_pairs = shared.select(
        "doc_id_1", "doc_id_2", jac.alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)
    out = _expand_member_pairs(
        rep_pairs, members, intra_cols=[F.lit(1.0).alias("jaccard")], carry=["jaccard"]
    )
    return out.orderBy("doc_id_1", "doc_id_2") if _sorted else out


# --- MinHash estimator-quality audit (r13) ----------------------------------
#
# "Measure, don't guess": the LSH pipeline ESTIMATES Jaccard as the
# fraction of agreeing min-hash components before the exact verify. This
# audit quantifies that estimator on the exact candidate population the
# pipeline generates: per candidate pair, |matches/64 − shared/union| as
# an exact integer ppm — both legs are ratios of bigints, so
# (1e6·|64·shared − matches·union|) div (64·union) is deterministic in
# both engines — summarized to one row (pair count, max, sum, 6-dp
# mean). An operator whose sketch drifts from its exact verify (bad hash
# family, mis-sized bands) shows up here as a number, not a guess.
# Scale shape: identical to the pipeline itself — capped band buckets
# bound the candidate population, the signature legs join model-sized
# sig rows, and the exact leg's shingle explode touches candidate docs
# only (left-semi BEFORE the Generate, same reasoning as
# minhash_lsh_pairs).


def minhash_estimator_error(docs: DataFrame, _caches: list | None = None) -> DataFrame:
    """One row (n_pairs, max_err_ppm, sum_err_ppm, mean_abs_err): the
    minhash Jaccard estimator's absolute error over the LSH candidate
    population of ``docs``."""
    mem = token_dedup_members(docs)
    reps = mem.filter(F.col("doc_id") == F.col("rep_id")).select("doc_id", "lang", "text")
    # ONE tokenize+shingle+hash checkpoint shared by the band table, both
    # sides of the agreement join, and the exact leg (r19); narrow sig copy
    # re-checkpointed for the three sig consumers (see minhash_lsh_pairs)
    sh = _rep_shingle_sigs(reps)
    sigs = sh.drop("_sh").localCheckpoint(eager=True)
    if _caches is not None:
        _caches.extend([sh, sigs])
    bands = minhash_band_table(sigs)
    capped = _cap_buckets(bands, _LSH_BUCKET_CAP)
    a, b = capped.alias("a"), capped.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_id_1"), F.col("b.doc_id").alias("doc_id_2"))
        .distinct()
        # two consumers (signature-agreement leg + exact-Jaccard leg);
        # LSH-bounded tiny, same cache rationale as minhash_lsh_pairs
        .cache()
    )
    if _caches is not None:
        _caches.append(candidates)
    sa, sb = sigs.alias("sa"), sigs.alias("sb")
    matches = None
    for i in range(_MINHASH_K):
        t = (F.col(f"sa.sig_{i}") == F.col(f"sb.sig_{i}")).cast("bigint")
        matches = t if matches is None else matches + t
    est = (
        candidates.join(sa, F.col("doc_id_1") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_id_2") == F.col("sb.doc_id"))
        .select("doc_id_1", "doc_id_2", matches.alias("matches"))
    )
    # exact shared counts + sizes via the array-intersect pair join (r18,
    # see _candidate_shared_arrays) — same rework as the pipeline's verify
    # leg; every candidate pair gets exactly one row, shared may be 0.
    # r19: reads the shared shingle frame.
    shared = _candidate_shared_arrays(reps, candidates, _caches=_caches, sh=sh)
    paired = est.join(shared, ["doc_id_1", "doc_id_2"]).select(
        "matches",
        F.coalesce(F.col("shared"), F.lit(0)).alias("shared"),
        (F.col("n1") + F.col("n2") - F.coalesce(F.col("shared"), F.lit(0))).alias("u"),
    )
    errs = paired.select(
        F.expr(
            f"(1000000 * abs({_MINHASH_K}*shared - matches*u)) div ({_MINHASH_K}*u)"
        ).alias("err_ppm")
    )
    return errs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.max("err_ppm").cast("bigint").alias("max_err_ppm"),
        F.sum("err_ppm").cast("bigint").alias("sum_err_ppm"),
        F.round(
            F.sum("err_ppm").cast("double")
            / (F.lit(1000000.0) * F.count(F.lit(1)).cast("double")),
            6,
        ).alias("mean_abs_err"),
    )


_SQL_SIG_MATCHES = " + ".join(
    f"CAST(x.sig_{i} = y.sig_{i} AS BIGINT)" for i in range(_MINHASH_K)
)

_MINHASH_ERROR_SQL = f"""
WITH
{_SQL_COLLAPSE},
hashed AS (
  SELECT doc_id, {_sql_md5_long("shingle", 15)} % {_P} AS h FROM shingles
),
sigs AS (
  SELECT doc_id,
         {_SQL_MINHASH_SIGS}
  FROM hashed GROUP BY doc_id
),
bands AS (
{_SQL_MINHASH_BANDS}
),
{_SQL_CAP_CANDIDATES},
est AS (
  SELECT c.doc_id_1, c.doc_id_2, ({_SQL_SIG_MATCHES}) AS matches
  FROM candidates c
  JOIN sigs x ON x.doc_id = c.doc_id_1
  JOIN sigs y ON y.doc_id = c.doc_id_2
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
shared AS (
  SELECT c.doc_id_1, c.doc_id_2, COUNT(*) AS shared
  FROM candidates c
  JOIN shingles sa ON sa.doc_id = c.doc_id_1
  JOIN shingles sb ON sb.doc_id = c.doc_id_2 AND sb.shingle = sa.shingle
  GROUP BY c.doc_id_1, c.doc_id_2
),
errs AS (
  SELECT (1000000 * abs({_MINHASH_K}*COALESCE(p.shared, 0)
                        - e.matches*(s1.n + s2.n - COALESCE(p.shared, 0))))
         // ({_MINHASH_K}*(s1.n + s2.n - COALESCE(p.shared, 0))) AS err_ppm
  FROM est e
  LEFT JOIN shared p ON p.doc_id_1 = e.doc_id_1 AND p.doc_id_2 = e.doc_id_2
  JOIN sizes s1 ON e.doc_id_1 = s1.doc_id
  JOIN sizes s2 ON e.doc_id_2 = s2.doc_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(MAX(err_ppm) AS BIGINT) AS max_err_ppm,
       CAST(SUM(err_ppm) AS BIGINT) AS sum_err_ppm,
       ROUND(CAST(SUM(err_ppm) AS DOUBLE) / (1000000.0 * COUNT(*)), 6) AS mean_abs_err
FROM errs
"""


@query("dedup_minhash_error", oracle=_MINHASH_ERROR_SQL)
def dedup_minhash_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator-quality audit over the LSH candidate population —
    exact ppm error between signature-agreement Jaccard and exact shingle
    Jaccard, one summary row."""
    caches: list = []
    return _materialized(
        minhash_estimator_error(_docs(spark, sf_dir), _caches=caches), caches
    )


# --- SimHash ---------------------------------------------------------------

_SIMHASH_BITS = 48  # fits comfortably in a signed 64-bit int (no ANSI overflow)
# 8 bands × 6 bits: a pair differing in ≤7 bits cannot touch all 8 bands
# (pigeonhole), so candidate generation has GUARANTEED recall for every pair
# the Hamming ≤ 7 confirm step can accept — the confirm threshold is set to
# exactly that pigeonhole bound, so blocking and confirm are tight against
# each other. (12-bit bands only guaranteed Hamming ≤ 3 — a silent recall
# gap vs the confirm threshold, ADVICE r01.)
_SIMHASH_BAND_BITS = 6
_SIMHASH_HAMMING_MAX = 7


def simhash_signatures(
    docs: DataFrame, spread: bool = True, prefiltered: bool = False
) -> DataFrame:
    """(doc_id, simhash): majority vote per bit over 3-gram shingle hashes,
    computed SHUFFLE-FREE per doc — one ``aggregate`` over the per-doc
    shingle-hash array keeps a 48-long vote accumulator (zip_with add of the
    per-hash ±1 bit votes), then a second pass folds the vote signs into the
    48-bit signature. Replaces the explode + 48-sum-agg formulation: no
    Generate, no doc_id shuffle, no 48-buffer codegen class (measured 0.5s
    vs 2.8s warm at sf0.1, identical output). The 48-bit base hash is
    md5-derived (12 hex chars) so the DuckDB oracle replays the signature.

    Features are shingles, not tokens: with a small shared vocabulary,
    token-level bit votes correlate across unrelated documents and hamming
    distances collapse; shingles are high-cardinality and doc-specific."""
    base_arr = F.transform(shingles_from(F.col("_t")), lambda s: _md5_long(s, 12))
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
    out = _spread(docs, spread).select(
        # staged token column — see shingles_from
        "doc_id",
        tokens_col(F.col("text")).alias("_t"),
    )
    if not prefiltered:
        # the pushed-down Filter re-tokenizes (alias substitution), so
        # callers whose input is already >=3-token-filtered
        # (token_dedup_members output) pass prefiltered=True and skip a
        # full tokenize pass (r19)
        out = out.filter(F.size("_t") >= 3)
    return out.select("doc_id", base_arr.alias("_base")).select(
        "doc_id", sim.alias("simhash")
    )


_SQL_SIMHASH_BANDS = "\n  UNION ALL\n".join(
    f"  SELECT doc_id, {band} AS band,"
    f" ((simhash >> {band * _SIMHASH_BAND_BITS}) & {(1 << _SIMHASH_BAND_BITS) - 1})::VARCHAR"
    f" AS bucket FROM sigs"
    for band in range(_SIMHASH_BITS // _SIMHASH_BAND_BITS)
)

_SIMHASH_SQL = f"""
WITH
{_SQL_COLLAPSE},
hashed AS (
  SELECT doc_id, {_sql_md5_long("shingle", 12)} AS h FROM shingles
),
votes AS (
  SELECT doc_id, i, SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM hashed, UNNEST(range({_SIMHASH_BITS})) AS bit(i)
  GROUP BY doc_id, i
),
sigs AS (
  SELECT doc_id, SUM(CASE WHEN v > 0 THEN (1::BIGINT << i) ELSE 0 END) AS simhash
  FROM votes GROUP BY doc_id
),
bands AS (
{_SQL_SIMHASH_BANDS}
),
{_SQL_CAP_CANDIDATES},
rep_pairs AS (
  SELECT c.doc_id_1, c.doc_id_2,
         CAST(bit_count(xor(s1.simhash, s2.simhash)) AS BIGINT) AS hamming
  FROM candidates c
  JOIN sigs s1 ON s1.doc_id = c.doc_id_1
  JOIN sigs s2 ON s2.doc_id = c.doc_id_2
  WHERE bit_count(xor(s1.simhash, s2.simhash)) <= {_SIMHASH_HAMMING_MAX}
)
SELECT least(m1.doc_id, m2.doc_id) AS doc_id_1,
       greatest(m1.doc_id, m2.doc_id) AS doc_id_2,
       p.hamming
FROM rep_pairs p
JOIN members m1 ON m1.rep_id = p.doc_id_1
JOIN members m2 ON m2.rep_id = p.doc_id_2
UNION ALL
SELECT a.doc_id, b.doc_id, 0::BIGINT
FROM members a JOIN members b ON a.rep_id = b.rep_id AND a.doc_id < b.doc_id
ORDER BY doc_id_1, doc_id_2
"""


@query("dedup_simhash", oracle=_SIMHASH_SQL, headline=True, defer=True)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: exact-dup collapse (token-sequence key), 48-bit
    md5-derived signatures over representatives, candidates from 6-bit band
    blocking (8 bands: any pair within Hamming ≤ 7 must agree on ≥1 band, so
    blocking recall covers the whole confirm range) with the deterministic
    bucket cap, confirmed by bit_count(XOR) ≤ 7, then expanded back to all
    member pairs (intra-group Hamming is exactly 0). Oracle-checked end to
    end — DuckDB replays signatures, banding, cap, and confirm. The
    registry call materializes eagerly and releases the internal caches
    before returning (see :func:`_materialized`)."""
    caches: list = []
    return _materialized(
        simhash_pairs(_docs(spark, sf_dir), _caches=caches, _sorted=False),
        caches,
        order=["doc_id_1", "doc_id_2"],
    )


def simhash_pairs(
    docs: DataFrame,
    cap: int = _LSH_BUCKET_CAP,
    _caches: list | None = None,
    _sorted: bool = True,
) -> DataFrame:
    """The full SimHash near-dup pipeline over an arbitrary documents frame
    (columns: doc_id, lang, text). See :func:`dedup_simhash`. ``_caches``
    collects the internal cached frames for callers that run the pipeline
    repeatedly — same contract as :func:`minhash_lsh_pairs`."""
    mem = token_dedup_members(docs).cache()
    members = mem.select("doc_id", "rep_id")
    reps = mem.filter(F.col("doc_id") == F.col("rep_id")).select("doc_id", "lang", "text")
    # three consumers (band table + both confirm sides) sit in separate
    # subtrees with no shared exchange below them, so a lazy .cache()
    # lets their stages race and each re-runs the 48-bit vote projection
    # (the pipeline's CPU peak); the EAGER checkpoint bounds it to one
    # pass and sequentially materializes the mem cache it reads (r18 —
    # the phash discipline)
    sigs = simhash_signatures(reps, spread=False, prefiltered=True).localCheckpoint(
        eager=True
    )
    if _caches is not None:
        _caches.extend([mem, sigs])
    band_structs = [
        F.struct(
            F.lit(band).alias("band"),
            F.expr(
                f"shiftright(simhash, {band * _SIMHASH_BAND_BITS})"
                f" & {(1 << _SIMHASH_BAND_BITS) - 1}"
            )
            .cast("string")
            .alias("bucket"),
        )
        for band in range(_SIMHASH_BITS // _SIMHASH_BAND_BITS)
    ]
    # the signature rides THROUGH the band explode and the cap window
    # (+8 bytes per band row), so the Hamming confirm folds INTO the band
    # self-join (r19): 6-bit buckets are coarse — at sf0.1 the raw band
    # join emits ~1M candidate rows, and the old shape shuffled ALL of
    # them through a DISTINCT and then joined signatures back twice.
    # Confirm-in-join flips the order: the per-pair bit_count filter runs
    # where the pair is born, and the distinct dedupes SURVIVORS only
    # (band-duplicate survivors ≤ 8× a small set). Same output set by
    # construction — distinct commutes with a deterministic per-pair
    # filter; hamming is functional on the pair.
    bands = sigs.select(
        "doc_id", "simhash", F.explode(F.array(*band_structs)).alias("bb")
    ).select(
        "doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    capped = _cap_buckets(bands, cap)
    a = capped.alias("a")
    b = capped.alias("b")
    ham = F.bit_count(F.expr("a.simhash ^ b.simhash"))
    rep_pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (ham <= _SIMHASH_HAMMING_MAX),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_1"),
            F.col("b.doc_id").alias("doc_id_2"),
            ham.cast("bigint").alias("hamming"),
        )
        .distinct()
    )
    out = _expand_member_pairs(
        rep_pairs,
        members,
        intra_cols=[F.lit(0).cast("bigint").alias("hamming")],
        carry=["hamming"],
    )
    return out.orderBy("doc_id_1", "doc_id_2") if _sorted else out


# --- Near-dup connected components ----------------------------------------
#
# The pair pipelines emit edges; an actual dedup DECISION needs the
# transitive closure — docs a~b and b~c form ONE cluster even when a~c was
# never scored. Components are computed by iterative min-label propagation
# (each node repeatedly adopts the smallest label among itself and its
# neighbors), which converges in O(graph diameter) rounds; near-dup graphs
# are unions of near-cliques (member expansion emits every intra-group
# pair), so the diameter — and the round count — is small. Each round is
# one edge-join + partial-agg min per node (no hot key beyond a node's
# degree, which the LSH bucket cap already bounds), and the frame is
# localCheckpointed per round so the iterative plan never deepens. At
# extreme diameters the alternating small-star/large-star formulation
# (Kiveris et al., "Connected Components in MapReduce") drops rounds to
# O(log n); not needed at near-dup shapes.

_COMPONENTS_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT doc_id_1, doc_id_2 FROM ({_sql_minhash_pairs_over("documents")})
),
edges AS (
  SELECT doc_id_1 AS a, doc_id_2 AS b FROM pairs
  UNION
  SELECT doc_id_2, doc_id_1 FROM pairs
),
reach(node, lab) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, r.lab FROM edges e JOIN reach r ON e.b = r.node
)
SELECT node AS doc_id,
       CAST(MIN(lab) AS BIGINT) AS component_id,
       CAST(MIN(lab) = node AS BOOLEAN) AS is_survivor
FROM reach
GROUP BY node
ORDER BY doc_id
"""


def connected_components(pairs: DataFrame, max_rounds: int = 50) -> DataFrame:
    """(doc_id, component_id, is_survivor) from an undirected edge list
    (columns doc_id_1, doc_id_2): component_id = smallest doc_id reachable,
    is_survivor marks the canonical keeper (min-id policy, matching every
    pipeline's deterministic survivor rule). Driver-looped min-label
    propagation with a convergence count per round — the loop moves one
    scalar per round to the driver, never data."""
    edges = (
        pairs.select(F.col("doc_id_1").alias("a"), F.col("doc_id_2").alias("b"))
        .unionAll(pairs.select(F.col("doc_id_2").alias("a"), F.col("doc_id_1").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lab"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        nbr_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("lab").alias("nbr_lab"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.a, "left")
            .select(
                "node",
                F.least(F.col("lab"), F.coalesce("nbr_lab", F.col("lab"))).alias("lab"),
                (F.coalesce("nbr_lab", F.col("lab")) < F.col("lab")).alias("_chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("_chg")).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    else:
        raise RuntimeError(f"label propagation did not converge in {max_rounds} rounds")
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("lab").cast("bigint").alias("component_id"),
        (F.col("lab") == F.col("node")).alias("is_survivor"),
    ).orderBy("doc_id")


@query("dedup_components", oracle=_COMPONENTS_SQL, defer=True)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clusters over the MinHash/LSH pair set: every doc
    that appears in a near-dup pair, its component id (smallest reachable
    doc_id), and whether it is the component's canonical survivor — the
    decision surface a dedup pass actually consumes. Oracle: DuckDB
    recomputes the same pairs and closes them with a recursive CTE."""
    caches: list = []
    pairs = minhash_lsh_pairs(_docs(spark, sf_dir), _caches=caches)
    out = connected_components(pairs)
    for c in caches:
        c.unpersist()
    return out


# --- near-dup component cohesion audit (r13) --------------------------------
#
# Connected components over near-dup pairs OVER-MERGE by design: a chain
# A~B~C collapses even when A and C share nothing (transitive-closure
# overreach — the known failure mode of component dedup). This audit
# measures it per component with the standard graph statistics: edge
# density, triangle count, and the global clustering coefficient
# 3·triangles / wedges — a clique-like component (every member really
# duplicates every other) scores 1.0, a chain scores 0.0, and a low
# score on a big component is the signal to re-verify before dropping
# members. Triangles come from the ordered adjacency 3-join
# (a<b, b<c, a~c) — standard distributed triangle counting (Suri &
# Vassilvitskii 2011); wedges are Σ deg·(deg−1)/2 exact bigints, so the
# coefficient is one rounded division of identical integers. Scale:
# inputs are the LSH-bounded pair set whose degrees the bucket cap
# bounds; every aggregate is component-keyed.


def component_cohesion(pairs: DataFrame, _caches: list | None = None) -> DataFrame:
    """(component_id, n_nodes, n_edges, n_triangles, clustering) per
    near-dup component of the undirected edge list ``pairs``
    (doc_id_1 < doc_id_2)."""
    edges = pairs.select("doc_id_1", "doc_id_2").distinct().cache()
    if _caches is not None:
        _caches.append(edges)
    comp = connected_components(edges).select("doc_id", "component_id")
    nodes = comp.groupBy("component_id").agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    e_lab = edges.join(
        comp.withColumnRenamed("doc_id", "doc_id_1"), "doc_id_1"
    )
    n_edges = e_lab.groupBy("component_id").agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    deg = (
        edges.select(F.col("doc_id_1").alias("doc_id"))
        .unionAll(edges.select(F.col("doc_id_2").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
        .join(comp, "doc_id")
    )
    wedges = deg.groupBy("component_id").agg(
        # integer-exact wedge count: float '/ 2' loses exactness past 2^53
        # (VERDICT r15 nit #2 — same hazard class as the clustering_ari
        # fix); deg is LSH-bucket-cap bounded so bigint deg·(deg−1) holds
        F.sum(F.expr("(deg * (deg - 1)) div 2")).cast("bigint").alias("wedges")
    )
    e1 = edges.select(F.col("doc_id_1").alias("a"), F.col("doc_id_2").alias("b"))
    e2 = edges.select(F.col("doc_id_1").alias("b"), F.col("doc_id_2").alias("c"))
    e3 = edges.select(F.col("doc_id_1").alias("a"), F.col("doc_id_2").alias("c"))
    tris = (
        e1.join(e2, "b")
        .join(e3, ["a", "c"], "left_semi")
        .join(comp.withColumnRenamed("doc_id", "a"), "a")
        .groupBy("component_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    return (
        nodes.join(n_edges, "component_id")
        .join(wedges, "component_id")
        .join(tris, "component_id", "left")
        .select(
            "component_id",
            "n_nodes",
            "n_edges",
            F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias("n_triangles"),
            # networkx transitivity convention: 0.0 when no wedges exist
            # (2-node components — consult clustering only for n_nodes ≥ 3);
            # also keeps the output NULL-free (no None-vs-NaN representation
            # hazard across engine fetch paths)
            F.coalesce(
                F.round(
                    (3 * F.coalesce("n_triangles", F.lit(0))).cast("double")
                    / F.nullif(F.col("wedges").cast("double"), F.lit(0.0)),
                    6,
                ),
                F.lit(0.0),
            ).alias("clustering"),
        )
        .orderBy("component_id")
    )


_COHESION_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT DISTINCT doc_id_1, doc_id_2 FROM ({_sql_minhash_pairs_over("documents")})
),
edges AS (
  SELECT doc_id_1 AS a, doc_id_2 AS b FROM pairs
  UNION
  SELECT doc_id_2, doc_id_1 FROM pairs
),
reach(node, lab) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, r.lab FROM edges e JOIN reach r ON e.b = r.node
),
comp AS (SELECT node AS doc_id, CAST(MIN(lab) AS BIGINT) AS component_id FROM reach GROUP BY node),
nodes AS (SELECT component_id, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM comp GROUP BY component_id),
nedges AS (
  SELECT c.component_id, CAST(COUNT(*) AS BIGINT) AS n_edges
  FROM pairs p JOIN comp c ON c.doc_id = p.doc_id_1
  GROUP BY c.component_id
),
deg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS deg
  FROM (SELECT doc_id_1 AS doc_id FROM pairs UNION ALL SELECT doc_id_2 FROM pairs)
  GROUP BY doc_id
),
wedges AS (
  SELECT c.component_id, CAST(SUM(d.deg * (d.deg - 1) // 2) AS BIGINT) AS wedges
  FROM deg d JOIN comp c ON c.doc_id = d.doc_id
  GROUP BY c.component_id
),
tris AS (
  SELECT c.component_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM pairs e1
  JOIN pairs e2 ON e2.doc_id_1 = e1.doc_id_2
  JOIN comp c ON c.doc_id = e1.doc_id_1
  WHERE EXISTS (SELECT 1 FROM pairs e3
                WHERE e3.doc_id_1 = e1.doc_id_1 AND e3.doc_id_2 = e2.doc_id_2)
  GROUP BY c.component_id
)
SELECT n.component_id, n.n_nodes, e.n_edges,
       CAST(COALESCE(t.n_triangles, 0) AS BIGINT) AS n_triangles,
       COALESCE(ROUND(CAST(3 * COALESCE(t.n_triangles, 0) AS DOUBLE)
                      / NULLIF(CAST(w.wedges AS DOUBLE), 0.0), 6), 0.0) AS clustering
FROM nodes n
JOIN nedges e ON e.component_id = n.component_id
JOIN wedges w ON w.component_id = n.component_id
LEFT JOIN tris t ON t.component_id = n.component_id
ORDER BY n.component_id
"""


@query("dedup_component_cohesion", oracle=_COHESION_SQL)
def dedup_component_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohesion audit of the near-dup components: per component, edge
    density, triangle count and clustering coefficient — the
    transitive-closure-overreach detector (chain vs clique)."""
    caches: list = []
    pairs = minhash_lsh_pairs(_docs(spark, sf_dir), _caches=caches, _sorted=False)
    return _materialized(
        component_cohesion(pairs, _caches=caches), caches, order=["component_id"]
    )


# --- Cross-source contamination matrix -------------------------------------
#
# A corpus assembled from many crawls/dumps needs to know WHERE its
# near-duplicates come from: intra-source duplication (a crawler revisiting
# pages) is curated differently from cross-source overlap (two dumps of the
# same site — or an eval set leaking into a training source). This rolls the
# near-dup pair set up to an (source_a, source_b) matrix. Scale shape: the
# pair set is already LSH-bounded and bucket-capped; labeling it is two hash
# joins against the NARROW (doc_id, source) projection, and the result is at
# most n_sources² rows — a KB-sized report at any corpus size.

_CROSS_SOURCE_SQL = f"""
WITH pairs AS (
  SELECT doc_id_1, doc_id_2 FROM ({_sql_minhash_pairs_over("documents")})
),
lab AS (SELECT doc_id, source FROM documents),
sided AS (
  SELECT least(a.source, b.source) AS source_a,
         greatest(a.source, b.source) AS source_b
  FROM pairs p
  JOIN lab a ON p.doc_id_1 = a.doc_id
  JOIN lab b ON p.doc_id_2 = b.doc_id
)
SELECT source_a, source_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       (source_a = source_b) AS intra_source
FROM sided
GROUP BY source_a, source_b
ORDER BY source_a, source_b
"""


def cross_source_matrix(pairs: DataFrame, docs: DataFrame) -> DataFrame:
    """(source_a, source_b, n_pairs, intra_source) near-dup counts by
    unordered source pair, from a (doc_id_1, doc_id_2) pair frame and the
    (doc_id, source) labels in ``docs`` — the contamination report that
    tells intra-source crawler dups apart from cross-dump overlap."""
    lab = docs.select("doc_id", "source")
    labeled = (
        pairs.select("doc_id_1", "doc_id_2")
        .join(lab.withColumnsRenamed({"doc_id": "doc_id_1", "source": "s1"}), "doc_id_1")
        .join(lab.withColumnsRenamed({"doc_id": "doc_id_2", "source": "s2"}), "doc_id_2")
        .select(
            F.least("s1", "s2").alias("source_a"),
            F.greatest("s1", "s2").alias("source_b"),
        )
    )
    return (
        labeled.groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .withColumn("intra_source", F.col("source_a") == F.col("source_b"))
        .orderBy("source_a", "source_b")
    )


@query("dedup_cross_source_matrix", oracle=_CROSS_SOURCE_SQL, defer=True)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup contamination matrix over the documents corpus: MinHash/LSH
    pairs rolled up by (source_a, source_b)."""
    caches: list = []
    docs = _docs(spark, sf_dir)
    pairs = minhash_lsh_pairs(docs, _caches=caches, _sorted=False)
    out = cross_source_matrix(pairs, docs)
    return _materialized(out, caches, order=["source_a", "source_b"])


# --- Leakage-free train/val/test split -------------------------------------
#
# Splitting a corpus doc-by-doc leaks: two near-duplicate documents can land
# in train and test, and the model is then evaluated on (a paraphrase of)
# its own training data. The leakage-free rule assigns the SPLIT TO THE
# NEAR-DUP COMPONENT, not the document — every member of a component shares
# its fate. Group id = the component's min doc_id (singletons group as
# themselves); the split decision is the same md5-derived uniform used by
# mix_resample/sample_hash_split, applied to the GROUP id — a pure row
# function once components are known, so the only scale cost beyond the
# (already-bounded) pair pipeline is the component propagation itself.

_SPLIT_TRAIN_FRAC = 0.8  # u < 0.8          -> train
_SPLIT_VAL_FRAC = 0.9    # 0.8 <= u < 0.9   -> val; else test

_LEAKAGE_SPLIT_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT doc_id_1, doc_id_2 FROM ({_sql_minhash_pairs_over("documents")})
),
edges AS (
  SELECT doc_id_1 AS a, doc_id_2 AS b FROM pairs
  UNION
  SELECT doc_id_2, doc_id_1 FROM pairs
),
reach(node, lab) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, r.lab FROM edges e JOIN reach r ON e.b = r.node
),
comp AS (SELECT node, MIN(lab) AS cid FROM reach GROUP BY node),
grouped AS (
  SELECT d.doc_id, CAST(COALESCE(c.cid, d.doc_id) AS BIGINT) AS group_id
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
),
uni AS (
  SELECT doc_id, group_id,
         ('0x' || substr(md5(CAST(group_id AS VARCHAR)), 1, 13))::BIGINT
           / CAST({1 << 52} AS DOUBLE) AS u
  FROM grouped
)
SELECT doc_id, group_id,
       CASE WHEN u < {_SPLIT_TRAIN_FRAC} THEN 'train'
            WHEN u < {_SPLIT_VAL_FRAC} THEN 'val'
            ELSE 'test' END AS split
FROM uni
ORDER BY doc_id
"""


def leakage_free_split(
    docs: DataFrame,
    pairs: DataFrame,
    train_frac: float = _SPLIT_TRAIN_FRAC,
    val_frac: float = _SPLIT_VAL_FRAC,
) -> DataFrame:
    """(doc_id, group_id, split): train/val/test assignment where every
    member of a near-dup component (edge list ``pairs``) shares a split.
    group_id is the component's min doc_id (or the doc's own id for
    singletons); membership is the engine-portable md5 uniform of the
    GROUP id against the two fraction cut points."""
    comp = connected_components(pairs).select("doc_id", "component_id")
    grouped = (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component_id", "doc_id").cast("bigint").alias("group_id"),
        )
    )
    u = F.conv(
        F.substring(F.md5(F.col("group_id").cast("string")), 1, 13), 16, 10
    ).cast("bigint") / F.lit(float(1 << 52))
    return grouped.select(
        "doc_id",
        "group_id",
        F.when(u < train_frac, "train")
        .when(u < val_frac, "val")
        .otherwise("test")
        .alias("split"),
    ).orderBy("doc_id")


@query("split_leakage_free", oracle=_LEAKAGE_SPLIT_SQL, defer=True)
def split_leakage_free(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free corpus split: near-dup components (MinHash/LSH pairs,
    transitively closed) move into train/val/test as units, so no test doc
    has a near-duplicate in train."""
    caches: list = []
    docs = _docs(spark, sf_dir)
    pairs = minhash_lsh_pairs(docs, _caches=caches, _sorted=False)
    out = leakage_free_split(docs, pairs)
    return _materialized(out, caches, order=["doc_id"])


# --- dedup savings report (r13) -----------------------------------------------
#
# The number a curation run actually reports upward: how much corpus
# does near-dedup remove? One row — documents touched by a near-dup
# component, documents dropped (non-survivors under the min-id rule),
# and the character mass removed, as exact counts plus a 6-dp fraction.
# Composes the existing pair pipeline + connected components; the
# report itself is two KB joins against the narrow (doc_id, len) projection.


def dedup_savings_report(docs: DataFrame, _caches: list | None = None) -> DataFrame:
    """One row (n_docs, n_in_components, n_dropped, chars_total,
    chars_dropped, pct_chars_dropped) for the MinHash/LSH near-dedup
    pass over ``docs``."""
    own = _caches if _caches is not None else []
    pairs = minhash_lsh_pairs(docs, _caches=own, _sorted=False)
    comp = connected_components(pairs).select("doc_id", "is_survivor")
    lens = docs.select("doc_id", F.length("text").cast("bigint").alias("chars"))
    labeled = lens.join(comp, "doc_id", "left")
    return labeled.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col("is_survivor").isNotNull().cast("bigint")).cast("bigint").alias("n_in_components"),
        F.sum((~F.coalesce("is_survivor", F.lit(True))).cast("bigint")).cast("bigint").alias("n_dropped"),
        F.sum("chars").cast("bigint").alias("chars_total"),
        F.sum(F.when(~F.coalesce("is_survivor", F.lit(True)), F.col("chars")).otherwise(0))
        .cast("bigint")
        .alias("chars_dropped"),
    ).select(
        "n_docs",
        "n_in_components",
        "n_dropped",
        "chars_total",
        "chars_dropped",
        F.round(
            F.col("chars_dropped").cast("double") / F.col("chars_total").cast("double"), 6
        ).alias("pct_chars_dropped"),
    )


_SAVINGS_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT doc_id_1, doc_id_2 FROM ({_sql_minhash_pairs_over("documents")})
),
edges AS (
  SELECT doc_id_1 AS a, doc_id_2 AS b FROM pairs
  UNION
  SELECT doc_id_2, doc_id_1 FROM pairs
),
reach(node, lab) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, r.lab FROM edges e JOIN reach r ON e.b = r.node
),
comp AS (
  SELECT node AS doc_id, MIN(lab) = node AS is_survivor FROM reach GROUP BY node
),
labeled AS (
  SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS chars, c.is_survivor
  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN is_survivor IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_in_components,
       CAST(SUM(CASE WHEN NOT COALESCE(is_survivor, TRUE) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped,
       CAST(SUM(chars) AS BIGINT) AS chars_total,
       CAST(SUM(CASE WHEN NOT COALESCE(is_survivor, TRUE) THEN chars ELSE 0 END) AS BIGINT)
         AS chars_dropped,
       ROUND(CAST(SUM(CASE WHEN NOT COALESCE(is_survivor, TRUE) THEN chars ELSE 0 END) AS DOUBLE)
             / CAST(SUM(chars) AS DOUBLE), 6) AS pct_chars_dropped
FROM labeled
"""


@query("dedup_savings_report", oracle=_SAVINGS_SQL, defer=True)
def dedup_savings_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation headline number: documents and character mass removed
    by near-dedup (min-id survivor rule), one summary row."""
    caches: list = []
    return _materialized(dedup_savings_report(_docs(spark, sf_dir), _caches=caches), caches)


# --- split-leakage audit (r13) ----------------------------------------------
#
# The MEASUREMENT companion to leakage_free_split: how many near-dup
# pairs would a naive per-document hash split tear across the
# train/test boundary (eval contamination), and — by construction — the
# component split tears zero. A pipeline that reports this number
# proves its split hygiene instead of asserting it. Scale shape: the
# pair set is LSH-bounded; both split assignments are row-local md5
# uniforms (doc-keyed vs group-keyed) joined back over the narrow pair
# list.


def split_leakage_audit(docs: DataFrame, _caches: list | None = None) -> DataFrame:
    """One row (n_pairs, naive_cross_pairs, component_cross_pairs): how
    many near-dup pairs straddle splits under a per-doc hash split vs the
    component-aware split (always 0, pytest- and oracle-pinned)."""
    own_caches = _caches if _caches is not None else []
    pairs = (
        minhash_lsh_pairs(docs, _caches=own_caches, _sorted=False)
        .select("doc_id_1", "doc_id_2")
        .cache()
    )
    own_caches.append(pairs)
    comp_split = leakage_free_split(docs, pairs).select("doc_id", F.col("split").alias("gsplit"))
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10
    ).cast("bigint") / F.lit(float(1 << 52))
    naive_split = docs.select(
        "doc_id",
        F.when(u < _SPLIT_TRAIN_FRAC, "train")
        .when(u < _SPLIT_VAL_FRAC, "val")
        .otherwise("test")
        .alias("nsplit"),
    )
    labeled = (
        pairs.join(naive_split.select(F.col("doc_id").alias("doc_id_1"), F.col("nsplit").alias("n1")), "doc_id_1")
        .join(naive_split.select(F.col("doc_id").alias("doc_id_2"), F.col("nsplit").alias("n2")), "doc_id_2")
        .join(comp_split.select(F.col("doc_id").alias("doc_id_1"), F.col("gsplit").alias("g1")), "doc_id_1")
        .join(comp_split.select(F.col("doc_id").alias("doc_id_2"), F.col("gsplit").alias("g2")), "doc_id_2")
    )
    return labeled.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum((F.col("n1") != F.col("n2")).cast("bigint")).cast("bigint").alias("naive_cross_pairs"),
        F.sum((F.col("g1") != F.col("g2")).cast("bigint")).cast("bigint").alias("component_cross_pairs"),
    )


_LEAKAGE_AUDIT_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT doc_id_1, doc_id_2 FROM ({_sql_minhash_pairs_over("documents")})
),
edges AS (
  SELECT doc_id_1 AS a, doc_id_2 AS b FROM pairs
  UNION
  SELECT doc_id_2, doc_id_1 FROM pairs
),
reach(node, lab) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, r.lab FROM edges e JOIN reach r ON e.b = r.node
),
comp AS (SELECT node, MIN(lab) AS cid FROM reach GROUP BY node),
grouped AS (
  SELECT d.doc_id, CAST(COALESCE(c.cid, d.doc_id) AS BIGINT) AS group_id
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
),
gsplit AS (
  SELECT doc_id,
         CASE WHEN ('0x' || substr(md5(CAST(group_id AS VARCHAR)), 1, 13))::BIGINT
                   / CAST({1 << 52} AS DOUBLE) < {_SPLIT_TRAIN_FRAC} THEN 'train'
              WHEN ('0x' || substr(md5(CAST(group_id AS VARCHAR)), 1, 13))::BIGINT
                   / CAST({1 << 52} AS DOUBLE) < {_SPLIT_VAL_FRAC} THEN 'val'
              ELSE 'test' END AS split
  FROM grouped
),
nsplit AS (
  SELECT doc_id,
         CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
                   / CAST({1 << 52} AS DOUBLE) < {_SPLIT_TRAIN_FRAC} THEN 'train'
              WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
                   / CAST({1 << 52} AS DOUBLE) < {_SPLIT_VAL_FRAC} THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN na.split <> nb.split THEN 1 ELSE 0 END) AS BIGINT)
         AS naive_cross_pairs,
       CAST(SUM(CASE WHEN ga.split <> gb.split THEN 1 ELSE 0 END) AS BIGINT)
         AS component_cross_pairs
FROM pairs p
JOIN nsplit na ON na.doc_id = p.doc_id_1
JOIN nsplit nb ON nb.doc_id = p.doc_id_2
JOIN gsplit ga ON ga.doc_id = p.doc_id_1
JOIN gsplit gb ON gb.doc_id = p.doc_id_2
"""


@query("split_leakage_audit", oracle=_LEAKAGE_AUDIT_SQL, defer=True)
def split_leakage_audit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-hygiene measurement: near-dup pairs torn across splits by a
    naive per-doc hash split vs the component-aware split (always 0)."""
    caches: list = []
    return _materialized(split_leakage_audit(_docs(spark, sf_dir), _caches=caches), caches)


# --- Incremental MinHash index: dedup a NEW batch against a stored corpus --
#
# The batch pipelines above recompute signatures over the whole corpus every
# run; a production ingest needs to near-dedup each ARRIVING batch against
# everything already accepted WITHOUT re-scanning 100 TB of text. The index
# persists only the signature surface — (doc_id, sig_0..63) plus the
# (doc_id, band, bucket) band table partitioned by band — never the text:
# ~300 bytes/doc regardless of document size. A query banding-joins the new
# batch's reps against the stored band table (the same 16×4 LSH blocking as
# the batch pipeline, so candidate recall is identical by construction) and
# confirms with the SIGNATURE-ESTIMATED Jaccard (fraction of the 64
# components that agree; std ≈ √(J(1−J)/64) ≈ 0.05 worst-case) — the
# standard signature-only confirm for text-free indexes. Callers that need
# the exact Jaccard re-join the texts for the (tiny) confirmed pair set.


def build_minhash_index(docs: DataFrame, path: str) -> None:
    """Write the signature index for a corpus batch: exact-dup collapse →
    rep signatures → ``<path>/signatures`` (doc_id, sig_*),
    ``<path>/bands`` (partitionBy(band): 16 directories, each a narrow
    bucket list), ``<path>/members`` (doc_id → rep_id, so exact duplicates
    of indexed docs stay attributable). All writes are append-mode:
    :func:`append_minhash_index` is the same call on a later batch."""
    # cache across the three component writes (released in the finally;
    # MEMORY_AND_DISK default, so a large batch spills instead of failing):
    # members feeds two writes, and sigs holds the CPU-heavy 64-min-hash
    # projections the bands write would otherwise recompute — uncached,
    # each write re-runs the collapse+signature plan from the source scan
    # (which for the streaming sink would also re-list live index paths
    # mid-append, ADVICE r6)
    mem = token_dedup_members(docs).cache()
    try:
        reps = mem.filter(F.col("doc_id") == F.col("rep_id")).select(
            "doc_id", "lang", "text"
        )
        sigs = minhash_signatures(reps, spread=False).cache()
        try:
            sigs.write.mode("append").parquet(f"{path}/signatures")
            # stored buckets carry the same deterministic cap as the batch
            # pipeline, applied per append (capping across appends would
            # need to read the stored bucket back); compact_minhash_index
            # re-applies the cap across the union of all appends and
            # returns the lsh_bucket_overflow audit of what it trimmed —
            # run it periodically on a long-lived index (the streaming
            # sink's compact_every_batches does this automatically)
            _cap_buckets(minhash_band_table(sigs), _LSH_BUCKET_CAP).write.mode(
                "append"
            ).partitionBy("band").parquet(f"{path}/bands")
            mem.select("doc_id", "rep_id").write.mode("append").parquet(
                f"{path}/members"
            )
            # append-after-delete is lossless (tombstones.py module note)
            from . import tombstones

            tombstones.unmask_ids(
                docs.sparkSession, path, mem.select("doc_id"), "doc_id"
            )
        finally:
            sigs.unpersist()
    finally:
        mem.unpersist()


def append_minhash_index(docs: DataFrame, path: str) -> None:
    """Append a later batch to an existing index (same layout, same
    signature parameters — the index is parameter-stable because _HASH_AB
    is a fixed module constant)."""
    build_minhash_index(docs, path)


def repair_minhash_append(docs: DataFrame, path: str) -> None:
    """Crash-convergent replay of :func:`append_minhash_index` for a
    redelivered batch whose previous attempt may have died BETWEEN the
    index's three component writes (r12, same bug class as the ADVICE r11
    inverted-index sink fix): keying the retry on the signatures table
    alone — the streaming sink's old discipline — leaves a doc whose
    signature landed but whose bands (or members) did not PERMANENTLY
    unfindable (band join misses it) or unattributable (inner members
    join drops its hits). This variant appends each component's OWN
    missing rows — signatures, capped band rows, member rows are each
    anti-joined against their stored table — so a retry converges from
    any crash point, including a first-batch build that died mid-way
    (per-table existence checks). Cost: three narrow doc_id anti-joins
    against stored components on the rare retry path; the common path
    stays the plain append."""
    from ..warehouse.hdfs import exists as _hx

    spark = docs.sparkSession
    mem = token_dedup_members(docs).cache()
    try:
        reps = mem.filter(F.col("doc_id") == F.col("rep_id")).select(
            "doc_id", "lang", "text"
        )
        sigs = minhash_signatures(reps, spread=False).cache()
        try:
            # each missing set is eagerly checkpointed: its plan reads the
            # stored path the write below appends to
            if _hx(spark, f"{path}/signatures"):
                stored = spark.read.parquet(f"{path}/signatures").select("doc_id")
                miss_s = sigs.join(stored, "doc_id", "left_anti").localCheckpoint(
                    eager=True
                )
            else:
                miss_s = sigs
            if not miss_s.isEmpty():
                miss_s.write.mode("append").parquet(f"{path}/signatures")
            if _hx(spark, f"{path}/bands"):
                stored = (
                    spark.read.parquet(f"{path}/bands").select("doc_id").distinct()
                )
                miss_b = sigs.join(stored, "doc_id", "left_anti").localCheckpoint(
                    eager=True
                )
            else:
                miss_b = sigs
            if not miss_b.isEmpty():
                _cap_buckets(minhash_band_table(miss_b), _LSH_BUCKET_CAP).write.mode(
                    "append"
                ).partitionBy("band").parquet(f"{path}/bands")
            pairs = mem.select("doc_id", "rep_id")
            if _hx(spark, f"{path}/members"):
                stored = spark.read.parquet(f"{path}/members").select("doc_id")
                miss_m = pairs.join(stored, "doc_id", "left_anti").localCheckpoint(
                    eager=True
                )
            else:
                miss_m = pairs
            if not miss_m.isEmpty():
                miss_m.write.mode("append").parquet(f"{path}/members")
            # same append-after-delete contract as the plain append path
            from . import tombstones

            tombstones.unmask_ids(spark, path, mem.select("doc_id"), "doc_id")
        finally:
            sigs.unpersist()
    finally:
        mem.unpersist()


def query_minhash_index(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    threshold: float = _NEARDUP_THRESHOLD,
    _caches: list | None = None,
) -> DataFrame:
    """(new_doc_id, indexed_doc_id, est_jaccard) for every doc in the new
    batch whose signature-estimated Jaccard against an INDEXED doc is ≥
    ``threshold``. The new batch is exact-collapsed first (its internal
    duplicates share one probe) and results are expanded back to all
    members ON BOTH SIDES: the stored members table fans each hit out to
    the indexed rep's exact-duplicate group, so every indexed doc is
    reported, not just the rep whose signature is stored. The stored corpus
    is touched only through the band join (hash join on (band, bucket)
    against narrow rows) and a signature join on the candidate doc_ids —
    no stored text, no corpus re-scan. The final DISTINCT also makes the
    answer insensitive to duplicate index rows from a replayed append.

    The new batch's signature frame is cached for the duration of the
    query; callers that loop (the streaming sink) pass ``_caches=[]`` and
    unpersist afterwards — same contract as :func:`minhash_lsh_pairs`."""
    new_mem = token_dedup_members(new_docs)
    new_members = new_mem.select("doc_id", "rep_id")
    new_reps = new_mem.filter(F.col("doc_id") == F.col("rep_id")).select(
        "doc_id", "lang", "text"
    )
    new_sigs = minhash_signatures(new_reps, spread=False).cache()
    if _caches is not None:
        _caches.append(new_sigs)
    new_bands = minhash_band_table(new_sigs)

    idx_bands = spark.read.parquet(f"{path}/bands").select("doc_id", "band", "bucket")
    candidates = (
        new_bands.alias("n")
        .join(
            idx_bands.alias("i"),
            (F.col("n.band") == F.col("i.band")) & (F.col("n.bucket") == F.col("i.bucket")),
        )
        .select(
            F.col("n.doc_id").alias("new_rep"), F.col("i.doc_id").alias("indexed_rep")
        )
        .distinct()
    )

    idx_sigs = spark.read.parquet(f"{path}/signatures")
    sig_cols = [f"sig_{i}" for i in range(_MINHASH_K)]
    agree = sum(
        (F.when(F.col(f"ns.{c}") == F.col(f"is.{c}"), 1).otherwise(0)) for c in sig_cols
    )
    est = (agree.cast("double") / F.lit(float(_MINHASH_K))).alias("est_jaccard")
    rep_pairs = (
        candidates.join(new_sigs.alias("ns"), F.col("new_rep") == F.col("ns.doc_id"))
        .join(idx_sigs.alias("is"), F.col("indexed_rep") == F.col("is.doc_id"))
        .select("new_rep", "indexed_rep", est)
        .filter(F.col("est_jaccard") >= threshold)
    )
    # Tombstone mask (r13): deletion only needs to filter the MEMBERS
    # table — every reported hit expands through it, so a rep whose
    # members are all tombstoned becomes unreachable automatically (its
    # signature/band rows are garbage purge_minhash_index reclaims).
    from . import tombstones as _ts

    idx_members = _ts.mask(
        spark.read.parquet(f"{path}/members"), spark, path, "doc_id"
    ).select(
        F.col("doc_id").alias("indexed_doc_id"), F.col("rep_id").alias("indexed_rep")
    )
    return (
        rep_pairs.join(new_members, rep_pairs.new_rep == new_members.rep_id)
        .join(idx_members, "indexed_rep")
        .select(
            F.col("doc_id").alias("new_doc_id"),
            "indexed_doc_id",
            "est_jaccard",
        )
        .distinct()
        .orderBy("new_doc_id", "indexed_doc_id")
    )


def delete_from_minhash_index(spark: SparkSession, path: str, doc_ids) -> None:
    """Tombstone documents out of the signature index (r13 — the last
    index family without a deletion leg): O(ids) sidecar append;
    tombstoned docs leave every :func:`query_minhash_index` answer
    immediately because the members expansion masks them, and a content
    group whose members are ALL tombstoned becomes unreachable (hits
    must expand through members). Physical reclaim — including the
    orphaned signature/band rows — is :func:`purge_minhash_index`;
    re-appending a doc un-deletes it (build/append/repair unmask)."""
    from . import tombstones

    tombstones.delete_ids(spark, path, doc_ids, "doc_id")


def purge_minhash_index(spark: SparkSession, path: str) -> int:
    """Physically remove tombstoned docs: rewrite ``members`` without
    their rows, then drop ``signatures``/``bands`` rows whose rep no
    longer has ANY surviving member (the content left the corpus), fix
    the streaming sink's ``ingested`` registry so a future legitimate
    re-ingest of a purged doc is not mistaken for a redelivery, and
    clear the sidecar LAST (crash anywhere earlier leaves serving
    correct — rows still masked). Returns members rows removed."""
    from . import tombstones
    from ..warehouse import hdfs

    stones = tombstones.load_tombstones(spark, path, "doc_id")
    if stones is None:
        return 0
    removed = tombstones.purge_table(
        spark, path, "members", "doc_id", None, clear_sidecar=False
    )
    if removed:
        surviving = (
            spark.read.parquet(f"{path}/members")
            .select(F.col("rep_id").alias("doc_id"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        for table, part in (("signatures", None), ("bands", "band")):
            src = f"{path}/{table}"
            rows = spark.read.parquet(src)
            kept = rows.join(F.broadcast(surviving), "doc_id", "semi")
            tmp = f"{src}.purging"
            if part is not None:
                kept.repartition(part).write.mode("overwrite").partitionBy(
                    part
                ).parquet(tmp)
            else:
                kept.write.mode("overwrite").parquet(tmp)
            hdfs.swap_aside(spark, src, tmp)
    if hdfs.exists(spark, f"{path}/ingested"):
        side = f"{path}/ingested"
        remaining = (
            spark.read.parquet(side)
            .join(F.broadcast(stones), "doc_id", "left_anti")
            .localCheckpoint(eager=True)
        )
        tmp = f"{side}.purging"
        remaining.coalesce(1).write.mode("overwrite").parquet(tmp)
        hdfs.swap_aside(spark, side, tmp)
    hdfs.delete(spark, f"{path}/{tombstones._SIDE}")
    return removed


def compact_minhash_index(
    spark: SparkSession, path: str, target_file_mb: int = 128, cap: int = _LSH_BUCKET_CAP
) -> DataFrame:
    """Rewrite the index's append-accumulated small files into ~target-sized
    ones AND restore the global band-bucket cap. Every
    :func:`append_minhash_index` lands its own file set and applies the
    bucket cap only within its own batch, so a long-running ingest
    accumulates O(appends) files per component and can grow a hot
    (band, bucket) group to cap×n_appends members — eroding the
    O(n²)-candidate guard the batch pipeline relies on. Compaction rewrites
    the band table wholesale, so it first drops replay-duplicated rows,
    re-applies :func:`_cap_buckets` across the UNION of all appends (the
    same deterministic smallest-doc_ids rule), and returns the
    :func:`lsh_bucket_overflow` audit of what the re-cap trimmed
    (no-silent-caps rule) — materialized driver-side BEFORE the swap, so
    the returned frame stays valid after the source directories move.
    Query answers over the compacted index are unchanged except the
    documented cap trims. The rewrite coalesces each flat component
    (narrow, no shuffle) and re-clusters the band table one file per band
    directory, publishing with the warehouse catalog's swap discipline: the
    live directory is renamed ASIDE (atomic on posix/HDFS) before the
    replacement moves in, so every crash window leaves the data recoverable
    under ``<component>.old`` — never deleted-before-replaced. All
    filesystem steps go through the Hadoop FileSystem resolved from the
    path (r7), so any Spark-readable URI works — file:// in tests, hdfs://
    on a cluster; on S3-style stores rename degrades to the connector's
    copy+delete (still crash-recoverable, not atomic — a production object-
    store index would layer a manifest pointer, see ``warehouse/hdfs.py``)."""
    from ..warehouse import hdfs
    from ..warehouse.bucketing import compact_parquet

    swap = lambda src, tmp: hdfs.swap_aside(spark, src, tmp)

    # "ingested" is the streaming sink's redelivery sidecar — present only
    # on sink-managed indexes, compacted with the same discipline
    flat = ["signatures", "members"] + (
        ["ingested"] if hdfs.exists(spark, f"{path}/ingested") else []
    )
    for comp in flat:
        src = f"{path}/{comp}"
        tmp = f"{src}.compacting"
        compact_parquet(spark, src, tmp, target_file_mb=target_file_mb)
        swap(src, tmp)
    src = f"{path}/bands"
    tmp = f"{src}.compacting"
    bands = spark.read.parquet(src).select("doc_id", "band", "bucket").dropDuplicates(
        ["doc_id", "band", "bucket"]
    )
    # overflow audit is tiny (only buckets past the cap) — checkpoint it
    # eagerly so it survives the directory swap below
    overflow = lsh_bucket_overflow(bands, cap).localCheckpoint(eager=True)
    _cap_buckets(bands, cap).repartition("band").write.mode("overwrite").partitionBy(
        "band"
    ).parquet(tmp)
    swap(src, tmp)
    return overflow


# --- Span-level (block) exact dedup ----------------------------------------
#
# Doc-level dedup misses REPEATED SPANS: boilerplate headers, license
# blurbs, navigation chrome duplicated across otherwise-distinct documents
# (the stage CCNet/RefinedWeb run as line-level dedup; this corpus has no
# line structure, so the unit is a fixed 16-token block). Corpus-wide
# first-occurrence-wins: every block keyed by its exact text, the earliest
# (doc_id, block_idx) keeps it, later copies are stripped and the document
# text is rebuilt from its surviving blocks. Scale shape: block explode is
# a bounded ×(len/16) row expansion of narrow rows; the winner per block
# key is ONE partial-agg min over an order-encoding bigint (no window, no
# self-join); rebuild is a per-doc collect of its own ≤len/16 blocks. The
# order encoding doc_id*10000+idx is collision-free while docs stay under
# 10000 blocks (160K tokens) — enforced by a raise_error guard on the idx
# feeding the encoding, so an over-long document fails the job loudly
# instead of silently electing the wrong first-occurrence winner.

_SPAN_BLOCK_TOKENS = 16
_SPAN_ORD_BASE = 10_000  # max blocks per doc for the order encoding

_SPAN_DEDUP_SQL = f"""
WITH toks AS (
  SELECT doc_id, {SQL_TOKENS} AS t, len({SQL_TOKENS}) AS n FROM documents
),
blocks AS (
  -- same ord-collision guard as the DataFrame path: a doc reaching
  -- _SPAN_ORD_BASE blocks would collide with the next doc_id's block 0,
  -- so both engines fail loudly instead of electing a collided winner
  -- (DuckDB CASE is lazily evaluated per-row, so error() fires only on
  -- offending rows)
  SELECT doc_id,
         CASE WHEN idx < {_SPAN_ORD_BASE} THEN CAST(idx AS BIGINT)
              ELSE CAST(error('span_dedup_blocks: doc ' || doc_id ||
                              ' exceeds {_SPAN_ORD_BASE} blocks; ord encoding would collide')
                        AS BIGINT) END AS idx,
         array_to_string(t[idx * {_SPAN_BLOCK_TOKENS} + 1 :
                           idx * {_SPAN_BLOCK_TOKENS} + {_SPAN_BLOCK_TOKENS}], ' ') AS block_text
  FROM toks, UNNEST(range(CAST(ceil(n / {_SPAN_BLOCK_TOKENS}.0) AS BIGINT))) AS u(idx)
),
firsts AS (
  SELECT block_text, MIN(doc_id * {_SPAN_ORD_BASE} + idx) AS ord FROM blocks GROUP BY block_text
),
kept AS (
  SELECT b.doc_id, b.idx, b.block_text
  FROM blocks b JOIN firsts f ON b.block_text = f.block_text
  WHERE b.doc_id * {_SPAN_ORD_BASE} + b.idx = f.ord
)
SELECT b.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(COUNT(k.idx) AS BIGINT) AS n_kept,
       COALESCE(string_agg(k.block_text, ' ' ORDER BY b.idx), '') AS clean_text
FROM blocks b
LEFT JOIN kept k ON b.doc_id = k.doc_id AND b.idx = k.idx
GROUP BY b.doc_id
ORDER BY b.doc_id
"""


def span_dedup_blocks(
    docs: DataFrame, block_tokens: int = _SPAN_BLOCK_TOKENS
) -> DataFrame:
    """(doc_id, n_blocks, n_kept, clean_text): strip every ``block_tokens``
    -token block whose exact text already occurred earlier in the corpus
    (earliest (doc_id, idx) wins), rebuilding each document from its
    surviving blocks. See the section note for the plan shape."""
    toks = tokens_col(F.col("text"))
    n_blocks = F.ceil(F.size(toks) / float(block_tokens)).cast("bigint")
    start = F.col("idx").cast("int") * block_tokens
    blocks = (
        docs.select("doc_id", toks.alias("t"), n_blocks.alias("nb"))
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("nb") - 1)).alias("idx"),
            "t",
        )
        .select(
            "doc_id",
            F.col("idx").cast("bigint").alias("idx"),
            F.concat_ws(" ", F.slice(F.col("t"), start + 1, block_tokens)).alias(
                "block_text"
            ),
        )
    )
    # hard guard on the order encoding: any doc reaching _SPAN_ORD_BASE
    # blocks would collide with the next doc_id's block 0 — fail the job
    # per-row (no extra action/scan) rather than mis-pick a winner
    idx_checked = F.when(F.col("idx") < _SPAN_ORD_BASE, F.col("idx")).otherwise(
        F.raise_error(
            F.concat(
                F.lit("span_dedup_blocks: doc_id "),
                F.col("doc_id").cast("string"),
                F.lit(
                    f" has >= {_SPAN_ORD_BASE} blocks; the"
                    f" doc_id*{_SPAN_ORD_BASE}+idx order encoding would collide"
                    " across documents — raise block_tokens or split the doc"
                ),
            )
        ).cast("bigint")
    )
    ord_col = F.col("doc_id") * _SPAN_ORD_BASE + idx_checked
    firsts = blocks.groupBy("block_text").agg(F.min(ord_col).alias("ord"))
    kept = (
        blocks.join(firsts, "block_text")
        .filter(ord_col == F.col("ord"))
        .select(
            F.col("doc_id").alias("k_doc"),
            F.col("idx").alias("k_idx"),
            F.col("block_text").alias("k_text"),
        )
    )
    joined = blocks.join(
        kept,
        (F.col("doc_id") == F.col("k_doc")) & (F.col("idx") == F.col("k_idx")),
        "left",
    ).select("doc_id", "idx", "k_idx", F.col("k_text").alias("block_text"))
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
            F.count("k_idx").cast("bigint").alias("n_kept"),
            F.coalesce(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("k_idx").isNotNull(),
                                    F.struct("idx", "block_text"),
                                )
                            )
                        ),
                        lambda s: s["block_text"],
                    ),
                ),
                F.lit(""),
            ).alias("clean_text"),
        )
        .orderBy("doc_id")
    )


@query("dedup_span_blocks", oracle=_SPAN_DEDUP_SQL, defer=True)
def dedup_span_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide span dedup over 16-token blocks — the line-level-dedup
    stage (boilerplate stripping) that doc-level dedup cannot express."""
    docs = _docs(spark, sf_dir)
    # the order encoding requires < _SPAN_ORD_BASE blocks per doc
    return span_dedup_blocks(docs)


# --- n-gram novelty score ---------------------------------------------------
#
# The inverse signal of span dedup: how much of a document exists NOWHERE
# else? novelty = fraction of its distinct 3-gram shingles with corpus
# document-frequency 1. Low-novelty docs are templated/boilerplate even
# when no single block repeats verbatim; high-novelty docs carry unique
# content worth keeping at dedup margins. Scale shape: reuses this
# module's shingle explode, one partial-agg df groupBy, one 1-row-per-key
# hash join back (the df side has one row per shingle, so a hot shingle
# fans out 1:1 with its left rows — no reducer explosion), and a per-doc
# counting groupBy. No window anywhere.

_NOVELTY_SQL = f"""
WITH shingles AS ({_SQL_SHINGLES}),
dfreq AS (SELECT shingle, COUNT(*) AS df FROM shingles GROUP BY shingle),
per AS (
  SELECT s.doc_id,
         COUNT(*) AS n_shingles,
         SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS n_unique
  FROM shingles s JOIN dfreq d ON s.shingle = d.shingle
  GROUP BY s.doc_id
)
SELECT doc_id,
       CAST(n_shingles AS BIGINT) AS n_shingles,
       CAST(n_unique AS BIGINT) AS n_unique,
       ROUND(CAST(n_unique AS DOUBLE) / CAST(n_shingles AS DOUBLE), 6) AS novelty
FROM per
ORDER BY doc_id
"""


def ngram_novelty(docs: DataFrame) -> DataFrame:
    """(doc_id, n_shingles, n_unique, novelty) per document with ≥3
    tokens — the share of its distinct 3-gram shingles that no other
    document contains."""
    sh = _shingle_rows(docs).select("doc_id", "shingle")
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    per = (
        sh.join(dfreq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_unique"),
        )
    )
    return per.select(
        "doc_id",
        "n_shingles",
        "n_unique",
        F.round(
            F.col("n_unique").cast("double") / F.col("n_shingles").cast("double"), 6
        ).alias("novelty"),
    ).orderBy("doc_id")


@query("text_ngram_novelty", oracle=_NOVELTY_SQL, defer=True)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus novelty profile: per-document share of 3-gram shingles unique
    to that document — the templated-vs-original quality signal."""
    return ngram_novelty(_docs(spark, sf_dir))


# --- Corpus fingerprints: source-level similarity ---------------------------
#
# Doc-pair dedup answers "which documents repeat"; dataset governance also
# needs the CORPUS-level question — how similar are two sources' shingle
# SPACES overall (two dumps of the same site, a re-crawl, a vendor
# re-delivery) — without comparing any document pairs. Union-MinHash: the
# elementwise MIN of a source's shingle hashes under the same 64 hash
# functions is exactly the MinHash signature of the UNION of its shingle
# sets, so signature agreement between two sources estimates the Jaccard
# of their corpus-wide shingle spaces (std ≈ √(J(1−J)/64)). Scale shape:
# one shingle explode + ONE partial-agg 64-min groupBy to |sources| rows;
# the pairwise compare runs over a |sources|² grid of 520-byte rows.
# No collapse first — an exact dup present in two sources must count
# toward both unions.

_FINGERPRINT_SIM_SQL = f"""
WITH shingles AS ({_SQL_SHINGLES}),
lab AS (SELECT doc_id, source FROM documents),
hashed AS (
  SELECT l.source, {_sql_md5_long("shingle", 15)} % {_P} AS h
  FROM shingles s JOIN lab l ON s.doc_id = l.doc_id
),
sigs AS (
  SELECT source,
         {_SQL_MINHASH_SIGS}
  FROM hashed GROUP BY source
)
SELECT a.source AS source_a, b.source AS source_b,
       ROUND(({" + ".join(f"(CASE WHEN a.sig_{i} = b.sig_{i} THEN 1 ELSE 0 END)" for i in range(len(_HASH_AB)))})
             / {len(_HASH_AB)}.0, 6) AS est_jaccard
FROM sigs a JOIN sigs b ON a.source < b.source
ORDER BY source_a, source_b
"""


def source_fingerprint_similarity(docs: DataFrame, stratum: str = "source") -> DataFrame:
    """(source_a, source_b, est_jaccard): corpus-level shingle-space
    similarity for every source pair via union-MinHash — see the section
    note. Exact doc duplicates intentionally count toward every source
    that carries them."""
    sh = _shingle_rows(docs).select("doc_id", "shingle")
    lab = docs.select("doc_id", stratum)
    h = F.pmod(_md5_long(F.col("shingle"), 15), F.lit(_P))
    hashed = sh.join(lab, "doc_id").select(stratum, h.alias("h"))
    sigs = hashed.groupBy(stratum).agg(
        *[
            F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(_P))).alias(f"sig_{i}")
            for i, (a, b) in enumerate(_HASH_AB)
        ]
    )
    a = sigs.alias("a")
    b = sigs.alias("b")
    agree = None
    for i in range(len(_HASH_AB)):
        term = F.when(F.col(f"a.sig_{i}") == F.col(f"b.sig_{i}"), 1).otherwise(0)
        agree = term if agree is None else agree + term
    return (
        a.join(b, F.col(f"a.{stratum}") < F.col(f"b.{stratum}"))
        .select(
            F.col(f"a.{stratum}").alias("source_a"),
            F.col(f"b.{stratum}").alias("source_b"),
            F.round(agree / float(len(_HASH_AB)), 6).alias("est_jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


@query("dedup_source_fingerprints", oracle=_FINGERPRINT_SIM_SQL, defer=True)
def dedup_source_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise corpus-level similarity of every source's shingle space —
    the re-delivery / re-crawl detector that needs no document pairs."""
    return source_fingerprint_similarity(_docs(spark, sf_dir))


# --- content-defined chunking (CDC) span dedup -------------------------------
#
# Fixed-block span dedup (span_dedup_blocks) measures verbatim overlap in
# 16-token grid cells — one token INSERTED at the front of a copy shifts
# every downstream block off the grid and the overlap vanishes. CDC places
# chunk boundaries where a rolling window's content hash lands in a
# residue class (the gear/Rabin idiom of storage dedup, token-level here):
# boundaries are a function of the TEXT, not the position, so after any
# localized edit the chunking re-synchronizes at the next content
# boundary and the shared suffix dedups chunk-for-chunk. Public technique
# (LBFS/Venti-style CDC); no reference counterpart — LLM-pipeline
# extension. Scale shape: boundary detection is a per-row array
# expression (no explode until chunks exist, ~n_tokens/_CDC_MODULUS
# chunks/doc), then the novelty-style occurrence join: one partial-agg
# groupBy on chunk text, one 1:1 hash join back, one per-doc groupBy —
# no window, no all-pairs anywhere, shards by chunk-text hash at 100 TB.
#
# Determinism across engines: the boundary predicate is the engine-wide
# md5-13-hex uniform over the concat_ws-joined window, so Spark and
# DuckDB compute identical boundaries; fractions round 6dp.

_CDC_WINDOW = 3  # rolling window (tokens) the boundary hash covers
_CDC_MODULUS = 8  # P(boundary) = 1/8 per position → ~8-token chunks


def _spread_rows(docs: DataFrame) -> DataFrame:
    """Row-wise-projection parallelism guard (r12): a CPU-heavy per-row
    projection inherits the SCAN's partitioning, and a small-file corpus
    (one parquet row group = one unsplittable partition) would run the
    whole projection on one core — measured 110 s single-task for CDC
    chunking at sf0.1 vs ~5 s spread. Repartition by doc_id up to the
    default parallelism when the input arrives narrower; on a real
    many-split corpus this is a no-op (input partitions already >= cores),
    so nothing extra shuffles at 100 TB."""
    want = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < want:
        return docs.repartition(want, "doc_id")
    return docs


def cdc_chunks(docs: DataFrame, window: int = _CDC_WINDOW, modulus: int = _CDC_MODULUS) -> DataFrame:
    """(doc_id, idx, chunk_text) content-defined chunks per document.

    A position ``i`` (1-based token index, ``i >= window``) ends a chunk
    iff md5_13hex(tokens[i-window+1 .. i] joined by ' ') % modulus == 0;
    the final position always ends the last chunk. Documents shorter than
    ``window`` tokens are one chunk. The per-position rolling md5 is the
    dominant cost and is pure row-wise projection — spread across cores
    before computing (see :func:`_spread_rows`)."""
    docs = _spread_rows(docs)
    # STAGED COLUMNS (r18): HOF lambdas are interpreted, so a lambda body
    # that references an enclosing EXPRESSION re-evaluates it per element.
    # The old single-projection form paid that twice over: the boundary
    # filter's lambda re-tokenized the document per position, and the
    # chunk rebuild's element_at(ends, j) re-ran the whole
    # tokenize+rolling-md5 boundary chain per chunk — profiled at 114
    # executor-CPU-seconds for a 0.3 s boundary scan at sf0.1 (O(n²) per
    # doc). Tokens and ends are now materialized columns (multi-use,
    # non-cheap aliases — CollapseProject keeps them staged), so each is
    # computed once per row; output is bit-identical.
    base = docs.select("doc_id", tokens_col(F.col("text")).alias("_t"))
    t = F.col("_t")
    n = F.size(t)

    # md5_13hex(win) % modulus == 0, evaluated without the 13-hex-digit
    # conv()+bigint-mod per position: 16 ≡ 0 (mod 2^m) for m <= 4, so the
    # value of the 13-char prefix mod a power-of-two modulus <= 16 equals
    # the 13th hex digit's value mod it — one substring + a tiny IN list
    # per position instead of a 13-char base conversion (bit-identical
    # boundaries).
    if modulus in (2, 4, 8, 16):
        ok_digits = [h for h in "0123456789abcdef" if int(h, 16) % modulus == 0]

        def is_bnd(i):
            win = F.concat_ws(" ", F.slice(t, i - window + 1, window))
            return F.substring(F.md5(win), 13, 1).isin(*ok_digits)

    else:

        def is_bnd(i):
            win = F.concat_ws(" ", F.slice(t, i - window + 1, window))
            return _md5_long(win, 13) % modulus == 0

    raw = F.when(
        n >= window, F.filter(F.sequence(F.lit(window), n), is_bnd)
    ).otherwise(F.array().cast("array<int>"))
    withe = base.select(
        "doc_id", "_t", F.array_sort(F.array_distinct(F.concat(raw, F.array(n)))).alias("_ends")
    )
    ends = F.col("_ends")
    chunks = F.transform(
        ends,
        lambda e, j: F.struct(
            j.cast("bigint").alias("idx"),
            F.concat_ws(
                " ",
                F.slice(
                    t,
                    F.when(j == 0, F.lit(1)).otherwise(F.element_at(ends, j) + 1),
                    e - F.when(j == 0, F.lit(0)).otherwise(F.element_at(ends, j)),
                ),
            ).alias("chunk_text"),
        ),
    )
    return (
        withe.select("doc_id", F.explode(chunks).alias("c"))
        .select("doc_id", F.col("c.idx").alias("idx"), F.col("c.chunk_text").alias("chunk_text"))
    )


# shared chunk-building CTE prefix — both CDC oracles use the identical
# boundary predicate and rebuild (the _BLM_CTES precedent: paired oracles
# must not drift)
_CDC_CHUNKS_CTES = f"""toks AS (
  SELECT doc_id, {SQL_TOKENS} AS t FROM documents
),
bnds AS (
  SELECT doc_id, t,
         list_sort(list_distinct(list_append(
           CASE WHEN len(t) >= {_CDC_WINDOW}
                THEN list_filter(range({_CDC_WINDOW}, len(t) + 1),
                     i -> {_sql_md5_long(f"array_to_string(array_slice(t, i - {_CDC_WINDOW} + 1, i), ' ')", 13)} % {_CDC_MODULUS} = 0)
                ELSE [] END,
           len(t)))) AS ends
  FROM toks
),
bounds AS (
  SELECT doc_id, t, UNNEST(ends) AS e, UNNEST(range(1, len(ends) + 1)) AS j
  FROM bnds
),
chunks AS (
  SELECT doc_id, CAST(j - 1 AS BIGINT) AS idx,
         array_to_string(array_slice(t,
           COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY j), 0) + 1, e), ' ') AS chunk_text
  FROM bounds
)"""

_CDC_SQL = f"""
WITH {_CDC_CHUNKS_CTES},
occ AS (SELECT chunk_text, COUNT(*) AS cnt FROM chunks GROUP BY chunk_text)
SELECT c.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN o.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       ROUND(SUM(CASE WHEN o.cnt > 1 THEN 1.0 ELSE 0.0 END) / COUNT(*), 6) AS dup_frac
FROM chunks c JOIN occ o ON c.chunk_text = o.chunk_text
GROUP BY c.doc_id
ORDER BY c.doc_id
"""


def cdc_dup_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chunks, n_dup, dup_frac): per-document share of
    content-defined chunks whose exact text occurs more than once in the
    corpus (other documents or self-repeats) — the shift-robust
    counterpart of span_dedup_blocks' grid overlap."""
    # materialize once: the rolling-md5 chunk projection feeds BOTH the
    # occurrence count and the join side; without the checkpoint Spark
    # recomputes it per consumer (measured 2x the projection cost at
    # sf0.1 — the quality_perplexity_buckets discipline).
    # r18: the occurrence groupBy and the rejoin carry a 16-byte
    # unhex(md5(chunk_text)) key, never the chunk text itself — the same
    # exact-key convention token_dedup_members already rests on — so the
    # checkpoint holds (doc_id, key) rows and chunk bytes never cross a
    # shuffle (guide §2.3: shuffle keys, not payloads).
    chunks = (
        cdc_chunks(docs)
        .select("doc_id", F.unhex(F.md5(F.col("chunk_text"))).alias("ck"))
        .localCheckpoint(eager=True)
    )
    occ = chunks.groupBy("ck").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    dup = F.when(F.col("cnt") > 1, F.lit(1)).otherwise(F.lit(0))
    return (
        chunks.join(occ, "ck")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum(dup).cast("bigint").alias("n_dup"),
            F.round(
                F.sum(dup).cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


@query("dedup_cdc_chunks", oracle=_CDC_SQL, headline=True, defer=True)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined-chunking span dedup: per-document duplicated-chunk
    fraction under rolling-hash boundaries, robust to insert/delete shifts
    that blind the fixed 16-token grid."""
    return cdc_dup_stats(_docs(spark, sf_dir))


_CDC_STRIP_SQL = f"""
WITH {_CDC_CHUNKS_CTES},
guarded AS (
  SELECT doc_id,
         CASE WHEN idx < {_SPAN_ORD_BASE} THEN idx
              ELSE CAST(error('cdc_dedup_strip: doc ' || doc_id ||
                              ' exceeds {_SPAN_ORD_BASE} chunks; ord encoding would collide')
                        AS BIGINT) END AS idx,
         chunk_text
  FROM chunks
),
firsts AS (
  SELECT chunk_text, MIN(doc_id * {_SPAN_ORD_BASE} + idx) AS ord
  FROM guarded GROUP BY chunk_text
),
kept AS (
  SELECT g.doc_id, g.idx, g.chunk_text
  FROM guarded g JOIN firsts f ON g.chunk_text = f.chunk_text
  WHERE g.doc_id * {_SPAN_ORD_BASE} + g.idx = f.ord
)
SELECT g.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(COUNT(k.idx) AS BIGINT) AS n_kept,
       COALESCE(string_agg(k.chunk_text, ' ' ORDER BY g.idx), '') AS clean_text
FROM guarded g
LEFT JOIN kept k ON g.doc_id = k.doc_id AND g.idx = k.idx
GROUP BY g.doc_id
ORDER BY g.doc_id
"""


def cdc_dedup_strip(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chunks, n_kept, clean_text): strip every content-defined
    chunk whose exact text already occurred earlier in the corpus
    (earliest (doc_id, idx) wins), rebuilding each document from its
    surviving chunks — the ACTION to :func:`cdc_dup_stats`' measurement,
    and the shift-robust twin of :func:`span_dedup_blocks` (same
    first-wins MIN over the ord encoding, same collision guard; plan
    shape notes there apply unchanged)."""
    # materialize once: three consumers (firsts agg + both join sides)
    # would otherwise recompute the rolling-md5 projection three times
    chunks = cdc_chunks(docs).localCheckpoint(eager=True)
    idx_checked = F.when(F.col("idx") < _SPAN_ORD_BASE, F.col("idx")).otherwise(
        F.raise_error(
            F.concat(
                F.lit("cdc_dedup_strip: doc "),
                F.col("doc_id").cast("string"),
                F.lit(
                    f" exceeds {_SPAN_ORD_BASE} chunks; ord encoding would collide"
                ),
            )
        ).cast("bigint")
    )
    ord_col = F.col("doc_id") * _SPAN_ORD_BASE + idx_checked
    firsts = chunks.groupBy("chunk_text").agg(F.min(ord_col).alias("ord"))
    kept = (
        chunks.join(firsts, "chunk_text")
        .filter(ord_col == F.col("ord"))
        .select(
            F.col("doc_id").alias("k_doc"),
            F.col("idx").alias("k_idx"),
            F.col("chunk_text").alias("k_text"),
        )
    )
    joined = chunks.join(
        kept,
        (F.col("doc_id") == F.col("k_doc")) & (F.col("idx") == F.col("k_idx")),
        "left",
    ).select("doc_id", "idx", "k_idx", F.col("k_text").alias("chunk_text"))
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.count("k_idx").cast("bigint").alias("n_kept"),
            F.coalesce(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("k_idx").isNotNull(),
                                    F.struct("idx", "chunk_text"),
                                )
                            )
                        ),
                        lambda s: s["chunk_text"],
                    ),
                ),
                F.lit(""),
            ).alias("clean_text"),
        )
        .orderBy("doc_id")
    )


@query("dedup_cdc_strip", oracle=_CDC_STRIP_SQL, defer=True)
def dedup_cdc_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide CDC chunk stripping: first occurrence wins, documents
    rebuilt from surviving chunks — shift-robust boilerplate removal."""
    return cdc_dedup_strip(_docs(spark, sf_dir))


# --- quality-aware survivor selection (r12) ----------------------------------
#
# The min-id survivor rule (connected_components) is deterministic but
# blind: when a cluster holds a rich original and a truncated mirror, the
# mirror survives whenever its doc_id is smaller. Production curation
# keeps the BEST copy — here quality = distinct-token count (an exact
# bigint, so the rule is engine-identical with no float risk), argmax per
# component, ties broken by min doc_id. Scale shape: components as before
# (O(diameter) rounds over capped-degree edges), one narrow quality
# projection, and a per-component row_number — WindowGroupLimit-eligible,
# components are near-clique-sized so no hot partition.

_QUALITY_SURVIVOR_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT doc_id_1, doc_id_2 FROM ({_sql_minhash_pairs_over("documents")})
),
edges AS (
  SELECT doc_id_1 AS a, doc_id_2 AS b FROM pairs
  UNION
  SELECT doc_id_2, doc_id_1 FROM pairs
),
reach(node, lab) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, r.lab FROM edges e JOIN reach r ON e.b = r.node
),
comp AS (
  SELECT node AS doc_id, CAST(MIN(lab) AS BIGINT) AS component_id
  FROM reach GROUP BY node
),
quality AS (
  SELECT doc_id,
         CAST(len(list_distinct({SQL_TOKENS})) AS BIGINT) AS quality
  FROM documents
)
SELECT c.doc_id, c.component_id, q.quality,
       row_number() OVER (PARTITION BY c.component_id
                          ORDER BY q.quality DESC, c.doc_id) = 1 AS is_survivor
FROM comp c JOIN quality q USING (doc_id)
ORDER BY component_id, doc_id
"""


def quality_survivors(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """(doc_id, component_id, quality, is_survivor): component membership
    from the edge list with the argmax-quality survivor rule — see the
    section note."""
    from pyspark.sql import Window

    comp = connected_components(pairs).select("doc_id", "component_id")
    quality = docs.select(
        "doc_id",
        F.size(F.array_distinct(tokens_col(F.col("text"))))
        .cast("bigint")
        .alias("quality"),
    )
    w = Window.partitionBy("component_id").orderBy(
        F.col("quality").desc(), "doc_id"
    )
    return (
        comp.join(quality, "doc_id")
        .withColumn("is_survivor", F.row_number().over(w) == 1)
        .orderBy("component_id", "doc_id")
    )


@query("dedup_quality_survivor", oracle=_QUALITY_SURVIVOR_SQL, defer=True)
def dedup_quality_survivor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters with the quality-aware survivor rule: the
    RICHEST copy (most distinct tokens, ties min-id) survives each
    component — the curation decision min-id deduplication gets wrong
    whenever a truncated mirror carries the smaller id."""
    caches: list = []
    pairs = minhash_lsh_pairs(_docs(spark, sf_dir), _caches=caches)
    out = quality_survivors(_docs(spark, sf_dir), pairs)
    out = out.localCheckpoint(eager=True)
    for c in caches:
        c.unpersist()
    return out


# --- cross-language exact duplicates (r12) -----------------------------------
#
# Exact duplicates whose language labels DISAGREE: either lang-ID noise
# (the same content labeled en in one crawl, de in another) or templated
# content that defeats the labeler — both actionable label-noise signals
# a per-language mixture must clean before per-lang quotas mean anything.
# Scale shape: one normalized-md5 groupBy (the exact-dedup key), pairs
# expanded only inside multi-lang groups under the family 64-smallest-id
# cap, so a pathological million-copy template cannot detonate a reducer.

_XLANG_CAP = 64


def cross_lang_dup_pairs(docs: DataFrame, cap: int = _XLANG_CAP) -> DataFrame:
    """(doc_a, doc_b, lang_a, lang_b): exact-content pairs with differing
    language labels, membership per content group bounded at the ``cap``
    smallest doc_ids."""
    from pyspark.sql import Window

    keyed = docs.select(
        "doc_id",
        "lang",
        _md5_long(normalize_content(F.col("text")), 13).alias("k"),
    )
    w = Window.partitionBy("k").orderBy("doc_id")
    capped = (
        keyed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    return (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.lang") != F.col("b.lang")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.lang").alias("lang_a"),
            F.col("b.lang").alias("lang_b"),
        )
        .orderBy("doc_a", "doc_b")
    )


_XLANG_KEY = _sql_md5_long(SQL_NORM, 13)

# Planted probe set (r13, VERDICT r12 ask #2): the fixture corpus is clean,
# so the bare query proved only emptiness agreement. These five literal
# documents — identical in both engines, ids far above any fixture range —
# make the driver row prove DETECTION: the expected pairs exercise the
# whitespace/case normalization (10000002 matches through it), transitive
# multi-lang groups, and the lang_a <> lang_b predicate (10000005 shares
# content AND language with 10000001 — a negative control that must pair
# with the de/fr copies but never with its same-lang twin). 10000004 is
# the no-pair negative control.
_XLANG_PROBE_TEXT = "the quick brown fox jumps over the lazy dog"
_XLANG_PROBES = [
    (10000001, "en", _XLANG_PROBE_TEXT),
    (10000002, "de", "The Quick  Brown Fox jumps over the lazy dog "),
    (10000003, "fr", _XLANG_PROBE_TEXT),
    (10000004, "en", "completely different negative control content"),
    (10000005, "en", _XLANG_PROBE_TEXT),
]

_XLANG_PROBE_VALUES = ",\n         ".join(
    f"({i}, '{lang}', '{text}')" for i, lang, text in _XLANG_PROBES
)

_XLANG_SQL = f"""
WITH corpus AS (
  SELECT doc_id, lang, text FROM documents
  UNION ALL
  SELECT * FROM (VALUES {_XLANG_PROBE_VALUES}) AS probes(doc_id, lang, text)
),
keyed AS (
  SELECT doc_id, lang,
         {_XLANG_KEY} AS k
  FROM corpus
),
capped AS (
  SELECT doc_id, lang, k FROM (
    SELECT doc_id, lang, k,
           row_number() OVER (PARTITION BY k ORDER BY doc_id) AS rn
    FROM keyed
  ) WHERE rn <= {_XLANG_CAP}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       a.lang AS lang_a, b.lang AS lang_b
FROM capped a
JOIN capped b ON a.k = b.k AND a.doc_id < b.doc_id AND a.lang <> b.lang
ORDER BY doc_a, doc_b
"""


@query("dedup_cross_lang_pairs", oracle=_XLANG_SQL, defer=True)
def dedup_cross_lang_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-content duplicate pairs whose language labels disagree — the
    lang-ID label-noise detector a per-language mixture needs before its
    quotas mean anything. The fixture corpus is clean, so the query seeds
    five planted probe documents (identical literals in both engines) and
    the driver row proves detection — normalization-matched pairs, the
    multi-lang group expansion, and the same-lang negative control — not
    just emptiness agreement; test_cross_lang_dup_pairs_planted pins the
    semantics on richer planted corpora."""
    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    spark_probes = docs.sparkSession.createDataFrame(
        _XLANG_PROBES, "doc_id bigint, lang string, text string"
    )
    return cross_lang_dup_pairs(docs.unionByName(spark_probes))


# --- cross-method clustering agreement: Adjusted Rand Index (r14) ------------
#
# The engine ships TWO independent near-dup families (MinHash/LSH on
# shingle sets, SimHash on token hashes). Do they agree on WHAT is a
# duplicate? The Adjusted Rand Index (Hubert & Arabie 1985) is the
# standard chance-corrected agreement between two clusterings — ~1.0
# means the cheaper signature family can stand in for the expensive one,
# ~0 means the families disagree beyond chance and thresholds need
# retuning. Both clusterings are the transitive closures of each
# family's pair set with every unpaired document as its own singleton,
# so the universe is the full corpus. All combinatorics are exact
# bigints (n·(n−1)/2 terms; the Σa·Σb product alone crosses to double —
# it exceeds int64 at corpus scale — identically in both engines before
# the single rounded division). Scale shape: two pipelines the engine
# already runs + one (ca, cb) contingency groupBy whose row count is
# bounded by the number of non-trivial clusters, not the corpus.


def clustering_ari(labels_a: DataFrame, labels_b: DataFrame, universe: DataFrame) -> DataFrame:
    """One row (n_docs, clusters_a, clusters_b, ari): Adjusted Rand Index
    between two (doc_id, component_id) labelings over ``universe``
    (doc_id); docs missing from a labeling count as singletons."""
    lab = (
        universe.select("doc_id")
        .join(labels_a.select("doc_id", F.col("component_id").alias("ca")), "doc_id", "left")
        .join(labels_b.select("doc_id", F.col("component_id").alias("cb")), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("ca", F.col("doc_id")).alias("ca"),
            F.coalesce("cb", F.col("doc_id")).alias("cb"),
        )
    )
    cont = lab.groupBy("ca", "cb").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    # exact integer combinatorics in decimal(38,0) (the repo's second-
    # moment discipline): bigint n·(n−1) wraps silently past n ≈ 3.04e9
    # in non-ANSI Spark (while the DuckDB oracle errors) — exactly the
    # corpus-scale regime this operator targets. Halving the EVEN factor
    # first (one of n, n−1 always is) keeps every step an exact integer:
    # the halved factor still fits bigint, the decimal(38,0) multiply is
    # exact past int64, and no `div` appears (Spark's IntegralDivide
    # returns LongType, which would re-overflow the quotient). The Σcomb
    # accumulators stay decimal for the same reason.
    comb = lambda c: F.expr(  # noqa: E731
        f"CASE WHEN {c} % 2 = 0"
        f" THEN CAST({c} div 2 AS decimal(38,0)) * CAST({c} - 1 AS decimal(38,0))"
        f" ELSE CAST({c} AS decimal(38,0)) * CAST(({c} - 1) div 2 AS decimal(38,0))"
        f" END"
    ).cast("decimal(38,0)")
    sij = cont.agg(F.sum(comb("n")).cast("decimal(38,0)").alias("sij"))
    sa = (
        cont.groupBy("ca")
        .agg(F.sum("n").alias("m"))
        .agg(
            F.sum(comb("m")).cast("decimal(38,0)").alias("sa"),
            F.count(F.lit(1)).cast("bigint").alias("ka"),
        )
    )
    sb = (
        cont.groupBy("cb")
        .agg(F.sum("n").alias("m"))
        .agg(
            F.sum(comb("m")).cast("decimal(38,0)").alias("sb"),
            F.count(F.lit(1)).cast("bigint").alias("kb"),
        )
    )
    tot = lab.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    j = sij.crossJoin(sa).crossJoin(sb).crossJoin(tot)
    cn2 = comb("n_docs").cast("double")
    exp = F.col("sa").cast("double") * F.col("sb").cast("double") / cn2
    num = F.col("sij").cast("double") - exp
    den = (F.col("sa").cast("double") + F.col("sb").cast("double")) / F.lit(2.0) - exp
    return j.select(
        "n_docs",
        F.col("ka").alias("clusters_a"),
        F.col("kb").alias("clusters_b"),
        F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("ari"),
    )


_ARI_SQL = f"""
WITH RECURSIVE
pa AS MATERIALIZED (SELECT doc_id_1, doc_id_2 FROM ({_sql_minhash_pairs_over("documents")})),
ea AS MATERIALIZED (
  SELECT doc_id_1 AS a, doc_id_2 AS b FROM pa
  UNION
  SELECT doc_id_2, doc_id_1 FROM pa
),
reacha(node, lab) AS (
  SELECT a, a FROM ea
  UNION
  SELECT e.a, r.lab FROM ea e JOIN reacha r ON e.b = r.node
),
la AS MATERIALIZED (SELECT node AS doc_id, MIN(lab) AS comp FROM reacha GROUP BY node),
pb AS MATERIALIZED (SELECT doc_id_1, doc_id_2 FROM ({_SIMHASH_SQL})),
eb AS MATERIALIZED (
  SELECT doc_id_1 AS a, doc_id_2 AS b FROM pb
  UNION
  SELECT doc_id_2, doc_id_1 FROM pb
),
reachb(node, lab) AS (
  SELECT a, a FROM eb
  UNION
  SELECT e.a, r.lab FROM eb e JOIN reachb r ON e.b = r.node
),
lb AS MATERIALIZED (SELECT node AS doc_id, MIN(lab) AS comp FROM reachb GROUP BY node),
lab AS (
  SELECT d.doc_id,
         COALESCE(la.comp, d.doc_id) AS ca,
         COALESCE(lb.comp, d.doc_id) AS cb
  FROM documents d
  LEFT JOIN la ON la.doc_id = d.doc_id
  LEFT JOIN lb ON lb.doc_id = d.doc_id
),
cont AS (SELECT ca, cb, CAST(COUNT(*) AS BIGINT) AS n FROM lab GROUP BY ca, cb),
-- exact comb in HUGEINT (DuckDB's BIGINT n*(n-1) ERRORS past n ~ 3.04e9
-- rather than wrapping; HUGEINT mirrors the engine's decimal(38,0) path)
sij AS (SELECT SUM(CAST(n AS HUGEINT) * (n - 1) // 2) AS sij FROM cont),
sa AS (
  SELECT SUM(CAST(m AS HUGEINT) * (m - 1) // 2) AS sa,
         CAST(COUNT(*) AS BIGINT) AS ka
  FROM (SELECT ca, SUM(n) AS m FROM cont GROUP BY ca)
),
sb AS (
  SELECT SUM(CAST(m AS HUGEINT) * (m - 1) // 2) AS sb,
         CAST(COUNT(*) AS BIGINT) AS kb
  FROM (SELECT cb, SUM(n) AS m FROM cont GROUP BY cb)
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM lab)
SELECT n_docs, ka AS clusters_a, kb AS clusters_b,
       ROUND((CAST(sij AS DOUBLE)
              - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)
                / CAST(CAST(n_docs AS HUGEINT) * (n_docs - 1) // 2 AS DOUBLE))
             / NULLIF((CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE)) / 2.0
                      - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)
                        / CAST(CAST(n_docs AS HUGEINT) * (n_docs - 1) // 2 AS DOUBLE),
                      0.0), 6) AS ari
FROM sij, sa, sb, tot
"""


@query("dedup_methods_ari", oracle=_ARI_SQL, defer=True)
def dedup_methods_ari(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chance-corrected agreement (Adjusted Rand Index) between the
    MinHash/LSH and SimHash near-dup clusterings over the full corpus —
    the audit that says whether the two signature families identify the
    same duplicate structure. Oracle replays both pipelines, both
    recursive closures, and the exact pair combinatorics."""
    caches: list = []
    pa = minhash_lsh_pairs(_docs(spark, sf_dir), _caches=caches)
    pb = simhash_pairs(_docs(spark, sf_dir), _caches=caches)
    la = connected_components(pa)
    lb = connected_components(pb)
    out = clustering_ari(la, lb, _docs(spark, sf_dir)).localCheckpoint(eager=True)
    for c in caches:
        c.unpersist()
    return out
