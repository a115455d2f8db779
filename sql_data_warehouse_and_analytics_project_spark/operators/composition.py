"""Corpus-composition operators: per-source caps, percentile length
filtering, and deterministic epoch shuffling (north-star extension; the
reference, a pure T-SQL warehouse, has no corpus-budgeting surface — its
closest analog is the gold-layer TOP-N reporting at
scripts/gold/proc_load_gold.sql).

Three standard composition steps of a large-scale training-data pipeline,
each written in the shape that survives 100 TB:

- **Per-source cap** (the RefinedWeb / C4 "domain cap"): keep at most N
  documents per source so no single crawl domain dominates the mix. The
  naive shape — rank every row in a per-source window — is fine ONLY
  because Spark compiles ``row_number() <= N`` to WindowGroupLimit, which
  keeps a PARTIAL top-N per map task BEFORE the exchange: each reducer
  receives at most N rows per (source, upstream-partition), not the whole
  hot source. The plan is pinned by a test; without the pushdown a single
  viral domain would be one reducer's entire input.

- **Percentile length filter** (trim the tails of the length
  distribution): the naive shape is ``ntile(10) OVER (ORDER BY n_chars)``
  — a GLOBAL window, i.e. a single-partition sort of the corpus, the
  canonical scale-killer. The scale shape computes the decile THRESHOLDS
  as one KB-sized aggregate row, broadcasts it back, and assigns each
  row's decile with nine scalar comparisons — zero windows, zero extra
  shuffles. The registry query uses Spark's exact ``percentile`` (bitwise
  oracle parity); at 100 TB callers flip ``exact=False`` for
  ``approx_percentile`` (a mergeable sketch) with the identical plan
  shape.

- **Epoch shuffle** (deterministic global permutation per training
  epoch): trainers need a different-but-reproducible document order each
  epoch WITHOUT a global sort. Shard assignment is an md5-derived hash of
  (doc_id, epoch) — a pure row function, zero shuffles — and the
  within-shard position is a window bounded by corpus/n_shards per
  reducer (the same lane bound as sequence packing; n_shards scales with
  the corpus via ``auto_pack_buckets``). The md5 13-hex-char uniform
  (16^13 = 2^52 < 2^53, exact in a double) is the engine-portable
  determinism trick shared with ``mix_resample``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch

_SOURCE_CAP = 15  # max docs kept per source (20 sources x 25 docs in testdata)

_DECILE_PCTS = tuple(round(0.1 * i, 1) for i in range(1, 10))  # p10..p90
_KEEP_LO = 1  # keep deciles [1, 8]: drop the shortest and longest ~10%
_KEEP_HI = 8

_EPOCH = 3  # registry demo epoch
_EPOCH_SHARDS = 8

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.load(spark, sf_dir, "documents")


# --- Per-source document cap ------------------------------------------------

_SOURCE_CAP_SQL = f"""
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents
)
SELECT doc_id, source, n_chars, CAST(rk AS BIGINT) AS rank_in_source
FROM ranked
WHERE rk <= {_SOURCE_CAP}
ORDER BY source, rank_in_source
"""


def cap_per_source(
    docs: DataFrame, cap: int = _SOURCE_CAP, stratum: str = "source"
) -> DataFrame:
    """Keep the top ``cap`` documents per ``stratum`` under the
    deterministic preference order (longest first, doc_id tiebreak).
    Compiles to WindowGroupLimit — per-map-task partial top-N before the
    exchange — so a hot source never becomes one reducer's whole input
    (plan pinned in tests/test_plans.py)."""
    if cap <= 0:
        raise ValueError("cap must be positive")
    w = Window.partitionBy(stratum).orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        docs.select("doc_id", stratum, "n_chars")
        .withColumn("rank_in_source", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank_in_source") <= cap)
        .orderBy(stratum, "rank_in_source")
    )


@query("curation_source_cap", oracle=_SOURCE_CAP_SQL, defer=True)
def curation_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-cap composition step: at most 15 documents per source,
    longest-first — no crawl source dominates the training mix."""
    return cap_per_source(_docs(spark, sf_dir))


# --- Percentile length filter ----------------------------------------------

_DECILE_TERMS_SQL = " + ".join(
    f"(CASE WHEN CAST(n_chars AS DOUBLE) >= t{i} THEN 1 ELSE 0 END)"
    for i in range(1, 10)
)

_LENGTH_FILTER_SQL = f"""
WITH th AS (
  SELECT {", ".join(
      f"ROUND(quantile_cont(CAST(n_chars AS DOUBLE), {p}), 6) AS t{i}"
      for i, p in enumerate(_DECILE_PCTS, start=1)
  )}
  FROM documents
)
SELECT d.doc_id, d.n_chars,
       CAST({_DECILE_TERMS_SQL} AS BIGINT) AS decile,
       (({_DECILE_TERMS_SQL}) BETWEEN {_KEEP_LO} AND {_KEEP_HI}) AS kept
FROM documents d CROSS JOIN th
ORDER BY d.doc_id
"""


def length_decile_filter(
    docs: DataFrame,
    keep_lo: int = _KEEP_LO,
    keep_hi: int = _KEEP_HI,
    exact: bool = True,
) -> DataFrame:
    """(doc_id, n_chars, decile, kept): each document's length decile
    (0–9, the count of decile thresholds at or below it) and whether it
    survives the tail trim. Thresholds are ONE aggregate row broadcast
    back — never a global ntile window (see module note). ``exact=True``
    uses Spark's exact ``percentile`` for bitwise oracle parity;
    ``exact=False`` swaps in the mergeable ``approx_percentile`` sketch
    with the identical plan shape for 100 TB runs. Thresholds round to
    6 dp on both engines before comparison so a last-ulp interpolation
    difference cannot flip an integer length across a boundary."""
    nc = F.col("n_chars").cast("double")
    pfn = F.percentile if exact else F.percentile_approx
    th = F.broadcast(
        docs.agg(
            *[
                F.round(pfn(nc, F.lit(p)), 6).alias(f"t{i}")
                for i, p in enumerate(_DECILE_PCTS, start=1)
            ]
        )
    )
    decile_terms: Column = sum(
        F.when(nc >= F.col(f"t{i}"), 1).otherwise(0) for i in range(1, 10)
    )
    return (
        docs.select("doc_id", "n_chars")
        .crossJoin(th)
        .select(
            "doc_id",
            "n_chars",
            decile_terms.cast("bigint").alias("decile"),
            decile_terms.between(keep_lo, keep_hi).alias("kept"),
        )
        .orderBy("doc_id")
    )


@query("quality_length_decile", oracle=_LENGTH_FILTER_SQL, defer=True)
def quality_length_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-distribution tail trim: per-document decile assignment via
    broadcast thresholds; drops the shortest and longest ~10%."""
    return length_decile_filter(_docs(spark, sf_dir))


# --- Deterministic epoch shuffle -------------------------------------------

_EPOCH_SQL = f"""
WITH keyed AS (
  SELECT doc_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{_EPOCH}'), 1, 13))::BIGINT AS h
  FROM documents
)
SELECT doc_id,
       CAST({_EPOCH} AS BIGINT) AS epoch,
       CAST(h % {_EPOCH_SHARDS} AS BIGINT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY h % {_EPOCH_SHARDS}
                               ORDER BY h, doc_id) AS BIGINT) AS pos
FROM keyed
ORDER BY shard, pos
"""


def epoch_shuffle(
    docs: DataFrame, epoch: int, n_shards: int = _EPOCH_SHARDS
) -> DataFrame:
    """(doc_id, epoch, shard, pos): a deterministic pseudo-random
    permutation of the corpus for training epoch ``epoch`` — different
    per epoch, bit-identical on re-run, engine-portable. Shard is a pure
    hash row function (zero shuffles); pos is a per-shard window whose
    reducer input is bounded by corpus/n_shards, so n_shards (use
    ``packing.auto_pack_buckets`` at scale) is the knob that keeps the
    sort local — there is never a global order-by."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f":{epoch}"))), 1, 13
        ),
        16,
        10,
    ).cast("bigint")
    keyed = docs.select("doc_id", h.alias("h"))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        keyed.withColumn("shard", (F.col("h") % n_shards).cast("bigint"))
        .select(
            "doc_id",
            F.lit(epoch).cast("bigint").alias("epoch"),
            "shard",
            F.row_number().over(w).cast("bigint").alias("pos"),
            "h",
        )
        .drop("h")
        .orderBy("shard", "pos")
    )


@query("training_epoch_shuffle", oracle=_EPOCH_SQL, defer=True)
def training_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-3 deterministic shuffle of the documents corpus into 8
    shards — the reproducible data-order a trainer replays per epoch."""
    return epoch_shuffle(_docs(spark, sf_dir), epoch=_EPOCH)


# --- Stratified evaluation sample ------------------------------------------

_EVAL_PER_STRATUM = 20  # docs sampled per language

_STRAT_SAMPLE_SQL = f"""
WITH ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
)
SELECT doc_id, lang, CAST(rk AS BIGINT) AS rank_in_stratum
FROM ranked
WHERE rk <= {_EVAL_PER_STRATUM}
ORDER BY lang, rank_in_stratum
"""


def stratified_sample(
    docs: DataFrame, per_stratum: int = _EVAL_PER_STRATUM, stratum: str = "lang"
) -> DataFrame:
    """Exactly ``per_stratum`` documents per ``stratum`` (fewer if the
    stratum is smaller), chosen by md5 hash order — a deterministic,
    engine-portable simple random sample per group, the balanced draw an
    eval or annotation batch needs regardless of corpus skew. Same
    WindowGroupLimit shape as the source cap: every map task pre-trims its
    slice of each stratum to ``per_stratum`` rows before the exchange, so
    a dominant language never concentrates on one reducer."""
    if per_stratum <= 0:
        raise ValueError("per_stratum must be positive")
    w = Window.partitionBy(stratum).orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    return (
        docs.select("doc_id", stratum)
        .withColumn("rank_in_stratum", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank_in_stratum") <= per_stratum)
        .orderBy(stratum, "rank_in_stratum")
    )


@query("eval_stratified_sample", oracle=_STRAT_SAMPLE_SQL, defer=True)
def eval_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-balanced evaluation draw: 20 deterministic docs per
    language, independent of how skewed the corpus mix is."""
    return stratified_sample(_docs(spark, sf_dir))


# --- weighted priority sampling (Efraimidis–Spirakis, r12) -------------------
#
# Weight-proportional sampling WITHOUT replacement as a pure top-k: each
# item draws an exponential clock -ln(u)/w from its own md5 uniform and
# the k smallest clocks are the sample (A-ExpJ of Efraimidis & Spirakis
# 2006, batch form). Inclusion probability is exactly weight-proportional
# for k=1 and near-proportional for k << n — the sampler behind weighted
# corpus mixing when quotas must be drawn, not computed.
#
# Scale shape: one narrow projection (hash + ln) and ONE TakeOrderedAndProject
# top-k — each map task keeps its local k smallest clocks, the driver merges
# #partitions·k rows; no global sort, no shuffle of the corpus. The md5
# uniform is salted so independent draws replay deterministically; the
# clock is ROUNDED to 9 dp before ranking so a cross-engine last-ulp ln
# difference cannot flip the cut (ties break on doc_id).

_WSAMPLE_K = 50
_U_DENOM = float((1 << 52) + 1)  # u = (h+1)/(2^52+1) in (0, 1]


def weighted_priority_sample(
    docs: DataFrame,
    k: int = _WSAMPLE_K,
    weight: Column | None = None,
    salt: str = "wsamp",
) -> DataFrame:
    """(doc_id, n_chars, priority): the ``k`` documents with the smallest
    salted exponential clocks -ln(u)/weight — a deterministic
    weight-proportional draw. ``weight`` defaults to character count."""
    from .dedup import _md5_long

    w = (weight if weight is not None else F.length("text")).cast("bigint")
    h = _md5_long(
        F.concat(F.lit(f"{salt}:"), F.col("doc_id").cast("string")), 13
    )
    u = (h.cast("double") + F.lit(1.0)) / F.lit(_U_DENOM)
    keyed = docs.filter(w > 0).select(
        "doc_id",
        w.alias("n_chars"),
        F.round(-F.log(u) / w.cast("double"), 9).alias("priority"),
    )
    return keyed.orderBy("priority", "doc_id").limit(k)


def _wsample_sql(k: int = _WSAMPLE_K, salt: str = "wsamp") -> str:
    h = f"('0x' || substr(md5('{salt}:' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT"
    return f"""
WITH w AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
  FROM documents WHERE length(text) > 0
),
keyed AS (
  SELECT doc_id, n_chars,
         ROUND(-ln(({h} + 1.0) / {_U_DENOM!r}) / CAST(n_chars AS DOUBLE), 9)
           AS priority
  FROM w
)
SELECT doc_id, n_chars, priority
FROM keyed
ORDER BY priority, doc_id
LIMIT {k}
"""


@query("sample_weighted_chars", oracle=_wsample_sql(), defer=True)
def sample_weighted_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-weighted document draw (k=50) via Efraimidis–Spirakis
    exponential clocks — long documents proportionally likelier, the
    whole draw a deterministic top-k with no corpus shuffle."""
    return weighted_priority_sample(_docs(spark, sf_dir))


_WSAMPLE_PER_K = 10


def weighted_sample_per_stratum(
    docs: DataFrame,
    k: int = _WSAMPLE_PER_K,
    stratum: str = "lang",
    salt: str = "wstrat",
) -> DataFrame:
    """(stratum, doc_id, n_chars, priority): the ``k`` smallest exponential
    clocks PER STRATUM — a balanced-but-weighted draw (every language
    represented, long documents proportionally likelier within each). The
    per-group cut is ``row_number() <= k`` over the clock order, which
    Catalyst pushes down as WindowGroupLimit — map tasks pre-trim to k
    rows per stratum before the shuffle, the grouped analog of the global
    sampler's TakeOrderedAndProject."""
    from .dedup import _md5_long

    w = F.length("text").cast("bigint")
    h = _md5_long(
        F.concat(F.lit(f"{salt}:"), F.col("doc_id").cast("string")), 13
    )
    u = (h.cast("double") + F.lit(1.0)) / F.lit(_U_DENOM)
    keyed = docs.filter(w > 0).select(
        F.col(stratum).alias("stratum"),
        "doc_id",
        w.alias("n_chars"),
        F.round(-F.log(u) / w.cast("double"), 9).alias("priority"),
    )
    win = Window.partitionBy("stratum").orderBy("priority", "doc_id")
    return (
        keyed.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
        .orderBy("stratum", "priority", "doc_id")
    )


def _wstrat_sql(k: int = _WSAMPLE_PER_K, salt: str = "wstrat") -> str:
    h = f"('0x' || substr(md5('{salt}:' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT"
    return f"""
WITH keyed AS (
  SELECT lang AS stratum, doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         ROUND(-ln(({h} + 1.0) / {_U_DENOM!r})
               / CAST(length(text) AS DOUBLE), 9) AS priority
  FROM documents WHERE length(text) > 0
)
SELECT stratum, doc_id, n_chars, priority FROM (
  SELECT *, row_number() OVER (PARTITION BY stratum
                               ORDER BY priority, doc_id) AS rn
  FROM keyed
) WHERE rn <= {k}
ORDER BY stratum, priority, doc_id
"""


@query("sample_weighted_per_lang", oracle=_wstrat_sql(), defer=True)
def sample_weighted_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-weighted draw of 10 documents PER LANGUAGE — the
    balanced-but-weighted eval sample completing the family (uniform
    hash split, stratified uniform, weighted global, weighted
    per-stratum)."""
    return weighted_sample_per_stratum(_docs(spark, sf_dir))


# --- corpus mass concentration (r13) -------------------------------------------
#
# Shard-planning skew report: what fraction of the character mass do the
# LARGEST ceil(n/10) documents hold, per source? A source where one
# decile owns most of the bytes packs badly (stragglers) and deserves
# chunking before export. Exact: per-source rank by (chars DESC, doc_id),
# top-decile membership rank <= ceil(n/10) = (n+9)//10 in integers, both
# char sums exact bigints, ONE 6-dp division. One partial-agg projection
# + one source-partitioned rank window bounded by docs.


def mass_concentration(docs: DataFrame, group: str = "source") -> DataFrame:
    """(source, n_docs, chars_total, chars_top_decile, top_decile_share)."""
    from pyspark.sql import Window

    lens = docs.select(group, "doc_id", F.length("text").cast("bigint").alias("chars"))
    w = Window.partitionBy(group).orderBy(F.desc("chars"), F.asc("doc_id"))
    wg = Window.partitionBy(group)
    ranked = lens.select(
        group,
        "chars",
        F.row_number().over(w).cast("bigint").alias("rk"),
        F.count(F.lit(1)).over(wg).cast("bigint").alias("n"),
    )
    top = F.when(F.col("rk") <= F.floor((F.col("n") + 9) / 10), F.col("chars")).otherwise(0)
    return (
        ranked.groupBy(group)
        .agg(
            F.max("n").cast("bigint").alias("n_docs"),
            F.sum("chars").cast("bigint").alias("chars_total"),
            F.sum(top).cast("bigint").alias("chars_top_decile"),
        )
        .select(
            group,
            "n_docs",
            "chars_total",
            "chars_top_decile",
            F.round(
                F.col("chars_top_decile").cast("double") / F.col("chars_total").cast("double"),
                6,
            ).alias("top_decile_share"),
        )
        .orderBy(group)
    )


_MASS_SQL = """
WITH lens AS (
  SELECT source, doc_id, CAST(length(text) AS BIGINT) AS chars FROM documents
),
ranked AS (
  SELECT source, chars,
         CAST(row_number() OVER (PARTITION BY source ORDER BY chars DESC, doc_id) AS BIGINT) AS rk,
         CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
  FROM lens
)
SELECT source,
       CAST(MAX(n) AS BIGINT) AS n_docs,
       CAST(SUM(chars) AS BIGINT) AS chars_total,
       CAST(SUM(CASE WHEN rk <= (n + 9) // 10 THEN chars ELSE 0 END) AS BIGINT)
         AS chars_top_decile,
       ROUND(CAST(SUM(CASE WHEN rk <= (n + 9) // 10 THEN chars ELSE 0 END) AS DOUBLE)
             / CAST(SUM(chars) AS DOUBLE), 6) AS top_decile_share
FROM ranked
GROUP BY source
ORDER BY source
"""


@query("corpus_mass_concentration", oracle=_MASS_SQL, defer=True)
def corpus_mass_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source top-decile character-mass share — the export-shard skew
    report (a decile owning most bytes means stragglers; chunk first)."""
    return mass_concentration(_docs(spark, sf_dir))
