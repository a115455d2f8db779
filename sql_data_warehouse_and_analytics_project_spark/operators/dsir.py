"""DSIR-style importance resampling for pretraining-data selection (r11).

Data Selection via Importance Resampling (Xie et al. 2023, NeurIPS —
public method): pick raw-corpus documents that *look like* a target
domain by (1) featurizing every document as hashed n-gram counts,
(2) fitting bag-of-hashed-ngram models on the target slice (p) and the
raw corpus (q), (3) weighting each document by its log importance ratio
``log w(x) = Σ_features [ln p̂(b) − ln q̂(b)]``, and (4) drawing a
without-replacement sample of size k via the Gumbel-top-k trick
(``key_i = log w_i + g_i``, ``g_i = −ln(−ln(u_i))``).

Why this engine-shape scales to 100 TB:

- **The model is O(B), never O(vocab).** Features hash into ``B``
  buckets (md5-derived, engine-portable), so the two count tables are
  bounded by the constant ``B`` regardless of corpus size — two narrow
  partial-aggregating groupBys, then ONE broadcast row. No driver
  collect anywhere (same collect-free map-frame strategy as the bigram
  LM, `text.py:bigram_logprob`).
- **Scoring is a pure projection.** ``log w`` folds the per-document
  hashed-feature array against the broadcast λ-map in FEATURE ORDER
  (unigrams left→right, then bigrams left→right) — zero shuffles on
  top of the corpus scan, partition-order-exact floats.
- **Selection is top-k, not a sort.** The Gumbel key is a deterministic
  md5-13-hex uniform of doc_id (16^13 = 2^52 < 2^53, exact in a
  double — the engine's shared determinism trick), and the k cut
  compiles to TakeOrderedAndProject: per-partition partial top-k, one
  k-row merge, no global sort at any corpus size.

Cross-engine float discipline: λ is computed as ``ln(a) − ln(b)`` with
the SAME smoothing expression in both engines; JVM libm vs DuckDB libm
differ ≤1 ULP per term — invisible at the defensive 6-dp round on both
output columns (the bigram-LM precedent); the selection key is rounded
to 6 dp BEFORE the ORDER BY with a doc_id tiebreak, so the k cut is
identical in both engines.

No reference counterpart (the reference is a T-SQL star-schema
warehouse, `/root/reference/scripts`); this is a beyond-reference
LLM-pipeline operator per the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch
from .text import SQL_TOKENS, tokens_col

_DSIR_BUCKETS = 512  # hashed-feature buckets B (model size, corpus-independent)
_DSIR_ALPHA = 0.5  # add-α smoothing for both bucket models
_DSIR_K = 100  # selected sample size
_DSIR_TARGET_LANG = "en"  # registry demo target domain: the English slice
_SEP = "\x1f"  # unit separator for bigram keys — cannot occur inside tokens

_U52 = float(1 << 52)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.load(spark, sf_dir, "documents")


def hashed_ngram_features(docs: DataFrame, buckets: int = _DSIR_BUCKETS) -> DataFrame:
    """(doc_id, fb): per-document hashed n-gram feature-bucket array —
    lowered unigrams then bigrams, each md5-13-hex-hashed mod ``buckets``,
    in document order. Pure projection (no explode, no shuffle); docs with
    zero tokens are dropped (no features to score)."""
    from .dedup import _spread_rows

    docs = _spread_rows(docs)  # r12: row-wise-heavy hashing projection
    toks = F.transform(tokens_col(F.col("text")), lambda x: F.lower(x))
    t = F.col("_t")

    def _bucket(s: Column) -> Column:
        return F.pmod(
            F.conv(F.substring(F.md5(s), 1, 13), 16, 10).cast("bigint"),
            F.lit(buckets),
        )

    uni = F.transform(t, _bucket)
    bi = F.transform(
        F.slice(t, 1, F.size(t) - 1),
        lambda x, i: _bucket(F.concat_ws(_SEP, x, F.element_at(t, i + 2))),
    )
    return (
        docs.select("doc_id", "lang", toks.alias("_t"))
        .filter(F.size("_t") >= 1)
        .select("doc_id", "lang", F.concat(uni, bi).alias("fb"))
    )


def dsir_select(
    docs: DataFrame,
    target: Column | None = None,
    k: int = _DSIR_K,
    buckets: int = _DSIR_BUCKETS,
    alpha: float = _DSIR_ALPHA,
) -> DataFrame:
    """(doc_id, n_feats, logw, select_key) — the k raw documents drawn by
    Gumbel-top-k under hashed-ngram importance weights toward ``target``
    (a boolean Column over the docs frame; defaults to
    ``lang = 'en'``). See the module note for the scale shape."""
    if target is None:
        target = F.col("lang") == _DSIR_TARGET_LANG
    feats = docs.select("doc_id", "lang", "text").transform(
        lambda d: hashed_ngram_features(d, buckets)
    )
    exploded = feats.select("lang", F.explode("fb").alias("b"))
    rawc = exploded.groupBy("b").agg(F.count(F.lit(1)).cast("double").alias("cq"))
    # target slice counts: same exploded frame, filtered — Catalyst shares
    # the scan; both aggs are B-bounded (≤ `buckets` rows)
    tgtc = (
        feats.filter(target)
        .select(F.explode("fb").alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("double").alias("ct"))
    )
    nq = exploded.agg(F.count(F.lit(1)).cast("double").alias("nq"))
    nt = (
        feats.filter(target)
        .select(F.size("fb").alias("s"))
        .agg(F.coalesce(F.sum("s").cast("double"), F.lit(0.0)).alias("nt"))
    )
    a, ab = F.lit(float(alpha)), F.lit(float(alpha) * buckets)
    lam = F.log((F.coalesce(F.col("ct"), F.lit(0.0)) + a) / (F.col("nt") + ab)) - F.log(
        (F.col("cq") + a) / (F.col("nq") + ab)
    )
    # one-row broadcast model: bucket → λ map + the unseen-bucket default
    # (global agg, so an empty corpus still yields one row, not zero)
    map_row = (
        rawc.join(tgtc, "b", "left")
        .crossJoin(F.broadcast(nq))
        .crossJoin(F.broadcast(nt))
        .select(F.struct(F.col("b"), lam.alias("lam")).alias("e"))
        .agg(F.map_from_entries(F.collect_list("e")).alias("lam_map"))
    )
    model = (
        nq.crossJoin(nt)
        .crossJoin(map_row)
        .select(
            "lam_map",
            (
                F.log(a / (F.col("nt") + ab)) - F.log(a / (F.col("nq") + ab))
            ).alias("lam0"),
        )
    )
    logw = F.aggregate(
        F.col("fb"),
        F.lit(0.0),
        lambda acc, x: acc + F.coalesce(F.element_at(F.col("lam_map"), x), F.col("lam0")),
    )
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10).cast(
        "bigint"
    ) / F.lit(_U52)
    gumbel = -F.log(-F.log(u))
    return (
        feats.crossJoin(F.broadcast(model))
        .select(
            "doc_id",
            F.size("fb").cast("bigint").alias("n_feats"),
            logw.alias("_lw"),
            gumbel.alias("_g"),
        )
        .select(
            "doc_id",
            "n_feats",
            F.round(F.col("_lw"), 6).alias("logw"),
            F.round(F.col("_lw") + F.col("_g"), 6).alias("select_key"),
        )
        .orderBy(F.desc("select_key"), F.asc("doc_id"))
        .limit(k)
    )


_B, _A = _DSIR_BUCKETS, _DSIR_ALPHA
_DSIR_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, list_transform({SQL_TOKENS}, x -> lower(x)) AS t FROM documents
),
feats AS (
  SELECT doc_id, lang,
         list_concat(
           list_transform(t, x ->
             ('0x' || substr(md5(x), 1, 13))::BIGINT % {_B}),
           list_transform(range(1, len(t)), i ->
             ('0x' || substr(md5(t[i] || chr(31) || t[i + 1]), 1, 13))::BIGINT % {_B})
         ) AS fb
  FROM toks
  WHERE len(t) >= 1
),
rawc AS (
  SELECT b, CAST(COUNT(*) AS DOUBLE) AS cq
  FROM (SELECT UNNEST(fb) AS b FROM feats) GROUP BY b
),
tgtc AS (
  SELECT b, CAST(COUNT(*) AS DOUBLE) AS ct
  FROM (SELECT UNNEST(fb) AS b FROM feats WHERE lang = '{_DSIR_TARGET_LANG}') GROUP BY b
),
tot AS (
  SELECT (SELECT CAST(COALESCE(SUM(len(fb)), 0) AS DOUBLE) FROM feats) AS nq,
         (SELECT CAST(COALESCE(SUM(len(fb)), 0) AS DOUBLE)
          FROM feats WHERE lang = '{_DSIR_TARGET_LANG}') AS nt
),
model AS (
  SELECT
    (SELECT map_from_entries(list(
        (r.b, ln((COALESCE(t.ct, 0) + {_A}) / (nt + {_A} * {_B}))
            - ln((r.cq + {_A}) / (nq + {_A} * {_B}))) ORDER BY r.b))
     FROM rawc r LEFT JOIN tgtc t ON r.b = t.b CROSS JOIN tot) AS lam,
    ln({_A} / (nt + {_A} * {_B})) - ln({_A} / (nq + {_A} * {_B})) AS lam0
  FROM tot
),
scored AS (
  SELECT doc_id,
         CAST(len(fb) AS BIGINT) AS n_feats,
         list_reduce(list_transform(fb, x -> coalesce(lam[x][1], lam0)),
                     (a, b) -> a + b) AS lw,
         -ln(-ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT)
                 / {_U52!r})) AS g
  FROM feats CROSS JOIN model
)
SELECT doc_id, n_feats,
       ROUND(lw, 6) AS logw,
       ROUND(lw + g, 6) AS select_key
FROM scored
ORDER BY select_key DESC, doc_id
LIMIT {_DSIR_K}
"""


@query("curation_dsir_select", oracle=_DSIR_SQL)
def curation_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection demo: the 100 documents Gumbel-top-k-sampled toward
    the English slice under hashed unigram+bigram importance weights."""
    return dsir_select(_docs(spark, sf_dir))
