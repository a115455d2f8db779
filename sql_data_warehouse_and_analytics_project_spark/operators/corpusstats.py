"""Corpus-distribution statistics: Zipf rank-frequency fit + Simpson
lexical diversity.

Two standard single-number summaries of a text corpus's token
distribution that curation dashboards track per snapshot:

- **Zipf fit** (Zipf 1949; the rank-frequency power law): OLS of
  ln(frequency) on ln(rank) over the top-R terms. The fitted exponent
  (~1 for natural language) and its R² are the cheapest detector of
  machine-generated or template-heavy corpora, whose rank curves bend
  away from the law — a drifting exponent between crawl snapshots is a
  composition-change alarm.
- **Simpson diversity** (Simpson 1949): λ = Σ nᵢ(nᵢ−1) / (N(N−1)), the
  probability two tokens drawn without replacement are the same type;
  1−λ is the diversity, 1/λ the effective vocabulary size. Unlike
  type-token ratio it is length-unbiased, which is what makes it
  comparable across sources of different sizes.

Engine discipline (the house rules): term counts are ONE partial-
aggregating groupBy over lowercased whitespace tokens (`text.tokens_col`
/ `text.SQL_TOKENS` — the single shared tokenizer); Simpson is exact
integers end-to-end (nᵢ(nᵢ−1) products in decimal(38,0)/HUGEINT, doubles
only in the final ratio); the Zipf OLS runs over the top-R table (an
ordered LIMIT — TakeOrderedAndProject, never a global sort) with every
per-term ln() contribution quantized to decimal(18,6) BEFORE the sums
(the text-tier logprob convention: exact order-independent decimal
addition; JVM-vs-DuckDB libm differs ≤1 ULP, invisible at 6 dp). The
rank window runs over ≤R rows by construction (top-k bound — the
plan-audit class every bounded window in this repo documents).

No reference counterpart — corpus-curation extension (public methods).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch
from .text import SQL_TOKENS, tokens_col

_ZIPF_TOP_R = 1000  # fit over the top-R rank-frequency points


def _term_counts(docs: DataFrame) -> DataFrame:
    """(term, tf): exact corpus-wide counts of lowercased tokens."""
    return (
        docs.select(F.explode(tokens_col(F.col("text"))).alias("term"))
        .select(F.lower("term").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )


def zipf_fit(docs: DataFrame, top_r: int = _ZIPF_TOP_R) -> DataFrame:
    """One row (n_terms_fit, total_tokens, top_tf, zipf_exponent, r2):
    OLS of ln(tf) on ln(rank) over the top-R terms (rank by tf DESC,
    term ASC — deterministic)."""
    counts = _term_counts(docs)
    top = counts.orderBy(F.col("tf").desc(), F.col("term")).limit(top_r)
    w = Window.orderBy(F.col("tf").desc(), F.col("term"))  # ≤ top_r rows
    pts = top.select(
        "tf", F.row_number().over(w).cast("bigint").alias("rank")
    ).select(
        "tf",
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("tf").cast("double")).alias("y"),
    )
    q = lambda c: c.cast("decimal(18,6)")  # noqa: E731
    agg = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("r"),
        F.sum(q(F.col("x"))).alias("sx"),
        F.sum(q(F.col("y"))).alias("sy"),
        F.sum(q(F.col("x") * F.col("y"))).alias("sxy"),
        F.sum(q(F.col("x") * F.col("x"))).alias("sxx"),
        F.sum(q(F.col("y") * F.col("y"))).alias("syy"),
        F.max("tf").cast("bigint").alias("top_tf"),
    )
    tot = F.broadcast(
        counts.agg(F.sum("tf").cast("bigint").alias("total_tokens"))
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    n = d("r")
    cov = n * d("sxy") - d("sx") * d("sy")
    varx = n * d("sxx") - d("sx") * d("sx")
    vary = n * d("syy") - d("sy") * d("sy")
    slope = cov / F.nullif(varx, F.lit(0.0))
    r2 = (cov * cov) / F.nullif(varx * vary, F.lit(0.0))
    return agg.crossJoin(tot).select(
        F.col("r").alias("n_terms_fit"),
        "total_tokens",
        "top_tf",
        F.round(-slope, 6).alias("zipf_exponent"),
        F.round(r2, 6).alias("r2"),
    )


_ZIPF_SQL = f"""
WITH counts AS (
  SELECT lower(t) AS term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT UNNEST({SQL_TOKENS}) AS t FROM documents)
  GROUP BY lower(t)
),
top AS (
  SELECT tf, row_number() OVER (ORDER BY tf DESC, term) AS rank
  FROM counts ORDER BY tf DESC, term LIMIT {_ZIPF_TOP_R}
),
pts AS (
  SELECT tf, ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(tf AS DOUBLE)) AS y FROM top
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS r,
         SUM(CAST(x AS DECIMAL(18,6))) AS sx,
         SUM(CAST(y AS DECIMAL(18,6))) AS sy,
         SUM(CAST(x * y AS DECIMAL(18,6))) AS sxy,
         SUM(CAST(x * x AS DECIMAL(18,6))) AS sxx,
         SUM(CAST(y * y AS DECIMAL(18,6))) AS syy,
         CAST(MAX(tf) AS BIGINT) AS top_tf
  FROM pts
),
tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS total_tokens FROM counts)
SELECT r AS n_terms_fit, total_tokens, top_tf,
       ROUND(-((CAST(r AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / NULLIF(CAST(r AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0)), 6) AS zipf_exponent,
       ROUND(((CAST(r AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              * (CAST(r AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
             / NULLIF((CAST(r AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * (CAST(r AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0.0), 6) AS r2
FROM agg, tot
"""


@query("text_zipf_fit", oracle=_ZIPF_SQL, defer=True)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency OLS over the top-1000 terms — the
    composition-drift alarm beside the JSD/vocab-overlap keys. DuckDB
    replays the token counts, the deterministic top-R rank, and the
    quantized-term OLS."""
    return zipf_fit(tpch.load(spark, sf_dir, "documents"))


def simpson_diversity(docs: DataFrame) -> DataFrame:
    """(source, n_tokens, n_terms, simpson_lambda, diversity,
    effective_vocab) per source — exact-integer Simpson concentration
    of the token distribution."""
    counts = (
        docs.select(
            "source", F.explode(tokens_col(F.col("text"))).alias("term")
        )
        .select("source", F.lower("term").alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = counts.groupBy("source").agg(
        F.sum("tf").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.sum(dec("tf") * (F.col("tf") - F.lit(1))).alias("rep_pairs"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    lam = d("rep_pairs") / F.nullif(
        d("n_tokens") * (d("n_tokens") - F.lit(1.0)), F.lit(0.0)
    )
    return agg.select(
        "source",
        "n_tokens",
        "n_terms",
        F.round(lam, 6).alias("simpson_lambda"),
        F.round(F.lit(1.0) - lam, 6).alias("diversity"),
        F.round(F.lit(1.0) / F.nullif(lam, F.lit(0.0)), 6).alias("effective_vocab"),
    ).orderBy("source")


_SIMPSON_SQL = f"""
WITH counts AS (
  SELECT source, lower(t) AS term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT source, UNNEST({SQL_TOKENS}) AS t FROM documents)
  GROUP BY source, lower(t)
),
agg AS (
  SELECT source,
         CAST(SUM(tf) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_terms,
         SUM(CAST(tf AS HUGEINT) * (tf - 1)) AS rep_pairs
  FROM counts GROUP BY source
)
SELECT source, n_tokens, n_terms,
       ROUND(CAST(rep_pairs AS DOUBLE)
             / NULLIF(CAST(n_tokens AS DOUBLE) * (CAST(n_tokens AS DOUBLE) - 1.0), 0.0), 6) AS simpson_lambda,
       ROUND(1.0 - CAST(rep_pairs AS DOUBLE)
             / NULLIF(CAST(n_tokens AS DOUBLE) * (CAST(n_tokens AS DOUBLE) - 1.0), 0.0), 6) AS diversity,
       ROUND(1.0 / NULLIF(CAST(rep_pairs AS DOUBLE)
             / NULLIF(CAST(n_tokens AS DOUBLE) * (CAST(n_tokens AS DOUBLE) - 1.0), 0.0), 0.0), 6) AS effective_vocab
FROM agg
ORDER BY source
"""


@query("text_simpson_diversity", oracle=_SIMPSON_SQL, defer=True)
def text_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-unbiased Simpson lexical diversity per source — the
    repetition/boilerplate detector the type-token ratio can't give
    across different-sized sources. Exact integers end-to-end; DuckDB
    replays the token counts and both rollups."""
    return simpson_diversity(tpch.load(spark, sf_dir, "documents"))
