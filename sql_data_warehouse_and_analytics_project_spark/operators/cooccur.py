"""PMI co-occurrence mining — collocation statistics over a token window.

The corpus-analytics tool for finding word associations (collocations,
multi-word expressions, embedding-training diagnostics): pointwise
mutual information of token pairs that co-occur within a ±2 window,
PMI(a,b) = ln( P(a,b) / (P(a)·P(b)) ) with the pair distribution taken
over window co-occurrences and the unigram distribution over tokens.

Scale shape: pair extraction is a per-row array expression (two shifted
zips — no self-join, no window function), then three partial-aggregating
groupBys (pairs, unigrams, totals) and two 1:1 hash joins of the pair
table against the unigram counts. Everything shards by token/pair hash
at 100 TB; a hot pair is one count row, not a row explosion.

Cross-engine float discipline: every count is an exact integer, the PMI
argument is assembled with ONE fixed parenthesization in both engines
(float multiplication is not associative), and ln of bit-identical
arguments matches across JVM/DuckDB (the nb.py precedent); 6dp round on
the output surface. Pairs are canonicalized (least, greatest) so (a,b)
and (b,a) pool. No reference counterpart — LLM-pipeline extension
(Church & Hanks 1990, public).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch
from .text import SQL_TOKENS, tokens_col

_PMI_MIN_PAIR = 5  # report pairs seen at least this often


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.load(spark, sf_dir, "documents")


def window_pairs(docs: DataFrame) -> DataFrame:
    """(a, b) one row per window co-occurrence (distance 1 or 2, forward
    scan), canonicalized a <= b — built per row from two shifted zips."""
    toks = F.transform(tokens_col(F.col("text")), lambda t: F.lower(t))

    def shifted(t, d):
        n = F.size(t)
        return F.zip_with(
            F.slice(t, 1, F.greatest(n - d, F.lit(0))),
            F.slice(t, 1 + d, F.greatest(n - d, F.lit(0))),
            lambda x, y: F.struct(
                F.least(x, y).alias("a"), F.greatest(x, y).alias("b")
            ),
        )

    pairs = F.concat(shifted(toks, 1), shifted(toks, 2))
    return docs.select(F.explode(pairs).alias("p")).select("p.a", "p.b")


def pmi_pairs(docs: DataFrame, min_pair: int = _PMI_MIN_PAIR) -> DataFrame:
    """(a, b, n_pair, pmi) for canonical pairs with count >= min_pair,
    ordered by (a, b)."""
    pairs = window_pairs(docs).groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pair")
    )
    toks = F.transform(tokens_col(F.col("text")), lambda t: F.lower(t))
    uni = (
        docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tok"))
    )
    totals = uni.agg(
        F.sum("n_tok").cast("bigint").alias("n_uni")
    ).crossJoin(
        pairs.agg(F.sum("n_pair").cast("bigint").alias("n_pairs_total"))
    )
    # ONE parenthesization, mirrored in the oracle:
    # ln( ((n_pair * n_uni) * n_uni) / (((n_pairs_total * n_a) * n_b)) )
    num = (
        F.col("n_pair").cast("double")
        * F.col("n_uni").cast("double")
        * F.col("n_uni").cast("double")
    )
    den = (
        F.col("n_pairs_total").cast("double")
        * F.col("n_a").cast("double")
        * F.col("n_b").cast("double")
    )
    return (
        pairs.filter(F.col("n_pair") >= min_pair)
        .join(uni.select(F.col("tok").alias("a"), F.col("n_tok").alias("n_a")), "a")
        .join(uni.select(F.col("tok").alias("b"), F.col("n_tok").alias("n_b")), "b")
        .crossJoin(F.broadcast(totals))
        .select(
            "a",
            "b",
            "n_pair",
            F.round(F.log(num / den), 6).alias("pmi"),
        )
        .orderBy("a", "b")
    )


_PMI_SQL = f"""
WITH toks AS (
  SELECT list_transform({SQL_TOKENS}, t -> lower(t)) AS t FROM documents
),
pair_rows AS (
  SELECT least(x, y) AS a, greatest(x, y) AS b
  FROM (
    SELECT UNNEST(list_slice(t, 1, len(t) - 1)) AS x,
           UNNEST(list_slice(t, 2, len(t))) AS y
    FROM toks
    UNION ALL
    SELECT UNNEST(list_slice(t, 1, len(t) - 2)) AS x,
           UNNEST(list_slice(t, 3, len(t))) AS y
    FROM toks
  )
),
pairs AS (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_pair FROM pair_rows GROUP BY a, b
),
uni AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_tok
  FROM (SELECT UNNEST(t) AS tok FROM toks) GROUP BY tok
),
tot AS (
  SELECT (SELECT CAST(SUM(n_tok) AS BIGINT) FROM uni) AS n_uni,
         (SELECT CAST(SUM(n_pair) AS BIGINT) FROM pairs) AS n_pairs_total
)
SELECT p.a, p.b, p.n_pair,
       ROUND(ln((CAST(p.n_pair AS DOUBLE) * CAST(t.n_uni AS DOUBLE)
                 * CAST(t.n_uni AS DOUBLE))
                / (CAST(t.n_pairs_total AS DOUBLE) * CAST(ua.n_tok AS DOUBLE)
                   * CAST(ub.n_tok AS DOUBLE))), 6) AS pmi
FROM pairs p
JOIN uni ua ON p.a = ua.tok
JOIN uni ub ON p.b = ub.tok
CROSS JOIN tot t
WHERE p.n_pair >= {_PMI_MIN_PAIR}
ORDER BY p.a, p.b
"""


@query("text_pmi_cooccur", oracle=_PMI_SQL, defer=True)
def text_pmi_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of token pairs co-occurring within a
    ±2 window — collocation mining over the documents corpus."""
    return pmi_pairs(_docs(spark, sf_dir))
