"""Global corpus data card: one (metric, value) row per headline statistic.

The one-frame summary a training-data pipeline publishes beside the
per-language profile (`corpus_profile_by_lang`): corpus size, the
sketch-trio readings (HLL vocabulary estimate, fixed-bin length
quantiles), and the Zipf naturalness fit — every value produced by the
same engine-reproducible operators that carry their own oracles, so the
COMPOSED card hash-matches DuckDB too.

Scale shape: each contributing statistic is already sketch-sized or
one-aggregate (see the source modules); the card is a unionByName of
KB-sized frames — composition adds no new shuffle over corpus rows.

ref: extension beyond the reference (its docs/data_catalog.md is a
hand-written catalog; this generates the numbers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch


def _metric(df: DataFrame, metric: str, value_col) -> DataFrame:
    return df.select(
        F.lit(metric).alias("metric"), value_col.cast("double").alias("value")
    )


def corpus_data_card(docs: DataFrame) -> DataFrame:
    """(metric, value) global card — see the module note."""
    from .approx import hist_bins, hist_quantiles, hll_estimate, hll_registers
    from .drift import zipf_fit
    from .text import tokens_col

    base = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        F.sum(F.size(tokens_col(F.col("text")))).cast("bigint").alias("total_tokens"),
    )
    terms = docs.select(
        F.explode(F.transform(tokens_col(F.col("text")), lambda x: F.lower(x))).alias(
            "term"
        )
    )
    hll = hll_estimate(hll_registers(terms, "term"))
    zipf = zipf_fit(docs)
    lens = hist_quantiles(hist_bins(docs.select(F.length("text").alias("v")), "v"))
    frames = [
        _metric(base, "n_docs", F.col("n_docs")),
        _metric(base, "total_chars", F.col("total_chars")),
        _metric(base, "total_tokens", F.col("total_tokens")),
        _metric(
            base,
            "mean_doc_tokens",
            F.round(
                F.col("total_tokens").cast("double") / F.col("n_docs").cast("double"),
                6,
            ),
        ),
        _metric(hll, "vocab_hll_estimate", F.col("estimate")),
        _metric(zipf, "zipf_slope", F.col("slope")),
        _metric(zipf, "zipf_r2", F.col("r2")),
        _metric(
            lens.filter(F.col("q") == 0.5), "chars_p50_sketch", F.col("estimate")
        ),
        _metric(
            lens.filter(F.col("q") == 0.9), "chars_p90_sketch", F.col("estimate")
        ),
        _metric(
            lens.filter(F.col("q") == 0.99), "chars_p99_sketch", F.col("estimate")
        ),
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("metric")


def _datacard_sql() -> str:
    from .approx import _HLL_VOCAB_SQL, _HQ_DOCLEN_SQL
    from .drift import _ZIPF_SQL
    from .text import SQL_TOKENS

    return f"""
WITH base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(length(text)) AS BIGINT) AS total_chars,
         CAST(SUM(len({SQL_TOKENS})) AS BIGINT) AS total_tokens
  FROM documents
),
hll AS ({_HLL_VOCAB_SQL}),
zipf AS ({_ZIPF_SQL}),
lens AS ({_HQ_DOCLEN_SQL})
SELECT metric, value FROM (
  SELECT 'n_docs' AS metric, CAST(n_docs AS DOUBLE) AS value FROM base
  UNION ALL SELECT 'total_chars', CAST(total_chars AS DOUBLE) FROM base
  UNION ALL SELECT 'total_tokens', CAST(total_tokens AS DOUBLE) FROM base
  UNION ALL SELECT 'mean_doc_tokens',
    ROUND(CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) FROM base
  UNION ALL SELECT 'vocab_hll_estimate', CAST(estimate AS DOUBLE) FROM hll
  UNION ALL SELECT 'zipf_slope', CAST(slope AS DOUBLE) FROM zipf
  UNION ALL SELECT 'zipf_r2', CAST(r2 AS DOUBLE) FROM zipf
  UNION ALL SELECT 'chars_p50_sketch', CAST(estimate AS DOUBLE) FROM lens WHERE q = 0.5
  UNION ALL SELECT 'chars_p90_sketch', CAST(estimate AS DOUBLE) FROM lens WHERE q = 0.9
  UNION ALL SELECT 'chars_p99_sketch', CAST(estimate AS DOUBLE) FROM lens WHERE q = 0.99
)
ORDER BY metric
"""


_DATACARD_SQL = _datacard_sql()


@query("corpus_data_card", oracle=_DATACARD_SQL, defer=True)
def corpus_data_card_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The global corpus data card: size, HLL vocabulary, sketch length
    quantiles, and the Zipf naturalness fit in one (metric, value) frame
    — composed entirely from oracle-carrying operators."""
    return corpus_data_card(tpch.load(spark, sf_dir, "documents"))
