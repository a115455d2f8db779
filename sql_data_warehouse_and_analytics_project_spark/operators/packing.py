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
_PACK_BUCKETS = 32  # independent packing lanes (scale with the cluster)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.load(spark, sf_dir, "documents")


_PACK_SQL = f"""
WITH counted AS (
  SELECT doc_id,
         {_SQL_BPE_COUNT} AS n_bpe_tokens,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % {_PACK_BUCKETS} AS bucket
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
    docs: DataFrame, budget: int = _PACK_BUDGET, n_buckets: int = _PACK_BUCKETS
) -> DataFrame:
    """(doc_id, bucket, n_bpe_tokens, chunk_id) chunk assignment — see the
    module docstring for the hash-bucketed packing shape. One narrow shuffle
    (hash-partition by bucket for the running sum); the window's sequential
    span is bounded by corpus/n_buckets and lanes are md5-uniform, so the
    plan has no hot key at any corpus size."""
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
