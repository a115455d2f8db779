"""Pareto-front (skyline) selection for multi-objective data curation.

Training-data selection is inherently multi-objective — you want long
documents AND lexically diverse ones AND low boilerplate, and collapsing
those into one weighted score bakes in arbitrary tradeoffs. The skyline
(Börzsönyi et al., "The Skyline Operator", ICDE 2001) sidesteps the
weighting: keep every document not STRICTLY DOMINATED by another (no
other doc is at-least-as-good on all objectives and better on one). The
front is exactly the set of optima over ALL monotone scoring functions,
so it is the right shortlist for downstream (human or model) ranking.

Objectives here (all exact integers, so the oracle replays bit-for-bit):
maximize ``n_chars`` (length), maximize ``n_distinct`` (vocabulary
breadth), minimize ``top_freq`` (the highest single-token repetition
count — the Gopher-style boilerplate smell).

Scale shape (100 TB): dominance is a theta condition, so the naive form
is an O(n²) nested loop. The distributed form is the standard two-phase
skyline: (1) LOCAL skyline inside hash buckets — an equi self-join on
the bucket key (never a cartesian) that soundly removes every point
dominated within its bucket (dominance is global, so any locally
dominated point is globally dominated); (2) GLOBAL refine over the
surviving candidates — a broadcast dominance join, quadratic only in
the candidate set, which for real quality metrics is orders of
magnitude smaller than the corpus (worst-case anti-correlated data
degrades gracefully: phase 2 input is bounded by the sum of per-bucket
skyline sizes). Both phases are pure DataFrame ops; results are
bucketing-invariant (tests pin 1-bucket == 32-bucket == oracle).

No reference counterpart — curation-tier extension (public operator).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch
from .text import tokens_col


def doc_objectives(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, n_distinct, top_freq): the three curation
    objectives. ``n_distinct`` is a zero-shuffle array op; ``top_freq``
    is one partial-aggregated explode→max (the same shape as the vocab
    queries)."""
    toks = docs.select("doc_id", "n_chars", tokens_col(F.col("text")).alias("t"))
    tf = (
        toks.select("doc_id", F.explode("t").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").cast("bigint").alias("top_freq"))
    )
    return toks.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.size(F.array_distinct("t")).cast("bigint").alias("n_distinct"),
    ).join(tf, "doc_id")


def _dominates(b_pre: str, a_pre: str) -> Column:
    """b strictly dominates a: >= on both maximized objectives, <= on the
    minimized one, strict somewhere."""
    ge = (
        (F.col(f"{b_pre}n_chars") >= F.col(f"{a_pre}n_chars"))
        & (F.col(f"{b_pre}n_distinct") >= F.col(f"{a_pre}n_distinct"))
        & (F.col(f"{b_pre}top_freq") <= F.col(f"{a_pre}top_freq"))
    )
    strict = (
        (F.col(f"{b_pre}n_chars") > F.col(f"{a_pre}n_chars"))
        | (F.col(f"{b_pre}n_distinct") > F.col(f"{a_pre}n_distinct"))
        | (F.col(f"{b_pre}top_freq") < F.col(f"{a_pre}top_freq"))
    )
    return ge & strict


_OBJ = ("n_chars", "n_distinct", "top_freq")


def pareto_front(obj: DataFrame, n_buckets: int = 32) -> DataFrame:
    """The skyline of an (doc_id, n_chars, n_distinct, top_freq) frame —
    two-phase distributed (see module docstring), result independent of
    ``n_buckets``."""

    def _survivors(frame: DataFrame, join_on, broadcast_b: bool = False) -> DataFrame:
        a = frame.select(
            F.col("doc_id").alias("a_doc_id"),
            *[F.col(c).alias(f"a_{c}") for c in _OBJ],
            *([F.col("_bkt").alias("a_bkt")] if "_bkt" in frame.columns else []),
        )
        b = frame.select(
            F.col("doc_id").alias("b_doc_id"),
            *[F.col(c).alias(f"b_{c}") for c in _OBJ],
            *([F.col("_bkt").alias("b_bkt")] if "_bkt" in frame.columns else []),
        )
        if broadcast_b:
            b = F.broadcast(b)
        dominated = (
            a.join(b, join_on(a, b))
            .filter(_dominates("b_", "a_"))
            .select(F.col("a_doc_id").alias("doc_id"))
            .distinct()
        )
        return frame.join(dominated, "doc_id", "left_anti")

    # phase 1: local skylines inside hash buckets (equi join on _bkt)
    bucketed = obj.withColumn(
        "_bkt", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets))
    )
    local = _survivors(
        bucketed,
        lambda a, b: (F.col("a_bkt") == F.col("b_bkt"))
        & (F.col("a_doc_id") != F.col("b_doc_id")),
    ).drop("_bkt")
    # phase 2: exact global refine over the (small) candidate set — the
    # dominance condition has no equi key, so the candidate side is
    # explicitly broadcast (BroadcastNestedLoopJoin over candidates only,
    # never over the corpus)
    return _survivors(
        local, lambda a, b: F.col("a_doc_id") != F.col("b_doc_id"), broadcast_b=True
    )


_PARETO_SQL = """
WITH toks AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
         regexp_split_to_array(trim(text), '\\s+') AS t
  FROM documents
),
tf AS (
  SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_freq FROM (
    SELECT doc_id, tok, COUNT(*) AS c
    FROM (SELECT doc_id, UNNEST(t) AS tok FROM toks)
    GROUP BY doc_id, tok
  ) GROUP BY doc_id
),
obj AS MATERIALIZED (
  SELECT s.doc_id, s.n_chars,
         CAST(len(list_distinct(s.t)) AS BIGINT) AS n_distinct,
         tf.top_freq
  FROM toks s JOIN tf USING (doc_id)
)
SELECT a.doc_id, a.n_chars, a.n_distinct, a.top_freq
FROM obj a
WHERE NOT EXISTS (
  SELECT 1 FROM obj b
  WHERE b.doc_id <> a.doc_id
    AND b.n_chars >= a.n_chars
    AND b.n_distinct >= a.n_distinct
    AND b.top_freq <= a.top_freq
    AND (b.n_chars > a.n_chars OR b.n_distinct > a.n_distinct
         OR b.top_freq < a.top_freq)
)
ORDER BY a.doc_id
"""


@query("curation_pareto_front", oracle=_PARETO_SQL, defer=True)
def curation_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Pareto-optimal shortlist of the documents table under
    (length↑, vocabulary breadth↑, top-token repetition↓) — the DuckDB
    oracle is the one-phase NOT EXISTS dominance check the distributed
    two-phase plan must exactly reproduce."""
    docs = tpch.load(spark, sf_dir, "documents")
    return pareto_front(doc_objectives(docs)).orderBy("doc_id")
