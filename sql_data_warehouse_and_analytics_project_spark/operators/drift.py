"""Jensen–Shannon divergence between per-source token distributions.

Corpus-drift monitoring: ``dedup_source_fingerprints`` estimates SET
overlap of source shingle spaces (MinHash Jaccard); this module measures
DISTRIBUTIONAL divergence — two sources can share a vocabulary yet use
it with very different frequencies (a re-crawl that re-weights templates,
a contaminated mix). JSD(p, q) = ½KL(p‖m) + ½KL(q‖m), m = (p+q)/2, in
nats; 0 = identical distributions, ln 2 = disjoint supports.

Exact decomposition over the SHARED support only (no outer join): for a
term where q=0, the KL(p‖m) contribution is p·ln2, so

  JSD = ½[ Σ_sh p·ln(2p/(p+q)) + (1−Σ_sh p)·ln2 ]
      + ½[ Σ_sh q·ln(2q/(p+q)) + (1−Σ_sh q)·ln2 ]

— the inner self-join on term gives the shared terms, and the exclusive
mass enters through the two shared-mass totals. Scale shape: one
(source, term) count groupBy, a per-term self-join whose fan-out is
bounded by #sources per term (≤ |sources| — model-sized, not
corpus-sized), and one fold per source pair.

Cross-engine floats: p = cnt/total is an exact division of identical
integers; per-pair contribution sums fold in SORTED TERM ORDER
(sort_array + F.aggregate ≡ list(... ORDER BY term) + list_reduce); ln
of identical doubles matches (the nb.py precedent); ln2 enters as the
same Python double literal both sides; 6dp output round.

No reference counterpart — corpus-monitoring extension (Lin 1991).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch
from .text import SQL_TOKENS, tokens_col

_LN2 = math.log(2.0)


def source_term_probs(docs: DataFrame) -> DataFrame:
    """(source, term, p) unigram distribution per source over lowered
    whitespace tokens — integer counts divided by integer totals."""
    toks = F.transform(tokens_col(F.col("text")), lambda t: F.lower(t))
    counts = (
        docs.select("source", F.explode(toks).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    totals = counts.groupBy("source").agg(F.sum("cnt").cast("bigint").alias("total"))
    return counts.join(totals, "source").select(
        "source",
        "term",
        (F.col("cnt").cast("double") / F.col("total").cast("double")).alias("p"),
    )


def jsd_source_pairs(docs: DataFrame) -> DataFrame:
    """(source_a, source_b, jsd) in nats, a < b — for every pair with
    SHARED support. A fully disjoint pair never survives the inner join
    and is absent from the output; its JSD is ln 2 by definition, and
    ``dedup_source_fingerprints`` is the right detector for that regime
    (pytest pins the behavior)."""
    probs = source_term_probs(docs)
    a = probs.select(
        F.col("source").alias("source_a"), "term", F.col("p").alias("pa")
    )
    b = probs.select(
        F.col("source").alias("source_b"), "term", F.col("p").alias("pb")
    )
    shared = a.join(b, "term").filter(F.col("source_a") < F.col("source_b"))
    contrib = F.struct(
        "term",
        (
            F.col("pa") * F.log(F.lit(2.0) * F.col("pa") / (F.col("pa") + F.col("pb")))
        ).alias("ca"),
        (
            F.col("pb") * F.log(F.lit(2.0) * F.col("pb") / (F.col("pa") + F.col("pb")))
        ).alias("cb"),
        F.col("pa").alias("ma"),
        F.col("pb").alias("mb"),
    )

    def fold(field):
        return F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(contrib)), lambda s: s[field]
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return (
        shared.groupBy("source_a", "source_b")
        .agg(
            F.round(
                F.lit(0.5) * (fold("ca") + (F.lit(1.0) - fold("ma")) * F.lit(_LN2))
                + F.lit(0.5) * (fold("cb") + (F.lit(1.0) - fold("mb")) * F.lit(_LN2)),
                6,
            ).alias("jsd")
        )
        .orderBy("source_a", "source_b")
    )


_JSD_SQL = f"""
WITH toks AS (
  SELECT source, list_transform({SQL_TOKENS}, t -> lower(t)) AS t FROM documents
),
counts AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT source, UNNEST(t) AS term FROM toks)
  GROUP BY source, term
),
probs AS (
  SELECT source, term,
         CAST(cnt AS DOUBLE)
           / CAST(SUM(cnt) OVER (PARTITION BY source) AS DOUBLE) AS p
  FROM counts
),
shared AS (
  SELECT a.source AS source_a, b.source AS source_b, a.term,
         a.p AS pa, b.p AS pb
  FROM probs a JOIN probs b ON a.term = b.term AND a.source < b.source
)
SELECT source_a, source_b,
       ROUND(
         0.5 * (list_reduce(list(pa * ln(2.0 * pa / (pa + pb)) ORDER BY term),
                            (x, y) -> x + y)
                + (1.0 - list_reduce(list(pa ORDER BY term), (x, y) -> x + y))
                  * {_LN2!r})
       + 0.5 * (list_reduce(list(pb * ln(2.0 * pb / (pa + pb)) ORDER BY term),
                            (x, y) -> x + y)
                + (1.0 - list_reduce(list(pb ORDER BY term), (x, y) -> x + y))
                  * {_LN2!r}), 6) AS jsd
FROM shared
GROUP BY source_a, source_b
ORDER BY source_a, source_b
"""


@query("corpus_jsd_sources", oracle=_JSD_SQL)
def corpus_jsd_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen–Shannon divergence of every source's unigram
    distribution — the re-weighting/drift detector the set-overlap
    fingerprints cannot see."""
    return jsd_source_pairs(tpch.load(spark, sf_dir, "documents"))
