"""nDCG@k retrieval-quality evaluation over a self-labeling query set.

The retrieval tier serves rankings (BM25, phrase, RRF hybrid, MMR) and
audits ranker AGREEMENT (Spearman), but nothing measured ranking QUALITY
against graded relevance — the number IR dashboards actually track.
This closes that gap with exact nDCG@k (Järvelin & Kekäläinen 2002):

    DCG@k  = Σ_{i=1..k} (2^rel_i − 1) / log2(i + 1),
    nDCG@k = DCG@k / IDCG@k   (IDCG = DCG of the best possible ordering).

Self-labeling protocol (fully deterministic, no human judgments): every
100th document is a query; its query string is its top-3 tokens by
(tf desc, token asc); graded relevance of any candidate is its DISTINCT
token overlap with the query document bucketed to grades 0–3. The
ranking under test is data-driven BM25 — the per-(query, term) weights
join against the corpus term table exactly like the inverted-index
serving path (no per-query literal unrolling), so the same operator
evaluates arbitrary query batches.

Engine discipline: tf/df/dl/overlap counts are exact bigints; BM25
scores and gain/discount terms derive from them through ONE mirrored
parenthesization; scores are rounded to 6 dp BEFORE ranking with doc_id
tie-breaks, so both engines order identically even at libm's last ulp.
All windows partition by query id (bounded eval-set groups, never a
global sort). Scale: the grading and scoring joins are token-key equi
joins with fan-out |Q|·df(term) — |Q| is an eval set, bounded by
construction; one corpus token pass feeds both.

No reference counterpart — IR-evaluation extension (public metric).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch
from .text import tokens_col

_K1 = 1.2
_B = 0.75
_NDCG_K = 10
_QUERY_MOD = 100
_N_QTERMS = 3
# distinct-token-overlap grade cuts: >=8 -> 3, >=5 -> 2, >=2 -> 1
_G3, _G2, _G1 = 8, 5, 2


def _grade(overlap):
    return (
        F.when(overlap >= _G3, 3)
        .when(overlap >= _G2, 2)
        .when(overlap >= _G1, 1)
        .otherwise(0)
    )


def ndcg_at_k(docs: DataFrame, k: int = _NDCG_K) -> DataFrame:
    """(query_id, dcg, idcg, ndcg) per query document — see module note."""
    toks = docs.select("doc_id", tokens_col(F.col("text")).alias("t"))
    term_tf = toks.select(
        "doc_id", F.explode("t").alias("tok")
    ).groupBy("doc_id", "tok").agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    dl = toks.select("doc_id", F.size("t").cast("bigint").alias("dl"))

    is_q = F.col("doc_id") % _QUERY_MOD == 0
    wq = Window.partitionBy("qid").orderBy(F.desc("tf"), F.asc("tok"))
    qterms = (
        term_tf.filter(is_q)
        .select(F.col("doc_id").alias("qid"), "tok", "tf")
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= _N_QTERMS)
        .select("qid", "tok")
    )

    stats = F.broadcast(
        dl.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "avgdl"
            ),
        )
    )
    df_t = term_tf.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    # per-(query, term) idf weights — a KB-scale broadcastable frame
    qw = F.broadcast(
        qterms.join(df_t, "tok").crossJoin(stats).select(
            "qid",
            "tok",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs").cast("double") - F.col("df").cast("double") + 0.5)
                / (F.col("df").cast("double") + 0.5)
            ).alias("idf"),
            "avgdl",
        )
    )
    # the per-(qid, doc) score folds its <= _N_QTERMS per-term weights in
    # a DETERMINISTIC order (cumulative window ordered by tok, exactly
    # like the DCG folds below) — an orderless SUM over doubles can
    # differ by a ulp between engines and flip the score-desc ranking at
    # a 6-dp rounding boundary, changing top-k membership (ADVICE r15)
    w_sc_cum = Window.partitionBy("qid", "doc_id").orderBy("tok").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_sc = Window.partitionBy("qid", "doc_id")
    scored = (
        term_tf.join(qw, "tok")
        .join(dl, "doc_id")
        .filter(F.col("doc_id") != F.col("qid"))
        .select(
            "qid",
            "doc_id",
            "tok",
            (
                F.col("idf")
                * (
                    (F.col("tf").cast("double") * F.lit(_K1 + 1.0))
                    / (
                        F.col("tf").cast("double")
                        + F.lit(_K1)
                        * (
                            F.lit(1.0 - _B)
                            + F.lit(_B) * F.col("dl").cast("double") / F.col("avgdl")
                        )
                    )
                )
            ).alias("w"),
        )
        .withColumn("cum", F.sum("w").over(w_sc_cum))
        .withColumn("mxtok", F.max("tok").over(w_sc))
        .filter(F.col("tok") == F.col("mxtok"))
        .select("qid", "doc_id", F.round("cum", 6).alias("score"))
    )

    qtok = toks.filter(is_q).select(
        F.col("doc_id").alias("qid"), F.explode(F.array_distinct("t")).alias("tok")
    )
    dtok = toks.select("doc_id", F.explode(F.array_distinct("t")).alias("tok"))
    grades = (
        qtok.join(dtok, "tok")
        .filter(F.col("doc_id") != F.col("qid"))
        .groupBy("qid", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("overlap"))
        .select("qid", "doc_id", _grade(F.col("overlap")).cast("int").alias("rel"))
    )

    # float folds must be ORDER-DETERMINISTIC cross-engine: both DCG sums
    # run as a cumulative window in rank order (<= k rows per query) and
    # the last row is taken — never an orderless SUM over doubles
    gain = (F.pow(F.lit(2.0), F.col("rel").cast("double")) - F.lit(1.0)) / F.log2(
        F.col("rn").cast("double") + F.lit(1.0)
    )
    w_cum = Window.partitionBy("qid").orderBy("rn").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_q = Window.partitionBy("qid")

    def _folded(frame, out):
        return (
            frame.withColumn("g", gain)
            .withColumn("cum", F.sum("g").over(w_cum))
            .withColumn("mx", F.max("rn").over(w_q))
            .filter(F.col("rn") == F.col("mx"))
            .select("qid", F.col("cum").alias(out))
        )

    w_rank = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    dcg = _folded(
        scored.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= k)
        .join(grades, ["qid", "doc_id"], "left")
        .fillna(0, subset=["rel"]),
        "dcg",
    )
    w_ideal = Window.partitionBy("qid").orderBy(F.desc("rel"), F.asc("doc_id"))
    idcg = _folded(
        grades.withColumn("rn", F.row_number().over(w_ideal)).filter(F.col("rn") <= k),
        "idcg",
    )
    return (
        dcg.join(idcg, "qid", "left")
        .select(
            F.col("qid").alias("query_id"),
            F.round("dcg", 6).alias("dcg"),
            F.round(F.coalesce("idcg", F.lit(0.0)), 6).alias("idcg"),
            F.round(
                F.col("dcg") / F.nullif(F.coalesce("idcg", F.lit(0.0)), F.lit(0.0)), 6
            ).alias("ndcg"),
        )
        .orderBy("query_id")
    )


_NDCG_SQL = f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
term_tf AS MATERIALIZED (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, UNNEST(t) AS tok FROM toks)
  GROUP BY doc_id, tok
),
dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
qterms AS (
  SELECT qid, tok FROM (
    SELECT doc_id AS qid, tok, tf,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tf DESC, tok) AS rn
    FROM term_tf WHERE doc_id % {_QUERY_MOD} = 0
  ) WHERE rn <= {_N_QTERMS}
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
  FROM dl
),
df_t AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM term_tf GROUP BY tok),
qw AS (
  SELECT q.qid, q.tok,
         ln(1.0 + (CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
                  / (CAST(d.df AS DOUBLE) + 0.5)) AS idf,
         s.avgdl
  FROM qterms q JOIN df_t d USING (tok), stats s
),
scored AS MATERIALIZED (
  -- order-deterministic fold in tok order (cumulative window, last row),
  -- mirroring the engine exactly — never an orderless SUM over doubles
  SELECT doc_id, qid, ROUND(cum, 6) AS score FROM (
    SELECT t.doc_id, w.qid, w.tok,
           SUM(w.idf * ((CAST(t.tf AS DOUBLE) * {_K1 + 1.0})
                        / (CAST(t.tf AS DOUBLE)
                           + {_K1} * ({1.0 - _B} + {_B} * CAST(l.dl AS DOUBLE) / w.avgdl))))
             OVER (PARTITION BY t.doc_id, w.qid ORDER BY w.tok
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           MAX(w.tok) OVER (PARTITION BY t.doc_id, w.qid) AS mxtok
    FROM term_tf t JOIN qw w USING (tok) JOIN dl l ON l.doc_id = t.doc_id
    WHERE t.doc_id <> w.qid
  ) WHERE tok = mxtok
),
grades AS MATERIALIZED (
  SELECT qid, doc_id,
         CASE WHEN overlap >= {_G3} THEN 3
              WHEN overlap >= {_G2} THEN 2
              WHEN overlap >= {_G1} THEN 1 ELSE 0 END AS rel
  FROM (
    SELECT q.doc_id AS qid, d.doc_id, CAST(COUNT(*) AS BIGINT) AS overlap
    FROM (SELECT doc_id, UNNEST(list_distinct(t)) AS tok FROM toks WHERE doc_id % {_QUERY_MOD} = 0) q
    JOIN (SELECT doc_id, UNNEST(list_distinct(t)) AS tok FROM toks) d USING (tok)
    WHERE d.doc_id <> q.doc_id
    GROUP BY q.doc_id, d.doc_id
  )
),
dcg AS (
  SELECT qid, cum AS dcg FROM (
    SELECT qid, rn,
           SUM((POW(2.0, CAST(rel AS DOUBLE)) - 1.0) / log2(CAST(rn AS DOUBLE) + 1.0))
             OVER (PARTITION BY qid ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           MAX(rn) OVER (PARTITION BY qid) AS mx
    FROM (
      SELECT r.qid, r.rn, COALESCE(g.rel, 0) AS rel
      FROM (
        SELECT qid, doc_id, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rn
        FROM scored
      ) r LEFT JOIN grades g USING (qid, doc_id)
      WHERE rn <= {_NDCG_K}
    )
  ) WHERE rn = mx
),
idcg AS (
  SELECT qid, cum AS idcg FROM (
    SELECT qid, rn,
           SUM((POW(2.0, CAST(rel AS DOUBLE)) - 1.0) / log2(CAST(rn AS DOUBLE) + 1.0))
             OVER (PARTITION BY qid ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           MAX(rn) OVER (PARTITION BY qid) AS mx
    FROM (
      SELECT qid, rel, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rel DESC, doc_id) AS rn
      FROM grades
    ) WHERE rn <= {_NDCG_K}
  ) WHERE rn = mx
)
SELECT d.qid AS query_id,
       ROUND(d.dcg, 6) AS dcg,
       ROUND(COALESCE(i.idcg, 0.0), 6) AS idcg,
       ROUND(d.dcg / NULLIF(COALESCE(i.idcg, 0.0), 0.0), 6) AS ndcg
FROM dcg d LEFT JOIN idcg i USING (qid)
ORDER BY query_id
"""


@query("retrieval_ndcg_bm25", oracle=_NDCG_SQL)
def retrieval_ndcg_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of data-driven BM25 against graded token-overlap
    relevance, one row per self-labeled query document — DuckDB replays
    query-term selection, the postings-join scoring, grading, and both
    discounted folds."""
    return ndcg_at_k(tpch.load(spark, sf_dir, "documents"))
