"""Threshold-free classifier evaluation at corpus scale: ROC-AUC and the
precision/recall curve.

The engine trains and applies classifiers (``nb.py``, ``lr.py``, the
stopword-vote lang-ID) and reports a confusion matrix
(``text_lang_confusion``) and bootstrap CIs (``bootstrap.py``) — but no
THRESHOLD-FREE quality metric. This module closes that eval-infra gap
with the two standard ones, computed exactly:

- ``roc_auc``: tie-aware Mann-Whitney formulation. With per-distinct-
  score positive/negative counts p(s), q(s):

      AUC = [ Σ_s p(s) · ( cum_q(<s) + q(s)/2 ) ] / (P · N)

  kept in INTEGERS as  num2 = Σ p·(2·cum_q(≤s) − q)  over 2·P·N — bigint
  arithmetic end to end, so Spark and DuckDB agree bit-for-bit before
  the single 6-dp output division.
- ``pr_curve``: for every distinct score as the decision threshold
  (predict positive when score ≥ t): TP/FP/FN and the derived
  precision / recall / F1 — all ratios of exact bigints, 6-dp rounded.

Score/label surface: the en-marker stopword density of ``text.py``'s
lang-ID heuristic, as an INTEGER key (marker hits per million tokens,
truncating division — identical on both engines), labeled against the
``lang`` column. The synthetic corpus is English-vocab throughout, so
the measured AUC hovers near 0.5 by design (same caveat as
``text_lang_id``) — the METRIC machinery is what's exercised; planted
separable fixtures pin the semantics in ``tests/test_evalmetrics.py``.

Scale shape: one partial-agg groupBy collapses the corpus to the
per-distinct-score count table (≤ 1e6+1 rows by construction of the
ppm key, in practice far fewer — KB-sized, model-scale); the rank
cumsums run as a single-partition window over THAT compact table only,
never over corpus rows (the corpus-wide sort a naive per-row ranking
would incur is the anti-pattern this shape avoids). Both outputs are
then O(distinct scores).

No reference counterpart — eval-infrastructure extension (Hanley &
McNeil 1982; Davis & Goadrich 2006).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch
from .text import _LANG_MARKERS, _occurrences, _sql_occurrences, SQL_TOKENS, tokens_col


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.load(spark, sf_dir, "documents")


# --- deterministic score/label surface ---------------------------------------


def score_label(docs: DataFrame) -> DataFrame:
    """(doc_id, score_key, label): en-marker hits per million whitespace
    tokens (truncating bigint division) and the 0/1 en label — the exact
    integer score the metrics rank on."""
    padded = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    hits = None
    for m in _LANG_MARKERS["en"]:
        occ = _occurrences(padded, m)
        hits = occ if hits is None else hits + occ
    n_tokens = F.size(tokens_col(F.col("text"))).cast("bigint")
    return docs.select(
        "doc_id",
        hits.alias("hits"),
        n_tokens.alias("n_tokens"),
        (F.col("lang") == "en").cast("int").alias("label"),
    ).select(
        "doc_id",
        F.expr("(1000000 * hits) div greatest(n_tokens, 1)").alias("score_key"),
        "label",
    )


def _sql_score_label() -> str:
    padded = "(' ' || lower(text) || ' ')"
    hits = " + ".join(_sql_occurrences(padded, m) for m in _LANG_MARKERS["en"])
    return f"""
  SELECT doc_id,
         (1000000 * ({hits})) // greatest(CAST(len({SQL_TOKENS}) AS BIGINT), 1)
           AS score_key,
         CAST(lang = 'en' AS INT) AS label
  FROM documents
"""


def _score_counts(scored: DataFrame) -> DataFrame:
    """Collapse per-row scores to the compact (score_key, p, q) table —
    the ONLY shuffle; everything downstream is model-sized."""
    return scored.groupBy("score_key").agg(
        F.sum("label").cast("bigint").alias("p"),
        F.sum(1 - F.col("label")).cast("bigint").alias("q"),
    )


_SQL_COUNTS = f"""
scored AS ({_sql_score_label()}),
counts AS (
  SELECT score_key, CAST(SUM(label) AS BIGINT) AS p,
         CAST(SUM(1 - label) AS BIGINT) AS q
  FROM scored GROUP BY score_key
)
"""


# --- ROC-AUC ------------------------------------------------------------------


def roc_auc(docs: DataFrame) -> DataFrame:
    """One row (n_pos, n_neg, auc): exact tie-aware Mann-Whitney AUC of
    the en-marker-density score against the en label."""
    return auc_from_counts(_score_counts(score_label(docs)))


def auc_from_counts(counts: DataFrame) -> DataFrame:
    """AUC from a (score_key, p, q) count table — the shared math behind
    the batch query and the streaming monitor's SUM-merged state
    (``streaming.jobs.stream_roc_auc``): counts are a SUM-merge monoid,
    so shard- or batch-partial tables merge losslessly before this.
    The cumulative negative count rides ``abstats._value_cumsums``
    (range-partition → per-partition window → broadcast prefix offsets;
    VERDICT r17 ask #6) — exact integer addition is associative, so the
    fold is bit-identical to the single-task ``Window.orderBy`` it
    replaced while the ppm-domain table never funnels into one task."""
    from .abstats import _value_cumsums

    ranked, _tot = _value_cumsums(counts.withColumnRenamed("score_key", "v"), ["q"])
    num2 = F.sum(F.col("p") * (2 * F.col("cum_q") - F.col("q")))
    return ranked.agg(
        F.sum("p").cast("bigint").alias("n_pos"),
        F.sum("q").cast("bigint").alias("n_neg"),
        num2.cast("bigint").alias("_num2"),
    ).select(
        "n_pos",
        "n_neg",
        F.round(
            F.col("_num2").cast("double")
            / F.nullif((2 * F.col("n_pos") * F.col("n_neg")).cast("double"), F.lit(0.0)),
            6,
        ).alias("auc"),
    )


_AUC_SQL = f"""
WITH {_SQL_COUNTS},
ranked AS (
  SELECT p, q, SUM(q) OVER (ORDER BY score_key) AS cum_q
  FROM counts
)
SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
       CAST(SUM(q) AS BIGINT) AS n_neg,
       ROUND(CAST(SUM(p * (2 * cum_q - q)) AS DOUBLE)
             / NULLIF(CAST(2 * SUM(p) * SUM(q) AS DOUBLE), 0.0), 6) AS auc
FROM ranked
"""


@query("eval_roc_auc", oracle=_AUC_SQL, defer=True)
def eval_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-aware ROC-AUC of the stopword-density en detector —
    bigint Mann-Whitney over the per-distinct-score count table."""
    return roc_auc(_docs(spark, sf_dir))


# --- precision/recall curve ----------------------------------------------------


def pr_curve(docs: DataFrame) -> DataFrame:
    """(threshold_ppm, tp, fp, fn, precision, recall, f1): the full
    operating-point sweep — one row per distinct score as the ≥ threshold."""
    return pr_from_counts(_score_counts(score_label(docs)))


def pr_from_counts(counts: DataFrame) -> DataFrame:
    """PR sweep from a (score_key, p, q) count table — shared with the
    streaming monitor (see :func:`auc_from_counts`). The descending
    cumulative counts come from the ascending ``_value_cumsums`` fold and
    its exact grand totals (desc-inclusive = total − asc-inclusive + own):
    bit-identical integers, no single-task window, and the grand-total
    window disappears into the fold's exact Python-int totals."""
    from .abstats import _value_cumsums

    stepped, tot = _value_cumsums(
        counts.withColumnRenamed("score_key", "v"), ["p", "q"]
    )
    swept = stepped.select(
        F.col("v").alias("threshold_ppm"),
        (F.lit(int(tot["p"])) - F.col("cum_p") + F.col("p")).cast("bigint").alias("tp"),
        (F.lit(int(tot["q"])) - F.col("cum_q") + F.col("q")).cast("bigint").alias("fp"),
        (F.col("cum_p") - F.col("p")).cast("bigint").alias("fn"),
    )
    return swept.select(
        "threshold_ppm",
        "tp",
        "fp",
        "fn",
        F.round(
            F.col("tp").cast("double")
            / F.nullif((F.col("tp") + F.col("fp")).cast("double"), F.lit(0.0)),
            6,
        ).alias("precision"),
        F.round(
            F.col("tp").cast("double")
            / F.nullif((F.col("tp") + F.col("fn")).cast("double"), F.lit(0.0)),
            6,
        ).alias("recall"),
        F.round(
            (2 * F.col("tp")).cast("double")
            / F.nullif((2 * F.col("tp") + F.col("fp") + F.col("fn")).cast("double"), F.lit(0.0)),
            6,
        ).alias("f1"),
    ).orderBy("threshold_ppm")


_PR_SQL = f"""
WITH {_SQL_COUNTS},
swept AS (
  SELECT score_key AS threshold_ppm,
         SUM(p) OVER (ORDER BY score_key DESC) AS tp,
         SUM(q) OVER (ORDER BY score_key DESC) AS fp,
         SUM(p) OVER () - SUM(p) OVER (ORDER BY score_key DESC) AS fn
  FROM counts
)
SELECT threshold_ppm, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn,
       ROUND(CAST(tp AS DOUBLE) / NULLIF(CAST(tp + fp AS DOUBLE), 0.0), 6) AS precision,
       ROUND(CAST(tp AS DOUBLE) / NULLIF(CAST(tp + fn AS DOUBLE), 0.0), 6) AS recall,
       ROUND(CAST(2 * tp AS DOUBLE) / NULLIF(CAST(2 * tp + fp + fn AS DOUBLE), 0.0), 6) AS f1
FROM swept
ORDER BY threshold_ppm
"""


@query("eval_pr_curve", oracle=_PR_SQL, defer=True)
def eval_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 at every distinct-score threshold of the
    stopword-density en detector — exact bigint confusion cells."""
    return pr_curve(_docs(spark, sf_dir))


# --- sliced evaluation ---------------------------------------------------------
#
# Metric-by-slice: a global AUC can hide a slice where the classifier is
# inverted (Simpson-style). Same exact math per facet value; the rank
# cumsum window is PARTITIONED by the facet, so unlike the global metric
# it needs no single-partition stage at all — facets spread across the
# cluster, each facet's count table stays KB-sized.


def roc_auc_by(docs: DataFrame, facet: str = "source") -> DataFrame:
    """(facet, n_pos, n_neg, auc) per facet value — the per-slice exact
    tie-aware AUC; NULL where a slice holds a single class."""
    scored = score_label(docs).join(
        docs.select("doc_id", F.col(facet).alias("facet")), "doc_id"
    )
    by = scored.groupBy("facet", "score_key").agg(
        F.sum("label").cast("bigint").alias("p"),
        F.sum(1 - F.col("label")).cast("bigint").alias("q"),
    )
    w = Window.partitionBy("facet").orderBy("score_key")
    ranked = by.withColumn("cum_q", F.sum("q").over(w))
    num2 = F.sum(F.col("p") * (2 * F.col("cum_q") - F.col("q")))
    return (
        ranked.groupBy("facet")
        .agg(
            F.sum("p").cast("bigint").alias("n_pos"),
            F.sum("q").cast("bigint").alias("n_neg"),
            num2.cast("bigint").alias("_num2"),
        )
        .select(
            "facet",
            "n_pos",
            "n_neg",
            F.round(
                F.col("_num2").cast("double")
                / F.nullif(
                    (2 * F.col("n_pos") * F.col("n_neg")).cast("double"), F.lit(0.0)
                ),
                6,
            ).alias("auc"),
        )
        .orderBy("facet")
    )


_AUC_BY_SQL = f"""
WITH scored AS ({_sql_score_label()}),
faceted AS (
  SELECT d.source AS facet, s.score_key, s.label
  FROM scored s JOIN documents d ON d.doc_id = s.doc_id
),
counts AS (
  SELECT facet, score_key, CAST(SUM(label) AS BIGINT) AS p,
         CAST(SUM(1 - label) AS BIGINT) AS q
  FROM faceted GROUP BY facet, score_key
),
ranked AS (
  SELECT facet, p, q,
         SUM(q) OVER (PARTITION BY facet ORDER BY score_key) AS cum_q
  FROM counts
)
SELECT facet, CAST(SUM(p) AS BIGINT) AS n_pos,
       CAST(SUM(q) AS BIGINT) AS n_neg,
       ROUND(CAST(SUM(p * (2 * cum_q - q)) AS DOUBLE)
             / NULLIF(CAST(2 * SUM(p) * SUM(q) AS DOUBLE), 0.0), 6) AS auc
FROM ranked
GROUP BY facet
ORDER BY facet
"""


@query("eval_roc_auc_by_source", oracle=_AUC_BY_SQL)
def eval_roc_auc_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sliced AUC of the en detector — the facet-partitioned
    variant whose rank window distributes across slices."""
    return roc_auc_by(_docs(spark, sf_dir), facet="source")


# --- lift / gains deciles (r14) -------------------------------------------------
#
# The campaign-targeting view of the same count table: rank the corpus
# by score (best first), cut into 10 population deciles, and report each
# decile's positive rate, cumulative gain (share of all positives
# captured so far), and lift over the base rate. Everything stays exact
# bigints until the three final divisions: a distinct-score group is
# assigned to the decile of its LAST row — decile = ((cum_n − 1) · 10)
# div total — a deterministic whole-group rule (no proportional split of
# tied scores; ties are real ties and travel together), documented
# rather than engine-dependent. Windows run over the compact count
# table only — same scale argument as the AUC/PR sweeps above.


def lift_deciles(docs: DataFrame) -> DataFrame:
    """(decile, n_rows, n_pos, pos_rate, cum_gain, lift): population
    deciles by descending score — see the section note."""
    return lift_from_counts(_score_counts(score_label(docs)))


def lift_from_counts(counts: DataFrame) -> DataFrame:
    """Lift table from a (score_key, p, q) count table — SUM-merge
    monoid input, same contract as :func:`auc_from_counts`. The
    descending population cumsum and both grand totals ride
    ``_value_cumsums`` (VERDICT r17 ask #6): bit-identical integers, no
    single-task window; only the ≤10-row decile fold keeps a bounded
    unpartitioned window."""
    from .abstats import _value_cumsums

    stepped, tot = _value_cumsums(
        counts.select(
            F.col("score_key").alias("v"), "p", (F.col("p") + F.col("q")).alias("n")
        ),
        ["n", "p"],
    )
    total, total_p = int(tot["n"]), int(tot["p"])
    ranked = stepped.select(
        "p",
        "n",
        # desc-inclusive population rank of the group's LAST row
        (F.lit(total) - F.col("cum_n") + F.col("n")).cast("bigint").alias("cum_n"),
    ).select(
        F.expr(f"((cum_n - 1) * 10) div {total}").cast("int").alias("decile"),
        "p",
        "n",
    )
    by_dec = ranked.groupBy("decile").agg(
        F.sum("n").cast("bigint").alias("n_rows"),
        F.sum("p").cast("bigint").alias("n_pos"),
    )
    w_dec = Window.orderBy("decile")  # ≤10 rows
    return (
        by_dec.withColumn("cum_pos", F.sum("n_pos").over(w_dec).cast("bigint"))
        .withColumn("total", F.lit(total).cast("bigint"))
        .withColumn("total_p", F.lit(total_p).cast("bigint"))
        .select(
            "decile",
            "n_rows",
            "n_pos",
            F.round(
                F.col("n_pos").cast("double")
                / F.nullif(F.col("n_rows").cast("double"), F.lit(0.0)),
                6,
            ).alias("pos_rate"),
            F.round(
                F.col("cum_pos").cast("double")
                / F.nullif(F.col("total_p").cast("double"), F.lit(0.0)),
                6,
            ).alias("cum_gain"),
            F.round(
                (F.col("n_pos") * F.col("total")).cast("double")
                / F.nullif((F.col("n_rows") * F.col("total_p")).cast("double"), F.lit(0.0)),
                6,
            ).alias("lift"),
        )
        .orderBy("decile")
    )


_LIFT_SQL = f"""
WITH {_SQL_COUNTS},
ranked AS (
  SELECT ((SUM(p + q) OVER (ORDER BY score_key DESC) - 1) * 10)
           // SUM(p + q) OVER () AS decile,
         p, p + q AS n,
         SUM(p + q) OVER () AS total,
         SUM(p) OVER () AS total_p
  FROM counts
),
by_dec AS (
  SELECT CAST(decile AS INT) AS decile, total, total_p,
         CAST(SUM(n) AS BIGINT) AS n_rows,
         CAST(SUM(p) AS BIGINT) AS n_pos
  FROM ranked GROUP BY decile, total, total_p
)
SELECT decile, n_rows, n_pos,
       ROUND(CAST(n_pos AS DOUBLE) / NULLIF(CAST(n_rows AS DOUBLE), 0.0), 6) AS pos_rate,
       ROUND(CAST(SUM(n_pos) OVER (ORDER BY decile) AS DOUBLE)
             / NULLIF(CAST(total_p AS DOUBLE), 0.0), 6) AS cum_gain,
       ROUND(CAST(n_pos * total AS DOUBLE)
             / NULLIF(CAST(n_rows * total_p AS DOUBLE), 0.0), 6) AS lift
FROM by_dec
ORDER BY decile
"""


@query("eval_lift_deciles", oracle=_LIFT_SQL, defer=True)
def eval_lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift/gains table of the en detector — positive rate,
    cumulative gain, and lift over base rate per population decile,
    exact-bigint until the final divisions."""
    return lift_deciles(_docs(spark, sf_dir))


# --- Cohen's kappa (r15) ------------------------------------------------------
#
# Chance-corrected agreement between a hard classifier and the truth —
# the label-QA number a data-labeling pipeline alerts on (raw accuracy
# flatters any skewed-prior rater). kappa = (po − pe) / (1 − pe) with
# po = observed agreement and pe = the product-of-marginals chance rate.
# Everything collapses to the 4-cell confusion table first (one
# partial-agg groupBy), so the arithmetic is exact bigints until the
# single rounded division — and the 100 TB cost is the one count pass.

_KAPPA_THRESHOLD = 20_000  # score_key (en-marker ppm) decision threshold


def cohens_kappa(docs: DataFrame, threshold: int = _KAPPA_THRESHOLD) -> DataFrame:
    """One row (n_docs, n_agree, po, pe, kappa): agreement between the
    thresholded en detector and the true label."""
    scored = score_label(docs).select(
        "label", (F.col("score_key") >= threshold).cast("int").alias("pred")
    )
    cells = scored.groupBy("label", "pred").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    j = cells.agg(
        F.sum("c").alias("n"),
        F.sum(F.when(F.col("label") == F.col("pred"), F.col("c")).otherwise(0)).alias("agree"),
        F.sum(F.when(F.col("label") == 1, F.col("c")).otherwise(0)).alias("t1"),
        F.sum(F.when(F.col("pred") == 1, F.col("c")).otherwise(0)).alias("p1"),
    )
    n = F.col("n").cast("double")
    po = F.col("agree").cast("double") / n
    pe = (
        F.col("t1").cast("double") * F.col("p1").cast("double")
        + (n - F.col("t1").cast("double")) * (n - F.col("p1").cast("double"))
    ) / (n * n)
    return j.select(
        F.col("n").cast("bigint").alias("n_docs"),
        F.col("agree").cast("bigint").alias("n_agree"),
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round((po - pe) / F.nullif(F.lit(1.0) - pe, F.lit(0.0)), 6).alias("kappa"),
    )


_KAPPA_SQL = f"""
WITH scored AS ({_sql_score_label()}),
cells AS (
  SELECT label, CAST(score_key >= {_KAPPA_THRESHOLD} AS INT) AS pred,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM scored GROUP BY label, pred
),
j AS (
  SELECT SUM(c) AS n,
         SUM(CASE WHEN label = pred THEN c ELSE 0 END) AS agree,
         SUM(CASE WHEN label = 1 THEN c ELSE 0 END) AS t1,
         SUM(CASE WHEN pred = 1 THEN c ELSE 0 END) AS p1
  FROM cells
)
SELECT CAST(n AS BIGINT) AS n_docs, CAST(agree AS BIGINT) AS n_agree,
       ROUND(CAST(agree AS DOUBLE) / CAST(n AS DOUBLE), 6) AS po,
       ROUND((CAST(t1 AS DOUBLE) * CAST(p1 AS DOUBLE)
              + (CAST(n AS DOUBLE) - CAST(t1 AS DOUBLE)) * (CAST(n AS DOUBLE) - CAST(p1 AS DOUBLE)))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS pe,
       ROUND(((CAST(agree AS DOUBLE) / CAST(n AS DOUBLE))
              - (CAST(t1 AS DOUBLE) * CAST(p1 AS DOUBLE)
                 + (CAST(n AS DOUBLE) - CAST(t1 AS DOUBLE)) * (CAST(n AS DOUBLE) - CAST(p1 AS DOUBLE)))
                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
             / NULLIF(1.0 - (CAST(t1 AS DOUBLE) * CAST(p1 AS DOUBLE)
                 + (CAST(n AS DOUBLE) - CAST(t1 AS DOUBLE)) * (CAST(n AS DOUBLE) - CAST(p1 AS DOUBLE)))
                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 0.0), 6) AS kappa
FROM j
"""


@query("eval_cohens_kappa", oracle=_KAPPA_SQL, defer=True)
def eval_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chance-corrected agreement of the thresholded en detector with the
    lang labels — confusion cells exact, one rounded kappa."""
    return cohens_kappa(_docs(spark, sf_dir))


# --- split-conformal coverage audit (r15) -------------------------------------
#
# Distribution-free prediction sets (Vovk; Angelopoulos & Bates 2021
# tutorial form): a hash-based calibration split supplies nonconformity
# scores; q-hat is the ceil((n_cal+1)(1-a))-th smallest; a test point's
# prediction set is every label whose nonconformity <= q-hat, and
# marginal coverage of the true label is guaranteed >= 1-a in
# expectation — IF the pipeline is implemented exactly. This operator is
# the audit: it recomputes coverage on the held-out split, the number an
# eval harness alerts on. Nonconformity: a(x, y=1) = -score_key,
# a(x, y=0) = +score_key (higher score = more en-like). All integers;
# the split is the md5-13-hex parity both engines compute identically;
# the order statistic is taken over the COMPACT (alpha, count) table via
# cumulative counts — never a corpus-wide sort (the window runs on
# distinct nonconformity values only, bounded by the ppm construction).
# Scale = two count passes; q-hat derivation is model-sized.

_CONF_ALPHA_PPM = 100_000  # a = 0.1 as exact ppm (avoids float n*a edges)


def _md5_even(col: str):
    """Engine-portable 50/50 split: parity of the md5-13-hex integer
    (the repo-standard cross-engine hash, dedup._md5_long)."""
    from .dedup import _md5_long

    return _md5_long(F.col(col).cast("string"), 13) % 2 == 0


def conformal_coverage(docs: DataFrame, alpha_ppm: int = _CONF_ALPHA_PPM) -> DataFrame:
    """One row (n_calib, n_test, qhat, n_covered, coverage, target):
    split-conformal coverage of the en-detector nonconformity on the
    md5-held-out split (even md5(doc_id) = calibration)."""
    scored = score_label(docs).select(
        "doc_id",
        "label",
        F.when(F.col("label") == 1, -F.col("score_key"))
        .otherwise(F.col("score_key"))
        .alias("alpha"),
        _md5_even("doc_id").alias("is_cal"),
    )
    cal = scored.filter("is_cal")
    test = scored.filter(~F.col("is_cal"))
    counts = cal.groupBy(F.col("alpha").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    # the order statistic folds the distinct-nonconformity count table
    # through _value_cumsums (VERDICT r17 ask #6) — no single-task window;
    # n_cal falls out of the fold's exact totals, saving the extra pass
    from .abstats import _value_cumsums

    stepped, tot = _value_cumsums(counts, ["c"])
    n_cal = int(tot["c"])
    k = -(-((n_cal + 1) * (1_000_000 - alpha_ppm)) // 1_000_000)  # ceil, exact ints
    k = min(k, n_cal) if n_cal else 0
    qhat_rows = (
        stepped.filter(F.col("cum_c") >= k).orderBy("v").limit(1).collect()
    )
    qhat = int(qhat_rows[0]["v"]) if qhat_rows else 0
    cov = test.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum((F.col("alpha") <= qhat).cast("int")).cast("bigint").alias("n_covered"),
    )
    return cov.select(
        F.lit(int(n_cal)).cast("bigint").alias("n_calib"),
        "n_test",
        F.lit(qhat).cast("bigint").alias("qhat"),
        "n_covered",
        F.round(
            F.col("n_covered").cast("double") / F.nullif(F.col("n_test").cast("double"), F.lit(0.0)),
            6,
        ).alias("coverage"),
        F.round(F.lit((1_000_000 - alpha_ppm) / 1_000_000.0), 6).alias("target"),
    )


_CONF_SQL = f"""
WITH scored AS ({_sql_score_label()}),
tagged AS MATERIALIZED (
  SELECT doc_id, label,
         CASE WHEN label = 1 THEN -score_key ELSE score_key END AS alpha,
         (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT % 2 = 0) AS is_cal
  FROM scored
),
cal AS (SELECT alpha FROM tagged WHERE is_cal),
ncal AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM cal),
kk AS (
  -- exact integer ceiling, mirroring the engine's -(-x // d) (ADVICE
  -- r15: float CEIL over DOUBLE can land one off at representation
  -- boundaries once (n_cal+1)*(1-alpha) exceeds 2^53-exactness)
  SELECT n_cal,
         LEAST(((n_cal + 1) * {1_000_000 - _CONF_ALPHA_PPM} + 999999) // 1000000, n_cal) AS k
  FROM ncal
),
counts AS (
  SELECT alpha, CAST(COUNT(*) AS BIGINT) AS c FROM cal GROUP BY alpha
),
cum AS (
  SELECT alpha, SUM(c) OVER (ORDER BY alpha) AS cum FROM counts
),
qhat AS (
  SELECT MIN(alpha) AS q FROM cum, kk WHERE cum >= kk.k
),
cov AS (
  -- COALESCE pins the n_cal=0 degenerate case to the engine's branch
  -- (qhat=0, alpha<=0 counts as covered) — a NULL qhat would zero
  -- n_covered while the engine does not (ADVICE r15)
  SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
         CAST(SUM(CASE WHEN t.alpha <= COALESCE(q.q, 0) THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
  FROM tagged t, qhat q WHERE NOT t.is_cal
)
SELECT kk.n_cal AS n_calib, cov.n_test, CAST(COALESCE(q.q, 0) AS BIGINT) AS qhat,
       cov.n_covered,
       ROUND(CAST(cov.n_covered AS DOUBLE) / NULLIF(CAST(cov.n_test AS DOUBLE), 0.0), 6) AS coverage,
       ROUND({(1_000_000 - _CONF_ALPHA_PPM)} / 1000000.0, 6) AS target
FROM cov, qhat q, kk
"""


@query("eval_conformal_coverage", oracle=_CONF_SQL, defer=True)
def eval_conformal_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal coverage audit of the en-detector nonconformity:
    the md5-parity calibration split, the exact-integer order-statistic
    threshold, and held-out coverage vs the 1-a target — DuckDB replays
    split, threshold, and coverage."""
    return conformal_coverage(_docs(spark, sf_dir))


# --- information value / weight of evidence (r15) ------------------------------
#
# The feature-screening number (credit-scoring WoE/IV, standard in any
# tabular curation pass): how much does a feature separate a binary
# label? Buckets are population deciles of the feature assigned on the
# COMPACT (value, pos, neg) count table via cumulative counts — the
# lift_deciles discipline (no corpus-wide sort; the window runs over
# distinct quantized values only). WoE per bucket = ln of the
# smoothed odds ratio (+0.5 on both counts — keeps empty-side buckets
# finite); IV term = (pos share − neg share) · WoE. Counts are exact
# bigints; the ln argument is assembled from exact doubles with ONE
# mirrored parenthesization so libm sees bit-identical input in both
# engines. Scale = one partial-agg count pass + a ≤10-row rollup.

_IV_FP = 1_000_000  # value fixed-point, the events-family convention


def information_value(events: DataFrame) -> DataFrame:
    """(decile, n_rows, n_pos, n_neg, woe, iv_term, iv_total): decile
    WoE table of `value` against the purchase label."""
    rows = events.filter(F.col("value").isNotNull()).select(
        F.floor(F.col("value") * F.lit(float(_IV_FP))).cast("bigint").alias("v"),
        (F.col("event_type") == "purchase").cast("int").alias("label"),
    )
    counts = rows.groupBy("v").agg(
        F.sum("label").cast("bigint").alias("p"),
        F.sum(1 - F.col("label")).cast("bigint").alias("q"),
    ).withColumn("n", F.col("p") + F.col("q"))
    # v = fixed-point `value` — a CONTINUOUS metric, so the distinct-value
    # table grows with event count; the cumulative rank fold uses the
    # two-pass range-partitioned cumsum (r17, the abstats discipline —
    # VERDICT r16 ask #3), never a global window. Grand totals come back
    # as exact driver-side ints.
    from .abstats import _value_cumsums

    cum, tot = _value_cumsums(counts, ["n", "p", "q"])
    ranked = cum.select(
        "p",
        "q",
        F.col("cum_n").alias("cum_n"),
        F.lit(tot["n"]).cast("bigint").alias("total"),
        F.lit(tot["p"]).cast("bigint").alias("total_p"),
        F.lit(tot["q"]).cast("bigint").alias("total_q"),
    ).select(
        F.expr("((cum_n - 1) * 10) div total").cast("int").alias("decile"),
        "p",
        "q",
        "total_p",
        "total_q",
    )
    by_dec = ranked.groupBy("decile", "total_p", "total_q").agg(
        F.sum(F.col("p") + F.col("q")).cast("bigint").alias("n_rows"),
        F.sum("p").cast("bigint").alias("n_pos"),
        F.sum("q").cast("bigint").alias("n_neg"),
    )
    woe = F.log(
        ((F.col("n_pos").cast("double") + F.lit(0.5)) * F.col("total_q").cast("double"))
        / ((F.col("n_neg").cast("double") + F.lit(0.5)) * F.col("total_p").cast("double"))
    )
    iv_term = (
        F.col("n_pos").cast("double") / F.col("total_p").cast("double")
        - F.col("n_neg").cast("double") / F.col("total_q").cast("double")
    ) * woe
    w_dec = Window.partitionBy()  # ≤10 rows
    return (
        by_dec.select(
            "decile", "n_rows", "n_pos", "n_neg",
            F.round(woe, 6).alias("woe"),
            F.round(iv_term, 6).alias("iv_term"),
            F.round(F.sum(iv_term).over(w_dec), 6).alias("iv_total"),
        )
        .orderBy("decile")
    )


_IV_SQL = f"""
WITH rows_ AS (
  SELECT CAST(FLOOR(value * {_IV_FP}.0) AS BIGINT) AS v,
         CAST(event_type = 'purchase' AS INT) AS label
  FROM events WHERE value IS NOT NULL
),
counts AS (
  SELECT v, CAST(SUM(label) AS BIGINT) AS p, CAST(SUM(1 - label) AS BIGINT) AS q
  FROM rows_ GROUP BY v
),
ranked AS (
  SELECT ((SUM(p + q) OVER (ORDER BY v) - 1) * 10) // SUM(p + q) OVER () AS decile,
         p, q,
         SUM(p) OVER () AS total_p,
         SUM(q) OVER () AS total_q
  FROM counts
),
by_dec AS (
  SELECT CAST(decile AS INT) AS decile, total_p, total_q,
         CAST(SUM(p + q) AS BIGINT) AS n_rows,
         CAST(SUM(p) AS BIGINT) AS n_pos,
         CAST(SUM(q) AS BIGINT) AS n_neg
  FROM ranked GROUP BY decile, total_p, total_q
),
woe_t AS (
  SELECT decile, n_rows, n_pos, n_neg,
         ln(((CAST(n_pos AS DOUBLE) + 0.5) * CAST(total_q AS DOUBLE))
            / ((CAST(n_neg AS DOUBLE) + 0.5) * CAST(total_p AS DOUBLE))) AS woe_raw,
         (CAST(n_pos AS DOUBLE) / CAST(total_p AS DOUBLE)
          - CAST(n_neg AS DOUBLE) / CAST(total_q AS DOUBLE)) AS share_gap
  FROM by_dec
)
SELECT decile, n_rows, n_pos, n_neg,
       ROUND(woe_raw, 6) AS woe,
       ROUND(share_gap * woe_raw, 6) AS iv_term,
       ROUND(SUM(share_gap * woe_raw) OVER (), 6) AS iv_total
FROM woe_t
ORDER BY decile
"""


@query("eval_information_value", oracle=_IV_SQL)
def eval_information_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile weight-of-evidence table of event value vs the purchase
    label, with the summed information value — exact-bigint counts, one
    mirrored ln per bucket."""
    return information_value(tpch.load(spark, sf_dir, "events"))
