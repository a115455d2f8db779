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


@query("corpus_jsd_sources", oracle=_JSD_SQL, defer=True)
def corpus_jsd_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen–Shannon divergence of every source's unigram
    distribution — the re-weighting/drift detector the set-overlap
    fingerprints cannot see."""
    return jsd_source_pairs(tpch.load(spark, sf_dir, "documents"))


# --- Zipf rank-frequency fit (r12) -------------------------------------------
#
# The data-card distribution check: OLS fit of ln(freq) ~ ln(rank) over the
# top-R corpus terms. A natural-language corpus tracks slope ~ -1 (Zipf's
# law); templated/synthetic/boilerplate-heavy corpora bend the tail and the
# fit degrades — slope and r² together are a one-row drift alarm for a
# corpus refresh.
#
# Scale shape: one partial-agg term count, ONE TakeOrderedAndProject top-R
# cut (map-side k-smallest, no global sort), and a 256-row closed-form fit.
# Cross-engine exactness: ranks and counts are exact integers; every
# ln-contribution is summed by the module's rank-ordered fold (identical
# fold order in both engines — the JSD discipline), and the closed form
# runs on those five scalar sums, rounded to 6 dp.

_ZIPF_R = 256  # top terms to fit


def zipf_fit(docs: DataFrame, top_r: int = _ZIPF_R) -> DataFrame:
    """One row (n_terms, slope, intercept, r2): OLS of ln(cnt) on ln(rank)
    over the ``top_r`` most frequent lowered tokens (rank ties broken by
    term asc, so the ranking is engine-exact)."""
    terms = docs.select(
        F.explode(F.transform(tokens_col(F.col("text")), lambda x: F.lower(x))).alias(
            "term"
        )
    )
    counts = terms.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    top = counts.orderBy(F.col("cnt").desc(), "term").limit(top_r)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("cnt").desc(), "term")
    ranked = top.withColumn("rank", F.row_number().over(w)).select(
        F.col("rank").cast("double").alias("r"), F.col("cnt").cast("double").alias("c")
    )
    contrib = F.struct(
        F.col("r").alias("rank"),
        F.log("r").alias("x"),
        F.log("c").alias("y"),
        (F.log("r") * F.log("c")).alias("xy"),
        (F.log("r") * F.log("r")).alias("xx"),
        (F.log("c") * F.log("c")).alias("yy"),
    )

    def fold(field):
        return F.aggregate(
            F.transform(F.sort_array(F.collect_list(contrib)), lambda s: s[field]),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        fold("x").alias("sx"),
        fold("y").alias("sy"),
        fold("xy").alias("sxy"),
        fold("xx").alias("sxx"),
        fold("yy").alias("syy"),
    )
    n = F.col("n_terms").cast("double")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy") * F.col("sy")
    # degenerate guards (r12): < 2 terms has no rank spread (varx = 0) and
    # an all-equal-frequency corpus has vary = 0 — under ANSI mode the
    # unguarded divisions throw DIVIDE_BY_ZERO; emit NULL instead,
    # mirrored by the oracle's CASE guards
    fit_ok = (F.col("n_terms") >= 2) & (varx != 0.0)
    slope = F.when(fit_ok, cov / varx)
    return agg.select(
        "n_terms",
        F.round(slope, 6).alias("slope"),
        F.round(
            F.when(fit_ok, (F.col("sy") - slope * F.col("sx")) / n), 6
        ).alias("intercept"),
        F.round(
            F.when(fit_ok & (vary != 0.0), cov * cov / (varx * vary)), 6
        ).alias("r2"),
    )


_ZIPF_SQL = f"""
WITH terms AS (
  SELECT lower(t.term) AS term
  FROM (SELECT UNNEST({SQL_TOKENS}) AS term FROM documents) t
),
counts AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM terms GROUP BY term),
top AS (SELECT term, cnt FROM counts ORDER BY cnt DESC, term LIMIT {_ZIPF_R}),
ranked AS (
  SELECT CAST(row_number() OVER (ORDER BY cnt DESC, term) AS DOUBLE) AS r,
         CAST(cnt AS DOUBLE) AS c
  FROM top
),
folded AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
         list_reduce(list(ln(r) ORDER BY r), (a, b) -> a + b) AS sx,
         list_reduce(list(ln(c) ORDER BY r), (a, b) -> a + b) AS sy,
         list_reduce(list(ln(r) * ln(c) ORDER BY r), (a, b) -> a + b) AS sxy,
         list_reduce(list(ln(r) * ln(r) ORDER BY r), (a, b) -> a + b) AS sxx,
         list_reduce(list(ln(c) * ln(c) ORDER BY r), (a, b) -> a + b) AS syy
  FROM ranked
)
SELECT n_terms,
       ROUND(CASE WHEN n_terms >= 2 AND n_terms * sxx - sx * sx <> 0.0
                  THEN (n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx)
             END, 6) AS slope,
       ROUND(CASE WHEN n_terms >= 2 AND n_terms * sxx - sx * sx <> 0.0
                  THEN (sy - ((n_terms * sxy - sx * sy)
                              / (n_terms * sxx - sx * sx)) * sx) / n_terms
             END, 6) AS intercept,
       ROUND(CASE WHEN n_terms >= 2 AND n_terms * sxx - sx * sx <> 0.0
                       AND n_terms * syy - sy * sy <> 0.0
                  THEN (n_terms * sxy - sx * sy) * (n_terms * sxy - sx * sy)
                       / ((n_terms * sxx - sx * sx) * (n_terms * syy - sy * sy))
             END, 6) AS r2
FROM folded
"""


@query("corpus_zipf_slope", oracle=_ZIPF_SQL, defer=True)
def corpus_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit over the top-256 corpus terms: slope,
    intercept, r² of ln(freq) ~ ln(rank) — the one-row naturalness /
    drift alarm of the data-card family."""
    return zipf_fit(tpch.load(spark, sf_dir, "documents"))


# --- embedding-space centroid similarity (r12) -------------------------------
#
# Drift in EMBEDDING space, the companion to the unigram JSD above: the
# cosine between every label-cluster pair's centroid. Cosine is invariant
# to the 1/n scaling, so centroids never need a float division — each
# cluster's SUM vector is enough, and with the engine's 1e7 fixed-point
# quantize (similarity.quantize) every sum is an exact bigint (order-free,
# no fold discipline needed). Dot products and norms run in DECIMAL(18,0)
# -> DECIMAL(38,0) exact arithmetic; the only doubles are the final
# sqrt/divide on exact inputs (IEEE-deterministic), rounded to 6 dp.
#
# Scale shape: one posexplode + partial-agg groupBy(label, pos) — the sum
# table is (#labels x dims) rows (KB) however large the corpus — then a
# dims-sized self-join on that tiny table. Mergeable across shards by
# plain SUM per (label, pos).

_CENTROID_SQL = """
WITH quant AS (
  SELECT label,
         [CAST(FLOOR(CAST(x AS DOUBLE) * 10000000.0) AS BIGINT) FOR x IN embedding] AS q
  FROM embeddings
),
ex AS (
  SELECT label, UNNEST(range(len(q))) AS pos, UNNEST(q) AS qv FROM quant
),
sums AS (
  SELECT label, pos, CAST(SUM(qv) AS DECIMAL(18,0)) AS s
  FROM ex GROUP BY label, pos
),
counts AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM embeddings GROUP BY label),
norms AS (
  SELECT label, SUM(s * s) AS norm2 FROM sums GROUP BY label
),
dots AS (
  SELECT a.label AS label_a, b.label AS label_b, SUM(a.s * b.s) AS dot
  FROM sums a JOIN sums b ON a.pos = b.pos AND a.label < b.label
  GROUP BY 1, 2
)
SELECT d.label_a, d.label_b, ca.n AS n_a, cb.n AS n_b,
       ROUND(CAST(d.dot AS DOUBLE)
             / (sqrt(CAST(na.norm2 AS DOUBLE)) * sqrt(CAST(nb.norm2 AS DOUBLE))),
             6) AS cosine
FROM dots d
JOIN norms na ON na.label = d.label_a
JOIN norms nb ON nb.label = d.label_b
JOIN counts ca ON ca.label = d.label_a
JOIN counts cb ON cb.label = d.label_b
ORDER BY label_a, label_b
"""


def centroid_cosine(emb: DataFrame) -> DataFrame:
    """(label_a, label_b, n_a, n_b, cosine): pairwise cosine between every
    label cluster's centroid — exact fixed-point sums, see the section
    note."""
    from .similarity import quantize

    ex = emb.select(
        "label", F.posexplode(quantize(F.col("embedding"))).alias("pos", "qv")
    )
    sums = ex.groupBy("label", "pos").agg(
        F.sum("qv").cast("decimal(18,0)").alias("s")
    )
    counts = emb.groupBy("label").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    norms = sums.groupBy("label").agg(
        F.sum(F.col("s") * F.col("s")).alias("norm2")
    )
    a = sums.alias("a")
    b = sums.alias("b")
    dots = (
        a.join(b, (F.col("a.pos") == F.col("b.pos")) & (F.col("a.label") < F.col("b.label")))
        .groupBy(F.col("a.label").alias("label_a"), F.col("b.label").alias("label_b"))
        .agg(F.sum(F.col("a.s") * F.col("b.s")).alias("dot"))
    )
    na = norms.select(F.col("label").alias("label_a"), F.col("norm2").alias("norm_a"))
    nb = norms.select(F.col("label").alias("label_b"), F.col("norm2").alias("norm_b"))
    ca = counts.select(F.col("label").alias("label_a"), F.col("n").alias("n_a"))
    cb = counts.select(F.col("label").alias("label_b"), F.col("n").alias("n_b"))
    return (
        dots.join(F.broadcast(na), "label_a")
        .join(F.broadcast(nb), "label_b")
        .join(F.broadcast(ca), "label_a")
        .join(F.broadcast(cb), "label_b")
        .select(
            "label_a",
            "label_b",
            "n_a",
            "n_b",
            F.round(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("norm_a").cast("double"))
                    * F.sqrt(F.col("norm_b").cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
        .orderBy("label_a", "label_b")
    )


@query("corpus_centroid_cosine", oracle=_CENTROID_SQL, defer=True)
def corpus_centroid_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise centroid cosine between every embedding label cluster —
    the embedding-space drift/contrast check beside the unigram JSD,
    exact to the last bit until the final sqrt."""
    return centroid_cosine(tpch.load(spark, sf_dir, "embeddings"))


# --- Theil–Sen robust trend (r12) --------------------------------------------
#
# The robust-statistics companion to the OLS Zipf fit: the Theil–Sen
# estimator (median of all pairwise slopes) tolerates up to ~29% outlier
# days, where one logging outage or bot spike drags OLS arbitrarily.
# Scale shape: the corpus collapses to DAY grain first (one partial-agg
# groupBy), so the O(days²) pair join runs on the aggregate — 3 years of
# days is ~1M pairs, nothing. Determinism: slopes are IEEE divisions of
# exact integer deltas; the median picks positional rows under a total
# order (slope, x1, x2), and an even count averages the two middle
# values — identical in both engines.

_SEN_ROUND = 6


def theil_sen_daily_trend(events: DataFrame) -> DataFrame:
    """One row (n_days, n_pairs, sen_slope, sen_intercept): robust linear
    trend of events-per-day over the full log — see the section note."""
    from pyspark.sql import Window

    daily = (
        events.select(F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01")).alias("x"))
        .groupBy("x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    a = daily.alias("a")
    b = daily.alias("b")
    slopes = a.join(b, F.col("a.x") < F.col("b.x")).select(
        F.col("a.x").alias("x1"),
        F.col("b.x").alias("x2"),
        (
            (F.col("b.c") - F.col("a.c")).cast("double")
            / (F.col("b.x") - F.col("a.x")).cast("double")
        ).alias("slope"),
    )

    def _median(df: DataFrame, col: str, order: list) -> DataFrame:
        """One-row (med) frame: positional median under a total order."""
        w = Window.orderBy(*order)
        ranked = df.withColumn("_rn", F.row_number().over(w))
        return ranked.crossJoin(
            F.broadcast(ranked.agg(F.count(F.lit(1)).alias("_n")))
        ).filter(
            # Integer rank selection: floor((n+1)/2) and floor((n+2)/2) pick
            # the single middle for odd n and BOTH middles for even n. Float
            # division here would silently return only the upper middle for
            # even n (the (n+1)/2 comparison never matches a row_number).
            (F.col("_rn") == F.floor((F.col("_n") + 1) / 2))
            | (F.col("_rn") == F.floor((F.col("_n") + 2) / 2))
        ).agg(F.avg(col).alias("med"))

    med_slope = _median(slopes, "slope", ["slope", "x1", "x2"])
    resid = daily.crossJoin(F.broadcast(med_slope)).select(
        "x",
        (F.col("c").cast("double") - F.col("med") * F.col("x").cast("double")).alias(
            "r"
        ),
        F.col("med").alias("slope_med"),
    )
    med_icept = _median(resid, "r", ["r", "x"])
    stats = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    ).crossJoin(F.broadcast(slopes.agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))))
    return (
        stats.crossJoin(F.broadcast(med_slope.select(F.col("med").alias("s"))))
        .crossJoin(F.broadcast(med_icept.select(F.col("med").alias("i"))))
        .select(
            "n_days",
            "n_pairs",
            F.round("s", _SEN_ROUND).alias("sen_slope"),
            F.round("i", _SEN_ROUND).alias("sen_intercept"),
        )
    )


_SEN_SQL = f"""
WITH daily AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
slopes AS (
  SELECT a.x AS x1, b.x AS x2,
         CAST(b.c - a.c AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
  FROM daily a JOIN daily b ON a.x < b.x
),
sl_ranked AS (
  SELECT slope, row_number() OVER (ORDER BY slope, x1, x2) AS rn,
         COUNT(*) OVER () AS n
  FROM slopes
),
med_slope AS (
  SELECT AVG(slope) AS med FROM sl_ranked
  WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
),
resid AS (
  SELECT d.x, CAST(d.c AS DOUBLE) - m.med * CAST(d.x AS DOUBLE) AS r
  FROM daily d CROSS JOIN med_slope m
),
r_ranked AS (
  SELECT r, row_number() OVER (ORDER BY r, x) AS rn, COUNT(*) OVER () AS n
  FROM resid
),
med_icept AS (
  SELECT AVG(r) AS med FROM r_ranked
  WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM slopes) AS n_pairs,
       ROUND(ms.med, {_SEN_ROUND}) AS sen_slope,
       ROUND(mi.med, {_SEN_ROUND}) AS sen_intercept
FROM med_slope ms CROSS JOIN med_icept mi
"""


@query("events_theil_sen_trend", oracle=_SEN_SQL, defer=True)
def events_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of daily event volume — the outlier-immune
    slope a single logging outage cannot drag, computed at day grain
    after one corpus aggregate."""
    return theil_sen_daily_trend(tpch.load(spark, sf_dir, "events"))


# --- categorical association audit (r13) -------------------------------------
#
# Dataset-bias profiling: how entangled are two categorical facets of the
# corpus? If language and source are strongly associated, a source-level
# split leaks language (and vice versa) — the standard contingency-table
# trio quantifies it: mutual information (nats), Pearson chi-square, and
# Cramér's V (chi² normalized to [0, 1]).
#
# Exactness: cell/margin/total counts are exact bigints; each cell's MI
# and chi² term is one float expression over identical integers, and the
# cross-cell sums fold in SORTED (facet_a, facet_b) order (sort_array +
# aggregate ≡ list_reduce(list(... ORDER BY ...)) — the drift-JSD
# idiom). Zero-observed cells never materialize, so chi² uses the
# algebraic identity Σ_all (c−e)²/e = Σ_observed((c−e)²/e − e) + N
# (every absent cell contributes exactly its expectation e, and all
# expectations sum to N).
#
# Scale shape: ONE partial-agg groupBy collapses the corpus to the cell
# table (|langs|·|sources| rows — model-sized); margins, the total and
# the ordered fold all run over that KB table.


def categorical_association(docs: DataFrame, col_a: str = "lang", col_b: str = "source") -> DataFrame:
    """One row (n_docs, n_a, n_b, mi_nats, chi2, cramers_v) for the
    ``col_a`` × ``col_b`` contingency table of ``docs``."""
    cells = docs.groupBy(col_a, col_b).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    ra = cells.groupBy(col_a).agg(F.sum("c").cast("bigint").alias("r"))
    cb = cells.groupBy(col_b).agg(F.sum("c").cast("bigint").alias("s"))
    tot = cells.agg(F.sum("c").cast("bigint").alias("n"))
    joined = cells.join(ra, col_a).join(cb, col_b).crossJoin(tot)
    cd = F.col("c").cast("double")
    rd = F.col("r").cast("double")
    sd = F.col("s").cast("double")
    nd = F.col("n").cast("double")
    e = (rd * sd) / nd
    mi_t = (cd / nd) * F.log((nd * cd) / (rd * sd))
    chi_t = (cd - e) * (cd - e) / e - e
    contrib = F.struct(
        F.col(col_a).alias("a"), F.col(col_b).alias("b"), mi_t.alias("mi"), chi_t.alias("chi")
    )

    def fold(field):
        return F.aggregate(
            F.transform(F.sort_array(F.collect_list(contrib)), lambda x: x[field]),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    chi2_raw = fold("chi") + F.max("n").cast("double")
    k = F.least(
        F.countDistinct(col_a) - F.lit(1), F.countDistinct(col_b) - F.lit(1)
    ).cast("double")
    return joined.agg(
        F.max("n").cast("bigint").alias("n_docs"),
        F.countDistinct(col_a).cast("bigint").alias("n_a"),
        F.countDistinct(col_b).cast("bigint").alias("n_b"),
        F.round(fold("mi"), 6).alias("mi_nats"),
        F.round(chi2_raw, 6).alias("chi2"),
        F.round(
            F.sqrt(chi2_raw / F.nullif(F.max("n").cast("double") * k, F.lit(0.0))), 6
        ).alias("cramers_v"),
    )


_ASSOC_SQL = """
WITH cells AS (
  SELECT lang AS a, source AS b, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY lang, source
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
ra AS (SELECT a, CAST(SUM(c) AS BIGINT) AS r FROM cells GROUP BY a),
cb AS (SELECT b, CAST(SUM(c) AS BIGINT) AS s FROM cells GROUP BY b),
terms AS (
  SELECT cells.a, cells.b,
         (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
           * ln((CAST(n AS DOUBLE) * CAST(c AS DOUBLE))
                / (CAST(r AS DOUBLE) * CAST(s AS DOUBLE))) AS mi_t,
         (CAST(c AS DOUBLE) - (CAST(r AS DOUBLE) * CAST(s AS DOUBLE)) / CAST(n AS DOUBLE))
           * (CAST(c AS DOUBLE) - (CAST(r AS DOUBLE) * CAST(s AS DOUBLE)) / CAST(n AS DOUBLE))
           / ((CAST(r AS DOUBLE) * CAST(s AS DOUBLE)) / CAST(n AS DOUBLE))
           - (CAST(r AS DOUBLE) * CAST(s AS DOUBLE)) / CAST(n AS DOUBLE) AS chi_t
  FROM cells
  JOIN ra ON ra.a = cells.a
  JOIN cb ON cb.b = cells.b
  CROSS JOIN tot
)
SELECT (SELECT n FROM tot) AS n_docs,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM ra) AS n_a,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM cb) AS n_b,
       ROUND(list_reduce(list(mi_t ORDER BY a, b), (x, y) -> x + y), 6) AS mi_nats,
       ROUND(list_reduce(list(chi_t ORDER BY a, b), (x, y) -> x + y)
             + (SELECT CAST(n AS DOUBLE) FROM tot), 6) AS chi2,
       ROUND(sqrt((list_reduce(list(chi_t ORDER BY a, b), (x, y) -> x + y)
                   + (SELECT CAST(n AS DOUBLE) FROM tot))
                  / NULLIF((SELECT CAST(n AS DOUBLE) FROM tot)
                           * CAST(least((SELECT COUNT(*) - 1 FROM ra),
                                        (SELECT COUNT(*) - 1 FROM cb)) AS DOUBLE),
                           0.0)), 6) AS cramers_v
FROM terms
"""


@query("corpus_lang_source_assoc", oracle=_ASSOC_SQL)
def corpus_lang_source_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language × source association audit — mutual information, chi²,
    Cramér's V over the exact contingency table (split-leakage risk
    signal for facet-based corpus splits)."""
    return categorical_association(tpch.load(spark, sf_dir, "documents"))
