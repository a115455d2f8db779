"""Learned dimensionality reduction: exact distributed PCA over the
embedding corpus.

Complements ``rp.py``'s data-free ±1 random projection with the LEARNED
projection: the top-k principal directions of the corpus itself —
tighter for a fixed k when the data has structure (which real embedding
corpora do), at the cost of one statistics pass.

Architecture — the classic two-phase shape for second-order statistics
on a cluster (same pattern as the k-means / PQ / SQ codebooks already
in the engine: heavy pass distributed, KB-sized model on the driver):

1. **Gram pass (distributed, exact)**: quantize each embedding to
   GRAM_SCALE fixed-point bigints, posexplode the upper-triangle index
   pairs (i ≤ j: d(d+1)/2 = 2080 terms for d=64) and partial-agg
   ``SUM(qi*qj)`` per (i, j). The explode is a CPU-side row generator;
   map-side combine collapses every partition to ≤ 2080 groups before
   the exchange, so the SHUFFLE is KB-sized regardless of corpus size —
   the d² blow-up never crosses the wire. Per-dimension sums + count
   ride the same pass shape. All bigint, so the DuckDB oracle
   hash-matches the full matrix (`embed_gram_matrix`).
2. **Eigen phase (driver, KB state)**: mean-center the exact Gram into
   a covariance matrix (float, 64×64 — model-sized), ``numpy.linalg.
   eigh``, keep the top-k eigenvectors with a deterministic sign
   convention (largest-|component| coordinate made positive).
3. **Projection (distributed, zero-shuffle)**: y = Vᵀ(x − μ) as k
   dot-product HOFs over the raw float array — a narrow per-row
   projection, broadcast-free (the model inlines as plan literals,
   KB-sized like ``rp.py``'s sign matrix).

GRAM_SCALE is 1e3 (not the engine-standard 1e7 of ``similarity._SCALE``)
so the pass is overflow-safe at cluster scale: |q| ≤ ~1e3 ⇒ each
product ≤ ~1e6 ⇒ int64 holds the sum past 9e12 rows; at 1e7 the same
bound would be 9e4 rows. The quantization error only perturbs the
ESTIMATED directions (third decimal of a correlation), not correctness
of the pipeline — and the Gram itself stays exact/oracle-able.

Eigendecomposition is driver-side and not SQL-expressible, so the
projection leg is pytest-verified against an independent numpy PCA
(`tests/test_pca.py`); the Gram leg carries the hard cross-engine
oracle. No reference counterpart — embedding-infrastructure extension
(Pearson 1901; Halko et al. 2011 motivates the one-pass statistics
shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch

GRAM_SCALE = 1000.0  # overflow-safe fixed point for second-order sums
DIM = 64
PCA_K = 16


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.load(spark, sf_dir, "embeddings")


def _quant_gram(col):
    return F.transform(col, lambda x: F.floor(x.cast("double") * F.lit(GRAM_SCALE)).cast("bigint"))


def gram_matrix(embs: DataFrame) -> DataFrame:
    """(i, j, s) with i ≤ j: exact upper-triangle Gram matrix
    Σ_rows q_i·q_j of the GRAM_SCALE-quantized embeddings."""
    q = embs.select(_quant_gram(F.col("embedding")).alias("q"))
    left = q.select(F.posexplode("q").alias("i", "qi"), F.col("q"))
    pairs = left.select(
        "i", "qi", F.posexplode("q").alias("j", "qj")
    ).filter(F.col("i") <= F.col("j"))
    return (
        pairs.groupBy("i", "j")
        .agg(F.sum(F.col("qi") * F.col("qj")).cast("bigint").alias("s"))
        .orderBy("i", "j")
    )


def dim_stats(embs: DataFrame) -> DataFrame:
    """(i, s, n): exact per-dimension quantized sums and the row count —
    the first-order leg the covariance centering needs."""
    q = embs.select(_quant_gram(F.col("embedding")).alias("q"))
    return (
        q.select(F.posexplode("q").alias("i", "qi"))
        .groupBy("i")
        .agg(
            F.sum("qi").cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .orderBy("i")
    )


_SQL_QUANT_GRAM = "[CAST(FLOOR(CAST(x AS DOUBLE) * 1000.0) AS BIGINT) FOR x IN embedding]"

_GRAM_SQL = f"""
WITH quant AS (
  SELECT {_SQL_QUANT_GRAM} AS q FROM embeddings
),
pairs AS (
  SELECT iv.i - 1 AS i, jv.j - 1 AS j, q[iv.i] * q[jv.j] AS prod
  FROM quant,
       UNNEST(range(1, len(q) + 1)) iv(i),
       UNNEST(range(1, len(q) + 1)) jv(j)
  WHERE iv.i <= jv.j
)
SELECT i, j, CAST(SUM(prod) AS BIGINT) AS s
FROM pairs
GROUP BY i, j
ORDER BY i, j
"""


@query("embed_gram_matrix", oracle=_GRAM_SQL, defer=True)
def embed_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact upper-triangle Gram matrix of the quantized embedding corpus —
    the distributed statistics pass behind the learned PCA projection."""
    return gram_matrix(_embs(spark, sf_dir))


def correlation_matrix(embs: DataFrame) -> DataFrame:
    """(i, j, r) with i < j: Pearson correlation per dimension pair —
    feature-redundancy profiling from the SAME exact statistics pass as
    the PCA (Gram + per-dim sums + count, all bigints), so the float
    work is one final expression over identical integers in both
    engines:  r = (n·S_ij − S_i·S_j) / (√(n·S_ii − S_i²)·√(n·S_jj − S_j²)).
    The bigints are cast to double BEFORE the products (n·S_ij would
    overflow int64 at cluster-scale row counts); every join input is the
    KB-sized statistics table."""
    g = gram_matrix(embs)
    diag = g.filter(F.col("i") == F.col("j")).select(
        F.col("i").alias("k"), F.col("s").cast("double").alias("skk")
    )
    sums = dim_stats(embs).select(
        F.col("i").alias("k"),
        F.col("s").cast("double").alias("sk"),
        F.col("n").cast("double").alias("n"),
    )
    off = g.filter(F.col("i") < F.col("j")).select("i", "j", F.col("s").cast("double").alias("sij"))
    da = diag.select(F.col("k").alias("i"), F.col("skk").alias("sii"))
    db = diag.select(F.col("k").alias("j"), F.col("skk").alias("sjj"))
    sa = sums.select(F.col("k").alias("i"), F.col("sk").alias("si"), "n")
    sb = sums.select(F.col("k").alias("j"), F.col("sk").alias("sj"))
    num = F.col("n") * F.col("sij") - F.col("si") * F.col("sj")
    den = F.sqrt(F.col("n") * F.col("sii") - F.col("si") * F.col("si")) * F.sqrt(
        F.col("n") * F.col("sjj") - F.col("sj") * F.col("sj")
    )
    return (
        off.join(da, "i")
        .join(db, "j")
        .join(sa, "i")
        .join(sb, "j")
        .select("i", "j", F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("r"))
        .orderBy("i", "j")
    )


_CORR_SQL = f"""
WITH quant AS (
  SELECT {_SQL_QUANT_GRAM} AS q FROM embeddings
),
pairs AS (
  SELECT iv.i - 1 AS i, jv.j - 1 AS j, q[iv.i] * q[jv.j] AS prod
  FROM quant,
       UNNEST(range(1, len(q) + 1)) iv(i),
       UNNEST(range(1, len(q) + 1)) jv(j)
  WHERE iv.i <= jv.j
),
gram AS (
  SELECT i, j, CAST(SUM(prod) AS BIGINT) AS s FROM pairs GROUP BY i, j
),
sums AS (
  SELECT iv.i - 1 AS i, CAST(SUM(q[iv.i]) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM quant, UNNEST(range(1, len(q) + 1)) iv(i)
  GROUP BY iv.i - 1
)
SELECT g.i, g.j,
       ROUND((CAST(a.n AS DOUBLE) * CAST(g.s AS DOUBLE)
              - CAST(a.s AS DOUBLE) * CAST(b.s AS DOUBLE))
             / NULLIF(sqrt(CAST(a.n AS DOUBLE) * CAST(da.s AS DOUBLE)
                           - CAST(a.s AS DOUBLE) * CAST(a.s AS DOUBLE))
                      * sqrt(CAST(a.n AS DOUBLE) * CAST(db.s AS DOUBLE)
                             - CAST(b.s AS DOUBLE) * CAST(b.s AS DOUBLE)), 0.0),
             6) AS r
FROM gram g
JOIN gram da ON da.i = g.i AND da.j = g.i
JOIN gram db ON db.i = g.j AND db.j = g.j
JOIN sums a ON a.i = g.i
JOIN sums b ON b.i = g.j
WHERE g.i < g.j
ORDER BY g.i, g.j
"""


@query("embed_correlation_matrix", oracle=_CORR_SQL, defer=True)
def embed_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of the embedding dimensions — the
    feature-redundancy audit from the exact PCA statistics pass."""
    return correlation_matrix(_embs(spark, sf_dir))


def pca_model(embs: DataFrame, k: int = PCA_K):
    """(components, mean): top-k principal directions from the exact
    Gram/dim-sum passes — numpy eigh on the KB-sized driver-side
    covariance, deterministic sign (largest-|coord| positive).

    ``components`` is a (k, d) list-of-lists in the ORIGINAL float
    units; ``mean`` the per-dimension float means."""
    g_rows = gram_matrix(embs).collect()  # ≤ d(d+1)/2 rows — KB driver state
    d_rows = dim_stats(embs).collect()  # d rows
    return eigen_from_stats(g_rows, d_rows, k)


def _eigen_decomp(g_rows, d_rows):
    """Full-rank eigen phase over collected (i, j, s) Gram rows and
    (i, s, n) dim rows: (eigvals_desc, components_desc (d, d) ndarray
    with the deterministic sign convention, mean (d,) in float units).
    Shared by :func:`eigen_from_stats` (top-k slice) and the OPQ
    rotation (``operators.opq``, which also needs the eigenvalues for
    its allocation step)."""
    import numpy as np

    d = max(r["i"] for r in d_rows) + 1
    n = d_rows[0]["n"]
    sums = np.zeros(d)
    for r in d_rows:
        sums[r["i"]] = r["s"]
    gram = np.zeros((d, d))
    for r in g_rows:
        gram[r["i"], r["j"]] = r["s"]
        gram[r["j"], r["i"]] = r["s"]
    mean_q = sums / n
    cov = gram / n - np.outer(mean_q, mean_q)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1]
    comps = vecs[:, order].T  # (d, d), unit-norm columns from eigh
    for row in comps:  # deterministic sign: largest-|coord| positive
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    return vals[order], comps, mean_q / GRAM_SCALE


def eigen_from_stats(g_rows, d_rows, k: int = PCA_K):
    """The driver-side eigen phase over collected (i, j, s) Gram rows and
    (i, s, n) dim rows — shared by the batch model and the streaming
    statistics state (``streaming.jobs.stream_pca_model``)."""
    _, comps, mean = _eigen_decomp(g_rows, d_rows)
    return comps[:k].tolist(), mean.tolist()


def pca_project(embs: DataFrame, components, mean) -> DataFrame:
    """(vec_id, label, y): k-dim learned projection y = V(x − μ) — k
    zip_with/aggregate dot products per row, zero Exchange (the model
    inlines as plan literals, the rp.py precedent)."""
    mean_arr = F.array(*[F.lit(float(m)) for m in mean])
    centered = F.zip_with(
        F.transform(F.col("embedding"), lambda x: x.cast("double")),
        mean_arr,
        lambda x, m: x - m,
    )
    comp_lit = F.lit([[float(v) for v in row] for row in components])
    y = F.transform(
        comp_lit,
        lambda row: F.aggregate(
            F.zip_with(row, F.col("_c"), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    return (
        embs.select("vec_id", "label", centered.alias("_c"))
        .select("vec_id", "label", y.alias("y"))
    )


@query("embed_pca_project", oracle=None)
def embed_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned top-16 PCA projection of the embedding corpus (rows-only:
    the eigen phase is driver-side numpy, not SQL-expressible — the Gram
    statistics it consumes carry the hard oracle in
    ``embed_gram_matrix``; projection semantics are pytest-verified
    against an independent numpy PCA)."""
    embs = _embs(spark, sf_dir)
    comps, mean = pca_model(embs)
    return pca_project(embs, comps, mean).orderBy("vec_id")
