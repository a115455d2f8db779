"""Optimized Product Quantization: the learned-rotation recall upgrade to PQ.

Composes the exact distributed PCA (``pca.py``) with the PQ machinery
(``pq.py``) — the r13 VERDICT ask #4. Plain PQ splits the RAW coordinate
axes into M contiguous subspaces; when the corpus is anisotropic (real
embedding corpora are), variance lands unevenly across subspaces and the
per-subspace codebooks waste codewords. OPQ first applies a LEARNED
orthonormal rotation R, chosen so the subspaces carry balanced variance,
then trains/encodes plain PQ on the rotated vectors. Serving cost is
IDENTICAL to flat PQ: the rotation folds into the encode step (corpus
side, one linear pass) and into the driver-side query prep — the ADC scan
still reads M codes per row and sums M LUT lookups.

This is the parametric OPQ variant (Ge et al., "Optimized Product
Quantization", CVPR 2013, §4: eigenvalue allocation): R's rows are the
full-rank principal directions, PERMUTED so that each subspace's product
of eigenvalues (the quantity the per-subspace distortion tracks) is
balanced — a greedy assignment of directions in descending-eigenvalue
order to the subspace with the smallest current log-product. The
iterative OPQ-NP refinement alternates R and codebooks; the parametric
form captures most of the gain with ONE extra statistics pass and keeps
the whole pipeline deterministic (the PCA pass is the exact bigint Gram
pass of ``pca.py`` — oracle-backed via ``embed_gram_matrix``).

Scale shape (100 TB): the rotation is a (d×d) KB literal applied as
zip_with/aggregate HOFs per row — zero Exchange, same plan family as
``pca.pca_project``; everything downstream is the already-plan-pinned PQ
path (partial-agg codebook training, shuffle-free encode,
TakeOrderedAndProject ADC scan).

The eigen/allocation phase is driver-side numpy, not SQL-expressible, so
``ann_opq_topk`` registers rows-only (the ``embed_pca_project``
precedent); recall ≥ flat PQ is pytest-pinned on planted corpora
(tests/test_opq.py), and the statistics the rotation consumes carry the
hard cross-engine oracle in ``embed_gram_matrix``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch
from .pca import DIM, gram_matrix, dim_stats, pca_project, _eigen_decomp
from .pq import _PQ_DSUB, _PQ_K, _PQ_M, _quantized, pq_adc_topk, pq_encode, train_pq_codebooks


def _allocate_dims(eigvals, m_subs: int, dsub: int) -> list[int]:
    """Eigenvalue allocation (Ge et al. 2013 §4.2): assign principal
    directions, in descending-eigenvalue order, to the subspace with the
    smallest current log-eigenvalue-product (ties to the lowest subspace
    id — deterministic). Returns the row permutation: the first ``dsub``
    entries are subspace 0's directions, and so on."""
    buckets: list[list[int]] = [[] for _ in range(m_subs)]
    logp = [0.0] * m_subs
    for i, v in enumerate(eigvals):
        open_b = [b for b in range(m_subs) if len(buckets[b]) < dsub]
        b = min(open_b, key=lambda bb: (logp[bb], bb))
        buckets[b].append(i)
        logp[b] += math.log(max(float(v), 1e-12))
    return [i for bucket in buckets for i in bucket]


def opq_rotation(
    embs: DataFrame, m_subs: int = _PQ_M, dsub: int = _PQ_DSUB
) -> tuple[list[list[float]], list[float]]:
    """(R, mean): the OPQ rotation — full-rank exact PCA (distributed
    bigint Gram pass + driver eigh) with rows permuted by eigenvalue
    allocation. R is (d, d) orthonormal; rotating is y = R(x − μ)."""
    g_rows = gram_matrix(embs).collect()
    d_rows = dim_stats(embs).collect()
    vals, comps, mean = _eigen_decomp(g_rows, d_rows)
    perm = _allocate_dims(vals, m_subs, dsub)
    r = [list(map(float, comps[i])) for i in perm]
    return r, [float(m) for m in mean]


def opq_rotate(embs: DataFrame, rotation, mean) -> DataFrame:
    """(vec_id, label, embedding): the corpus in rotated coordinates —
    a zero-shuffle per-row matmul against the KB rotation literal
    (``pca.pca_project`` with k = d)."""
    return pca_project(embs, rotation, mean).select(
        "vec_id", "label", F.col("y").alias("embedding")
    )


def train_opq(
    embs: DataFrame, m_subs: int = _PQ_M, k: int = _PQ_K, dsub: int = _PQ_DSUB
):
    """(rotation, mean, codebooks): the full OPQ model — learned rotation,
    then plain PQ codebooks trained in the rotated space."""
    rotation, mean = opq_rotation(embs, m_subs, dsub)
    rotated = opq_rotate(embs, rotation, mean)
    codebooks = train_pq_codebooks(rotated, m_subs, k, dsub)
    return rotation, mean, codebooks


def _rotate_query(vec, rotation, mean) -> list[float]:
    """Driver-side y = R(x − μ) for one query vector."""
    centered = [float(x) - float(m) for x, m in zip(vec, mean)]
    return [sum(r[j] * centered[j] for j in range(len(centered))) for r in rotation]


def opq_adc_topk(
    encoded: DataFrame,
    query_vec,
    rotation,
    mean,
    codebooks,
    k: int = 10,
    dsub: int = _PQ_DSUB,
) -> DataFrame:
    """Top-k by ADC distance in the rotated space: rotate + fixed-point
    quantize the query driver-side, then the standard LUT scan — the scan
    itself is byte-identical in cost to flat PQ."""
    from .similarity import _SCALE

    rq = [int(math.floor(x * _SCALE)) for x in _rotate_query(query_vec, rotation, mean)]
    return pq_adc_topk(encoded, rq, codebooks, k=k, dsub=dsub)


@query("ann_opq_topk", oracle=None)
def ann_opq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPQ-compressed ANN over the embeddings table: learned rotation
    (exact PCA + eigenvalue allocation), PQ codebooks in the rotated
    space, ADC top-10 for vec_id 0's vector. Rows-only: the eigen phase
    is driver-side numpy (``embed_pca_project`` precedent) — the Gram
    statistics behind the rotation are oracle-backed in
    ``embed_gram_matrix``, and recall ≥ flat PQ is pytest-pinned
    (tests/test_opq.py)."""
    emb = tpch.load(spark, sf_dir, "embeddings")
    rotation, mean, codebooks = train_opq(emb)
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").collect()
    qvec = [float(v) for v in qrow[0]["embedding"]]
    rotated = opq_rotate(emb, rotation, mean)
    encoded = pq_encode(rotated, codebooks).filter(F.col("vec_id") != 0)
    return opq_adc_topk(encoded, qvec, rotation, mean, codebooks, k=10)
