"""Deterministic random-projection dimensionality reduction (r13).

Johnson–Lindenstrauss in its cheapest practical form (Achlioptas 2001:
a ±1 sign matrix preserves pairwise distances in expectation just like
Gaussian projections): dim-64 fixed-point embeddings project to
``_RP_K = 16`` dimensions through a ±1 matrix whose every entry derives
from md5("rp:<j>:<i>") parity — no RNG, no stored model, the "model" is
a pure function both engines regenerate bit-identically, inlined into
the plan as literals (KB-sized: k×d = 1024 signs).

Why it earns a place in the pipeline: a 4× narrower vector makes every
downstream geometric pass (k-means assignment, brute-force shortlist,
pair verification) ~4× cheaper in FLOPs AND bytes shuffled, at the JL
distance-distortion cost — the standard shortlist-then-rerank trade.
``ann_rp_topk`` registers exactly that serving shape: RP-space exact
int64 L2 top-k (a shuffle-free projection + TakeOrderedAndProject — no
Exchange in the plan, pinned), with the JL recall measured by pytest
against the exact full-dimension answer and re-rank left to the
existing ``pq.pq_search_rerank`` / ``quant.sq_search_rerank`` shape.

Exactness: inputs are the engine-standard 1e7 fixed-point bigints
(``similarity.quantize``); a projected coordinate is a 64-term signed
sum of bigints (|y_j| < 64·1e7·max|x| — far inside int64), and the
distance is a 16-term sum of squared bigint deltas. Every number in
both engines is the same int64, so the oracle hash-matches exactly.

ref: no reference counterpart — dimensionality reduction extends the
embedding family (hashembed.py, quant.py) the way the reference's
derived columns extend its facts (scripts/gold/ddl_gold.sql:63).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch
from .similarity import SQL_QUANT, _SCALE, quantize

_RP_K = 16  # output dims
_RP_D = 64  # input dims (the fixture embedding width)


def rp_signs(k: int = _RP_K, d: int = _RP_D) -> list[list[int]]:
    """The deterministic ±1 projection matrix: entry (j, i) is +1 when
    md5("rp:<j>:<i>")'s 13-hex prefix is even, else −1 — regenerable by
    any engine, no stored model."""
    return [
        [
            1
            if int(hashlib.md5(f"rp:{j}:{i}".encode()).hexdigest()[:13], 16) % 2 == 0
            else -1
            for i in range(d)
        ]
        for j in range(k)
    ]


def _proj_cols(q: Column, signs: list[list[int]]) -> Column:
    """ARRAY of k projected coordinates: y_j = Σ_i q[i]·s[j][i]. The sign
    matrix enters as ONE nested-array literal folded by HOFs — an earlier
    draft unrolled the k×d = 1024 multiply-add nodes into the expression
    tree and paid ~4.8 s of Catalyst analysis PER RUN on a 500-row input
    (planning, not execution); the literal+HOF form plans in milliseconds
    and the per-row loop is trivial next to the scan."""
    return F.transform(
        F.lit(signs),
        lambda row: F.aggregate(
            F.zip_with(q, row, lambda a, b: a * b),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ),
    )


def rp_project(emb: DataFrame, k: int = _RP_K) -> DataFrame:
    """(vec_id, label, y): the k-dim projected fixed-point vectors — the
    narrow frame downstream passes (clustering, shortlists) run on."""
    signs = rp_signs(k=k)
    q = quantize(F.col("embedding"))
    return emb.select("vec_id", "label", _proj_cols(q, signs).alias("y"))


def rp_topk(emb: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """(vec_id, label, pdist): top-k nearest to ``query_vec_id`` by EXACT
    int64 squared L2 in the projected space (the query row is excluded).
    The query's projected vector rides a broadcast cross join; the scan
    is one narrow projection into TakeOrderedAndProject — no Exchange."""
    proj = rp_project(emb)
    qrow = F.broadcast(
        proj.filter(F.col("vec_id") == query_vec_id).select(F.col("y").alias("qy"))
    )
    pdist = F.aggregate(
        F.zip_with(F.col("y"), F.col("qy"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return (
        proj.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(qrow)
        .select("vec_id", "label", pdist.alias("pdist"))
        .orderBy(F.asc("pdist"), F.asc("vec_id"))
        .limit(k)
    )


def _rp_sql(k: int = _RP_K, topk: int = 10) -> str:
    signs = rp_signs(k=k)
    legs = ",\n          ".join(
        "("
        + " + ".join(
            (f"q[{i + 1}]" if s > 0 else f"-q[{i + 1}]")
            for i, s in enumerate(row)
        )
        + ")"
        for row in signs
    )
    return f"""
WITH quant AS (
  SELECT vec_id, label, {SQL_QUANT} AS q FROM embeddings
),
proj AS (
  SELECT vec_id, label,
         [{legs}] AS y
  FROM quant
),
qv AS (SELECT y AS qy FROM proj WHERE vec_id = 0)
SELECT p.vec_id, p.label,
       CAST(list_sum([(p.y[i+1] - qv.qy[i+1]) * (p.y[i+1] - qv.qy[i+1])
                      FOR i IN range(len(p.y))]) AS BIGINT) AS pdist
FROM proj p CROSS JOIN qv
WHERE p.vec_id <> 0
ORDER BY pdist ASC, vec_id ASC
LIMIT {topk}
"""


_ANN_RP_SQL = _rp_sql()


@query("ann_rp_topk", oracle=_ANN_RP_SQL, headline=True, defer=True)
def ann_rp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-projection ANN: dim-64 vectors JL-projected to 16 dims
    through the deterministic ±1 md5-sign matrix, exact int64 L2 top-10
    in the projected space — the 4×-cheaper shortlist stage, zero
    Exchange (pure projection + TakeOrderedAndProject)."""
    return rp_topk(tpch.load(spark, sf_dir, "embeddings"))
