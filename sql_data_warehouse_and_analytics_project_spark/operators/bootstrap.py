"""Poisson-bootstrap confidence intervals — distributed, deterministic.

Eval infrastructure: any corpus-level point metric needs an uncertainty
estimate, and the classical resample-with-replacement bootstrap is
unshardable (a replica needs a global sample). The Poisson bootstrap
(Hanley & MacGibbon 2006; the standard large-scale variant) replaces it
with an independent Poisson(1) weight per (row, replica) — embarrassingly
row-parallel, one groupBy per statistic.

Determinism and the oracle: the weight is the inverse Poisson(1) CDF
applied to the engine-wide md5-13-hex uniform of (doc_id, replica), so
both engines draw IDENTICAL integer weights; per-replica weighted sums
are integer×integer (exact in any order — no fold discipline needed),
the replica means divide as doubles, and the CI bounds are exact linear
interpolation percentiles (F.percentile ≡ quantile_cont, the engine's
established pair). Cumulative-CDF thresholds are Python-formatted
double literals injected into BOTH engines' expressions.

Scale shape: the explode is corpus × B rows of three narrow ints — the
inherent bootstrap cost, sharded by (doc, replica) with map-side
partial aggregation; B replica rows then reduce on the driver-sized
side. No reference counterpart — eval extension.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch
from .dedup import _md5_long, _sql_md5_long

_B = 200  # bootstrap replicas
_ALPHA = 0.05  # 95% CI

# inverse Poisson(1) CDF thresholds: P(X <= k) for k = 0..7 — covers all
# but ~1e-8 of the mass; the tail clamps to 8. repr() of the Python
# doubles is injected verbatim into both engines.
_POIS_CDF = []
_acc = 0.0
for _k in range(8):
    _acc += math.exp(-1.0) / math.factorial(_k)
    _POIS_CDF.append(_acc)

_U_SCALE = float(1 << 52)  # md5-13-hex max+1: exact uniform in [0, 1)


def _poisson_weight_col(u: Column) -> Column:
    w = F.lit(8)
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POIS_CDF[k]), F.lit(k)).otherwise(w)
    return w.cast("bigint")


def _poisson_weight_sql(u_expr: str) -> str:
    out = "8"
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        out = f"CASE WHEN {u_expr} < {_POIS_CDF[k]!r} THEN {k} ELSE {out} END"
    return out


def bootstrap_mean_ci(
    rows: DataFrame, value_col: str, id_col: str, b: int = _B, alpha: float = _ALPHA
) -> DataFrame:
    """One row: (n_rows, b_replicas, mean_est, ci_lo, ci_hi) — the point
    mean of ``value_col`` with a Poisson-bootstrap percentile CI.
    ``value_col`` must be integral (exact weighted sums)."""
    u = (
        _md5_long(
            F.concat(F.col(id_col).cast("string"), F.lit(":"), F.col("b").cast("string")),
            13,
        ).cast("double")
        / F.lit(_U_SCALE)
    )
    rep = (
        rows.select(id_col, F.col(value_col).alias("v"))
        .select(id_col, "v", F.explode(F.sequence(F.lit(1), F.lit(b))).alias("b"))
        .select("b", "v", _poisson_weight_col(u).alias("w"))
        .groupBy("b")
        .agg(
            # NULLIF guard (ADVICE r11): a replica whose Poisson weights
            # are ALL zero (probability e^-n — real for tiny corpora this
            # helper is reused on) must be dropped IDENTICALLY by both
            # engines. Unguarded, Spark's Divide yields NULL for 0/0
            # (percentile skips it) but DuckDB's IEEE division yields NaN
            # (quantile_cont propagates it) — a cross-engine mismatch in
            # the degenerate regime. NULLIF makes both sides NULL.
            (
                F.sum(F.col("w") * F.col("v")).cast("double")
                / F.nullif(F.sum("w").cast("double"), F.lit(0.0))
            ).alias("m")
        )
    )
    point = rows.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (F.sum(value_col).cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "mean_est"
        ),
    )
    ci = rep.agg(
        F.count(F.lit(1)).cast("bigint").alias("b_replicas"),
        F.round(F.percentile("m", F.lit(alpha / 2.0)), 6).alias("ci_lo"),
        F.round(F.percentile("m", F.lit(1.0 - alpha / 2.0)), 6).alias("ci_hi"),
    )
    return point.crossJoin(ci).select(
        "n_rows",
        "b_replicas",
        F.round("mean_est", 6).alias("mean_est"),
        "ci_lo",
        "ci_hi",
    )


_U_SQL = (
    "CAST("
    + _sql_md5_long("doc_id || ':' || b", 13)
    + f" AS DOUBLE) / {_U_SCALE!r}"
)

_BOOT_SQL = f"""
WITH rep AS (
  SELECT b,
         CAST(SUM(w * v) AS DOUBLE) / NULLIF(CAST(SUM(w) AS DOUBLE), 0.0) AS m
  FROM (
    SELECT b, n_chars AS v,
           {_poisson_weight_sql(_U_SQL)} AS w
    FROM documents, (SELECT UNNEST(range(1, {_B} + 1)) AS b)
  )
  GROUP BY b
),
point AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_est
  FROM documents
)
SELECT p.n_rows,
       CAST((SELECT COUNT(*) FROM rep) AS BIGINT) AS b_replicas,
       ROUND(p.mean_est, 6) AS mean_est,
       ROUND((SELECT quantile_cont(m, {_ALPHA / 2.0!r}) FROM rep), 6) AS ci_lo,
       ROUND((SELECT quantile_cont(m, {1.0 - _ALPHA / 2.0!r}) FROM rep), 6) AS ci_hi
FROM point p
"""


@query("eval_bootstrap_mean_chars", oracle=_BOOT_SQL, defer=True)
def eval_bootstrap_mean_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% Poisson-bootstrap CI for the corpus mean document length
    (n_chars), 200 replicas — every replica's weights drawn from the
    shared md5 uniform so both engines compute the identical CI."""
    docs = tpch.load(spark, sf_dir, "documents")
    return bootstrap_mean_ci(docs, value_col="n_chars", id_col="doc_id")
