"""Int8 scalar-quantization calibration for embedding columns.

Serving a 100 TB vector corpus at float32 is 4x the bytes it needs to
be: the standard first compression step (FAISS ScalarQuantizer, the
int8 path every vector DB ships) is per-dimension min/max calibration —
code = round((v - mn_d) / (mx_d - mn_d) * 255) — and the operational
question calibration answers is "what reconstruction error does int8
cost on MY corpus, per dimension?". This module computes the
calibration table and the error profile in two narrow passes; the PQ
family (pq.py) is the heavier 32x alternative, this is the cheap 4x
one, and the two compose (FAISS IVF-SQ8 shape).

Cross-engine discipline — everything integer, nothing order-sensitive:
values enter through the engine's established 1e7 fixed-point quantize
(similarity.quantize, exact in every engine), per-dim bounds are
integer MIN/MAX, the int8 code uses the integer round-half-up identity
round(a/b) = (2a + b) DIV (2b) (a, b >= 0), dequantization the same,
and the per-dim error aggregate sums BIGINT absolute errors — exact in
any partition order, no fold discipline needed (the same trick that
makes the bootstrap's weighted sums order-free). The only doubles are
the final display divisions, one fixed parenthesization in both
engines.

Scale shape: posexplode to (corpus x dim) narrow int rows, one
partial-aggregating groupBy(pos) for bounds (dim rows out), broadcast
those bounds back onto the exploded rows, one more partial-aggregating
groupBy(pos) for the error profile. Two shuffles of int rows, a
dim-sized broadcast, no windows, no joins wider than the dim table.
No reference counterpart (`/root/reference/` is T-SQL warehousing) —
vector-infrastructure extension; public textbook method.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch
from .similarity import _SCALE, quantize

_LEVELS = 255  # int8 code range 0..255


def quant_calibration(emb: DataFrame, levels: int = _LEVELS) -> DataFrame:
    """Per-dimension int8 calibration + reconstruction-error profile of
    an embeddings frame (vec_id, embedding array<float>): one row per
    dimension — (pos, n_rows, mn_val, mx_val, mean_abs_err, max_abs_err),
    ordered by pos. Errors are measured in the original value scale
    against the round-trip code -> dequantized value; a constant
    dimension (mx = mn) codes to 0 with zero error."""
    expl = emb.select(
        "vec_id", F.posexplode(quantize(F.col("embedding"))).alias("pos", "qv")
    )
    dims = expl.groupBy("pos").agg(
        F.min("qv").alias("mn"), F.max("qv").alias("mx")
    )
    lv = int(levels)
    joined = (
        expl.join(F.broadcast(dims), "pos")
        .withColumn("rng", F.col("mx") - F.col("mn"))
        .withColumn(
            "code",
            F.when(F.col("rng") == 0, F.lit(0).cast("bigint")).otherwise(
                F.expr(f"(2 * {lv} * (qv - mn) + rng) DIV (2 * rng)")
            ),
        )
        .withColumn(
            "deq", F.expr(f"mn + (2 * code * rng + {lv}) DIV (2 * {lv})")
        )
        .withColumn("err", F.abs(F.col("qv") - F.col("deq")))
    )
    scale = float(_SCALE)
    return (
        joined.groupBy("pos")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("mn").alias("mn_i"),
            F.min("mx").alias("mx_i"),
            F.sum("err").cast("bigint").alias("sum_err"),
            F.max("err").cast("bigint").alias("max_err"),
        )
        .select(
            "pos",
            "n_rows",
            F.round(F.col("mn_i").cast("double") / F.lit(scale), 6).alias("mn_val"),
            F.round(F.col("mx_i").cast("double") / F.lit(scale), 6).alias("mx_val"),
            F.round(
                F.col("sum_err").cast("double")
                / (F.col("n_rows").cast("double") * F.lit(scale)),
                6,
            ).alias("mean_abs_err"),
            F.round(F.col("max_err").cast("double") / F.lit(scale), 6).alias(
                "max_abs_err"
            ),
        )
        .orderBy("pos")
    )


_QUANT_CAL_SQL = f"""
WITH quant AS (
  SELECT vec_id, [CAST(FLOOR(CAST(x AS DOUBLE) * {_SCALE!r}) AS BIGINT) FOR x IN embedding] AS q
  FROM embeddings
),
expl AS (
  SELECT vec_id, UNNEST(range(len(q))) AS pos, UNNEST(q) AS qv FROM quant
),
dims AS (
  SELECT pos, MIN(qv) AS mn, MAX(qv) AS mx FROM expl GROUP BY pos
),
coded AS (
  SELECT e.pos, e.qv, d.mn, d.mx, d.mx - d.mn AS rng,
         CASE WHEN d.mx - d.mn = 0 THEN 0
              ELSE (2 * {_LEVELS} * (e.qv - d.mn) + (d.mx - d.mn)) // (2 * (d.mx - d.mn))
         END AS code
  FROM expl e JOIN dims d USING (pos)
),
errs AS (
  SELECT pos, qv, mn, mx,
         ABS(qv - (mn + (2 * code * rng + {_LEVELS}) // (2 * {_LEVELS}))) AS err
  FROM coded
)
SELECT pos,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND(CAST(MIN(mn) AS DOUBLE) / {_SCALE!r}, 6) AS mn_val,
       ROUND(CAST(MIN(mx) AS DOUBLE) / {_SCALE!r}, 6) AS mx_val,
       ROUND(CAST(CAST(SUM(err) AS BIGINT) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * {_SCALE!r}), 6) AS mean_abs_err,
       ROUND(CAST(MAX(err) AS DOUBLE) / {_SCALE!r}, 6) AS max_abs_err
FROM errs
GROUP BY pos
ORDER BY pos
"""


@query("embed_quant_calibrate", oracle=_QUANT_CAL_SQL, defer=True)
def embed_quant_calibrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 min/max calibration table + per-dimension reconstruction-error
    profile over the embeddings corpus — integer-exact end to end, so
    DuckDB replays codes, dequantization, and error sums bit-for-bit."""
    return quant_calibration(tpch.load(spark, sf_dir, "embeddings"))
