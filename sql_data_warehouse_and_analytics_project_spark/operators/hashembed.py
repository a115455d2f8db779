"""Feature-hashed text embeddings: engine-generated document vectors.

Every vector operator in this engine (ANN brute/IVF/PQ/SQ, kNN join,
k-means, SemDeDup, triplets, quantization) consumes the pre-computed
`embeddings` table; this module closes the loop by GENERATING vectors
from text inside the engine — the hashing-trick embedding (Weinberger et
al. 2009): each token's md5 picks one of ``dim`` buckets and a ±1 sign,
signed counts accumulate per bucket, and the vector is L2-normalized.
Not a learned embedding — it is the deterministic, vocabulary-free
baseline that makes text → vector → ANN/cluster/dedup a single-engine
pipeline (plug a real encoder behind the same schema via mapInPandas
when model inference is available).

Cross-engine determinism: one md5 per token (bucket = h mod dim, sign =
bit 6 of h — disjoint from the bucket bits), exact integer accumulation,
L2 norm from an exact integer sum of squares, components rounded to
6 dp — the only doubles are the final sqrt/divide on exact inputs.
Output is EXPLODED (doc_id, pos, value) so the driver's row hash never
depends on array stringification.

Scale shape: RELATIONAL, not a per-row wide HOF — a dim-wide
aggregate-inside-transform expression compiles to a pathological
per-document loop (measured ~0.6 s/doc); instead the token stream
explodes to (doc, bucket, sign) and two partial-agg groupBys build the
components and the norm, with a per-doc dims spine filling the zeros.
The shuffle carries at most dim rows per document.

ref: extension beyond the reference (no vector surface there); public
textbook method.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch

_DIM = 64  # embedding width — matches the embeddings fixture table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.load(spark, sf_dir, "documents")


def hash_embedding_rows(docs: DataFrame, dim: int = _DIM) -> DataFrame:
    """(doc_id, pos, value): L2-normalized hashed-trick embedding
    components for every document (all ``dim`` positions present,
    zero-filled) — see the module note. A document with zero norm (no
    tokens) emits an all-zero vector."""
    from .dedup import _md5_long, _spread_rows

    docs = _spread_rows(docs)
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    h = _md5_long(F.col("t"), 13)
    sign = F.when(F.shiftright(h, 6) % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
    contrib = (
        docs.select("doc_id", F.explode(toks).alias("t"))
        .select(
            "doc_id",
            F.pmod(h, F.lit(dim)).cast("int").alias("pos"),
            sign.alias("s"),
        )
        .groupBy("doc_id", "pos")
        .agg(F.sum("s").cast("bigint").alias("v"))
    )
    norm2 = contrib.groupBy("doc_id").agg(
        F.sum(F.col("v") * F.col("v")).cast("bigint").alias("norm2")
    )
    spine = docs.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(dim - 1))).alias("pos")
    )
    value = F.when(
        F.coalesce(F.col("norm2"), F.lit(0)) > 0,
        F.round(
            F.coalesce(F.col("v"), F.lit(0)).cast("double")
            / F.sqrt(F.col("norm2").cast("double")),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return (
        spine.join(contrib, ["doc_id", "pos"], "left")
        .join(norm2, "doc_id", "left")
        .select("doc_id", "pos", value.alias("value"))
        .orderBy("doc_id", "pos")
    )


def hash_embeddings(docs: DataFrame, dim: int = _DIM) -> DataFrame:
    """(doc_id, embedding array<double>): the array view for composing
    with the ANN/cluster operators — assembled from the relational rows
    by a position-sorted collect (per-doc list of ``dim`` floats)."""
    rows = hash_embedding_rows(docs, dim)
    return rows.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "value"))),
            lambda s: s["value"],
        ).alias("embedding")
    )


def _embed_sql(dim: int = _DIM) -> str:
    from .dedup import _sql_md5_long

    h = _sql_md5_long("t", 13)
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS ts
  FROM documents
),
hs AS (
  SELECT doc_id, UNNEST([{h} FOR t IN ts]) AS h FROM toks
),
contrib AS (
  SELECT doc_id, CAST(h % {dim} AS INT) AS pos,
         CAST(SUM(CASE WHEN (h >> 6) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS v
  FROM hs GROUP BY doc_id, pos
),
norm2 AS (
  SELECT doc_id, CAST(SUM(v * v) AS BIGINT) AS norm2 FROM contrib GROUP BY doc_id
),
spine AS (
  SELECT doc_id, CAST(UNNEST(range(0, {dim})) AS INT) AS pos FROM documents
)
SELECT s.doc_id, s.pos,
       CASE WHEN COALESCE(n.norm2, 0) > 0
            THEN ROUND(CAST(COALESCE(c.v, 0) AS DOUBLE)
                       / sqrt(CAST(n.norm2 AS DOUBLE)), 6)
            ELSE 0.0 END AS value
FROM spine s
LEFT JOIN contrib c ON c.doc_id = s.doc_id AND c.pos = s.pos
LEFT JOIN norm2 n ON n.doc_id = s.doc_id
ORDER BY s.doc_id, s.pos
"""


_EMBED_SQL = _embed_sql()


@query("embed_hash_text", oracle=_EMBED_SQL, defer=True)
def embed_hash_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-trick document embeddings (64-dim, L2-normalized), exploded
    to (doc_id, pos, value) — the engine-generated vector input that
    makes text → ANN/cluster/dedup a single-engine pipeline."""
    return hash_embedding_rows(_docs(spark, sf_dir))
