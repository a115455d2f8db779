"""Training-shard export — the last-mile job that turns the curated corpus
into the sharded, manifest-described dataset a trainer actually reads
(north-star extension; the reference's closest analog is the gold-layer
rebuild at scripts/gold/proc_load_gold.sql, which likewise materializes a
query-facing layout from cleaned inputs).

Composition: curation (quality gate → decontaminate → exact dedup →
near-dedup fixpoint → split) → token counting + hash-lane packing → a
``partitionBy(shard)`` parquet layout where shard = the packing lane, so
(a) a trainer streams any shard independently, (b) shard count auto-sizes
with the corpus (packing's ``auto_pack_buckets``), and (c) every document
carries its (chunk_id, n_bpe_tokens) assignment for loader-side batching.
A KB-sized manifest (one row per shard: docs, chunks, tokens) is written
alongside under ``_manifest`` and returned — the reconciliation surface a
downstream loader validates against before training. Every stage is
deterministic, so re-exporting the same corpus produces bit-identical
shard contents and manifest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .curation import curate_documents
from .packing import _PACK_BUDGET, pack_sequences


def export_training_shards(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    budget: int = _PACK_BUDGET,
    fmt: str = "parquet",
) -> DataFrame:
    """Curate the ``documents`` table at ``sf_dir``, pack the surviving
    train-split docs into token-budget chunks on auto-sized hash lanes,
    and write them under ``<out_path>/shards/shard=N/`` with a manifest.
    Returns the manifest frame (shard, n_docs, n_chunks, n_tokens),
    materialized before return so it reflects what was actually written.
    ``fmt="jsonl"`` writes the shards as JSON-lines files instead of
    parquet — the wire format most training loaders stream directly — with
    the same layout and the manifest (always parquet) reconciling against
    the re-read JSONL, so a schema drift between writer and loader fails
    here, not in the trainer."""
    if fmt not in ("parquet", "jsonl"):
        raise ValueError(f"unsupported shard format {fmt!r}")
    curated, _report = curate_documents(spark, sf_dir)
    train = curated.filter(F.col("split") == "train").select("doc_id", "lang", "text")
    packed = pack_sequences(train, budget=budget).withColumnRenamed("bucket", "shard")
    rows = (
        train.join(packed, "doc_id")
        .select("doc_id", "lang", "text", "shard", "chunk_id", "n_bpe_tokens")
    )
    writer = rows.write.mode("overwrite").partitionBy("shard")
    if fmt == "jsonl":
        writer.json(f"{out_path}/shards")
        shards = spark.read.schema(
            "doc_id bigint, lang string, text string, chunk_id bigint,"
            " n_bpe_tokens bigint, shard int"
        ).json(f"{out_path}/shards")
    else:
        writer.parquet(f"{out_path}/shards")
        shards = spark.read.parquet(f"{out_path}/shards")
    manifest = (
        shards
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("chunk_id").cast("bigint").alias("n_chunks"),
            F.sum("n_bpe_tokens").cast("bigint").alias("n_tokens"),
        )
        .orderBy("shard")
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{out_path}/_manifest")
    return spark.read.parquet(f"{out_path}/_manifest").orderBy("shard")
