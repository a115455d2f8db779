"""End-to-end training-data curation: the operators composed as a pipeline.

This is the user story the individual operators exist for — take a raw
document corpus and produce a clean training split, with per-stage
accounting:

    1. quality gate    — Gopher repetition filter (text_quality_gopher rules)
    2. decontaminate   — drop docs sharing a 4-gram with the eval slice
    3. exact dedup     — keep the lowest doc_id per normalized content hash
    4. near dedup      — drop MinHash/LSH near-duplicate partners (keep the
                         lowest doc_id of every near-dup pair)
    5. split           — deterministic hash split into train/valid

Every stage is the library operator, unchanged — this module only wires
them, so the pipeline inherits each stage's scale shape (narrow
projections, broadcast probes, banded LSH; the only corpus-sized shuffles
are the two dedups' key shuffles). Determinism end to end: same input ⇒
byte-identical survivor set, so a 100 TB curation run is resumable and
auditable stage by stage.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import tpch
from . import dedup
from .text import (
    is_eval_doc,
    normalize_content,
    text_decontaminate,
    text_quality_gopher,
)


# Near-dedup iterates to a fixpoint (see curate_documents stage 4); the cap
# bounds adversarial corpora where the LSH bucket cap keeps revealing new
# pairs each pass.
_MAX_NEAR_DEDUP_PASSES = 5


@dataclass(frozen=True)
class CurationReport:
    """Per-stage survivor counts (the audit trail a curation run logs)."""

    n_input: int
    n_after_quality: int
    n_after_decontamination: int
    n_after_exact_dedup: int
    n_after_near_dedup: int
    n_train: int
    n_valid: int
    n_near_dedup_passes: int = 1


def curate_documents(
    spark: SparkSession,
    sf_dir: str,
    valid_fraction_buckets: int = 10,
) -> tuple[DataFrame, CurationReport]:
    """Run the full curation pipeline over the ``documents`` table.

    Returns (curated frame with a ``split`` column, per-stage report).
    The valid split is ``1/valid_fraction_buckets`` of survivors, chosen by
    a deterministic content-independent hash of doc_id (never by position —
    positional splits re-shuffle when upstream filters change)."""
    docs = tpch.load(spark, sf_dir, "documents")
    n_input = docs.count()

    # Each stage materializes its survivor set and TRUNCATES LINEAGE
    # (localCheckpoint): without it, every stage's count() re-runs all
    # earlier stages' joins from the scan — quadratic stage recompute — and
    # the nested plan trees grow multiplicatively (chained persists embed
    # each prior InMemoryRelation; the minhash stage over such a chain blew
    # the driver heap just RENDERING its AQE plan string). A production run
    # checkpoints stage outputs to the lake for the same two reasons;
    # localCheckpoint is the in-session equivalent.
    def _stage(new: DataFrame) -> tuple[DataFrame, int]:
        new = new.localCheckpoint(eager=True)
        return new, new.count()

    # 1. quality gate
    keep_ids = text_quality_gopher(spark, sf_dir).filter(F.col("keep")).select("doc_id")
    survivors, n_quality = _stage(docs.join(keep_ids, "doc_id", "left_semi"))

    # 2. decontamination: drop flagged docs AND the eval slice itself
    # (the slice predicate is text.is_eval_doc — the SAME definition the
    # decontamination flags use, so the two can never drift)
    contaminated = text_decontaminate(spark, sf_dir).select("doc_id")
    survivors, n_decontam = _stage(
        survivors.filter(~is_eval_doc(F.col("doc_id"))).join(
            contaminated, "doc_id", "left_anti"
        )
    )

    # 3. exact dedup: keep the lowest doc_id per normalized content hash
    # (text.normalize_content — the same normalization dedup_exact and the
    # document fingerprint use)
    keeper = (
        survivors.select(F.sha2(normalize_content(F.col("text")), 256).alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    survivors, n_exact = _stage(survivors.join(keeper, "doc_id", "left_semi"))

    # 4. near dedup to a FIXPOINT: drop the higher id of every pair, then
    # re-run until LSH finds nothing. One pass is not always enough — the
    # deterministic band-bucket cap trims buckets to their smallest
    # doc_ids, so on cap-overflowing corpora a second pass can surface
    # pairs among docs the first pass never compared. Each pass frees the
    # LSH pipeline's internal caches (the _caches hook) once its survivor
    # set is checkpointed; the pass cap bounds the cost on adversarial
    # corpora (overflow is audited, not silently retried forever).
    n_near = n_exact
    n_near_passes = 0
    for _ in range(_MAX_NEAR_DEDUP_PASSES):
        caches: list[DataFrame] = []
        pairs = dedup.minhash_lsh_pairs(
            survivors.select("doc_id", "lang", "text"), _caches=caches
        )
        # checkpoint losers WHILE the LSH caches are warm: counting after
        # the unpersist would re-run the whole pipeline uncached
        losers = (
            pairs.select(F.col("doc_id_2").alias("doc_id"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_losers = losers.count()
        n_near_passes += 1
        if n_losers == 0:
            for c in caches:
                c.unpersist()
            break
        survivors, n_near = _stage(survivors.join(losers, "doc_id", "left_anti"))
        for c in caches:
            c.unpersist()

    # 5. deterministic split (train/valid)
    bucket = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(valid_fraction_buckets))
    curated = survivors.withColumn(
        "split", F.when(bucket == 0, "valid").otherwise("train")
    )
    n_valid = curated.filter(F.col("split") == "valid").count()

    report = CurationReport(
        n_input=n_input,
        n_after_quality=n_quality,
        n_after_decontamination=n_decontam,
        n_after_exact_dedup=n_exact,
        n_after_near_dedup=n_near,
        n_train=n_near - n_valid,
        n_valid=n_valid,
        n_near_dedup_passes=n_near_passes,
    )
    return curated, report
