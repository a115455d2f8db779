"""Structured Streaming jobs over the ``events`` stream (SURVEY §7.2 step 8).

The reference has no streaming surface — its incremental machinery is batch
CDC with a watermark table (ref: scripts/silver/proc_load_silver.sql:51-53,
119-122; SURVEY §2.9 C1). These jobs are the Structured-Streaming
generalization of that pattern: the audit-table watermark becomes
``withWatermark`` (late-data bound + state eviction), the delta filter
becomes the incremental file source, and the batch append becomes an
append-mode sink.

Stream/batch unification is the design invariant: every aggregation here
shares its logical plan with a registered batch query (streaming/batch_views
.py) so the DuckDB oracle that checks the batch twin also pins the streaming
semantics; tests additionally replay the stream with an availableNow trigger
and assert bit-equality with the batch result.

Scale notes (100 TB/day stream): all aggregations are keyed on
(window, event_type) or user_id — state is bounded by watermark eviction,
partial aggregation happens map-side before the keyed shuffle, and the file
source's ``maxFilesPerTrigger`` bounds per-microbatch memory. The custom
stateful operator uses ``applyInPandasWithState`` (Arrow-batched, grouped
state) — the Spark-idiomatic form for operators the built-in windows can't
express.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Logical schema of the events stream (micros precision — the nanos in the
# driver's parquet are downcast at the batch boundary, sources/tpch.py:36-43).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Incremental parquet file source for events.

    New files landing in ``input_dir`` are the stream (the lakehouse-native
    ingestion pattern); schema is pinned — never inferred — so a malformed
    producer file fails loudly instead of corrupting state.
    """
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


# ------------------------------------------------------------- windowed aggs


def hourly_events(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour aggregation; batch twin: stream_events_hourly.

    ``withWatermark`` bounds state: a window closes (and is emittable in
    append mode) once event time passes window_end + watermark — the
    streaming analog of the reference's 1-day watermark safety buffer
    (ref: proc_load_silver.sql:121).
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"),
                "event_type", "n_events", "approx_users", "total_value")
    )


def sliding_value_rate(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Sliding 1-hour window every 15 minutes — overlapping assignment means
    each event lands in 4 windows; Spark expands then partially aggregates
    map-side, so the shuffle carries 4 partial rows per (window,type), not
    4 copies of the input."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        # decimal avg: exact + order-independent (float avg drifts in the last
        # ulp with partition order, breaking stream-vs-batch bit-equality)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.avg(F.col("value").cast("decimal(18,4)")).alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "avg_value")
    )


def user_sessions(stream: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Session windows per user via the built-in ``session_window`` — gap-based
    dynamic windows, state evicted by the watermark."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def dedup_events_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming ingest deduplication on event_id —
    ``dropDuplicatesWithinWatermark`` keeps one row per key and EVICTS the
    key's state once the watermark passes its event time, so the dedup state
    is bounded by (stream rate × watermark) instead of growing forever like
    a plain ``dropDuplicates`` would. This is the streaming form of the
    exact-dedup operator (operators/dedup.py) and the first stage any
    at-least-once ingest (replayed files, producer retries) needs."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def enrich_events_stream(stream: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream–static enrichment join: events enriched with the customer
    dimension (user_id → customer key, the same J4 dim-enrichment shape as
    the batch gold layer). The static side is explicitly broadcast — each
    microbatch re-plans against the dim's CURRENT snapshot (picking up slow
    dim changes) and the stream side never shuffles."""
    d = F.broadcast(dim.select("c_custkey", "c_mktsegment", "c_nationkey"))
    return (
        stream.join(d, stream.user_id == d.c_custkey, "left")
        .select(
            "event_id",
            "ts",
            "user_id",
            "event_type",
            "value",
            F.coalesce("c_mktsegment", F.lit("n/a")).alias("segment"),
        )
    )


# -------------------------------------------- custom stateful operator (C1')

_STATE_SCHEMA = "total_events bigint, total_value double, last_ts timestamp"
_OUT_SCHEMA = (
    "user_id bigint, total_events bigint, total_value double, last_ts timestamp, expired boolean"
)


def _make_track_user(idle_timeout_ms: int | None):
    def _track_user(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        """Per-user running totals, optionally with idle-timeout expiry.

        Grouped-map stateful function (Arrow-batched): accumulates event
        count / value per user across microbatches; with a timeout armed, an
        idle user's final row is emitted with expired=True and state dropped
        — bounded state without a window shape, i.e. the operator class the
        built-in windows can't express (SURVEY §7 custom-operator tier b).
        """
        (user_id,) = key
        if state.hasTimedOut:
            total, value, last = state.get
            state.remove()
            yield pd.DataFrame(
                [{"user_id": user_id, "total_events": total, "total_value": value,
                  "last_ts": last, "expired": True}]
            )
            return
        total, value, last = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            total += len(pdf)
            value += float(pdf["value"].sum())
            mx = pdf["ts"].max()
            last = mx if last is None or mx > last else last
        state.update((total, value, last))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            [{"user_id": user_id, "total_events": total, "total_value": value,
              "last_ts": last, "expired": False}]
        )

    return _track_user


def user_running_totals(stream: DataFrame, idle_timeout_ms: int | None = None) -> DataFrame:
    """applyInPandasWithState wiring for the per-user tracker (update mode).

    ``idle_timeout_ms`` arms processing-time expiry for continuous
    deployments. Leave it None for availableNow replays/backfills: pending
    timeout ticks count as available work, so a drain-and-stop harness would
    never settle with a timeout armed.
    """
    return stream.groupBy("user_id").applyInPandasWithState(
        _make_track_user(idle_timeout_ms),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


# ------------------------------------------------------------------ running


def run_available_now(job: DataFrame, output_mode: str, query_name: str, checkpoint: str):
    """Drain everything currently in the source into an in-memory sink and
    stop — the test/replay harness (Trigger.AvailableNow processes all
    pending input in bounded microbatches, then terminates)."""
    q = (
        job.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    # processAllAvailable + stop, not awaitTermination: a stateful operator
    # with pending processing-time timeouts keeps the query alive waiting for
    # them to fire, so awaitTermination would block past the data drain.
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    return q


_UPSERT_BUCKETS = 64


def upsert_key_bucket(key, n_buckets: int = _UPSERT_BUCKETS):
    """The stable key→bucket map the upsert target is partitioned by:
    xxhash64 is deterministic across runs/sessions, so a key lands in the
    same partition directory on every microbatch — including NULL keys,
    which xxhash64 folds to the (deterministic) seed hash rather than
    returning NULL, so they too always land in one fixed bucket. No
    special-casing: remapping NULLs (e.g. to bucket 0) would silently
    strand pre-existing NULL-key rows in their old partition and break
    keep-latest semantics for them."""
    return F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets))


def sink_stream_upsert(
    job: DataFrame,
    catalog,
    table: str,
    key: str,
    order_col: str,
    checkpoint: str,
    n_buckets: int = _UPSERT_BUCKETS,
):
    """Streaming UPSERT sink: each microbatch MERGEs into a warehouse table
    keyed on ``key``, keeping the row with the greatest ``order_col`` — the
    streaming twin of the silver SCD1 merge (ref: proc_load_silver.sql:57-123)
    via ``foreachBatch``, the Structured-Streaming idiom for sinks that need
    transactional semantics the file sink can't give.

    Scale design: the target is partitioned by a stable hash bucket of the
    key (``_key_bucket``, a physical-layout column visible to readers like
    any partition column). A microbatch (1) computes the buckets it touches
    — a ≤``n_buckets``-element collect, (2) reads ONLY those partitions of
    the current table (directory-level pruning), (3) keep-latest merges
    batch + current rows (one window), and (4) publishes via dynamic
    partition overwrite, rewriting ONLY the touched bucket directories.
    Untouched buckets' files are never read or written — at 100 TB a
    trickle microbatch costs O(touched buckets), not a full-table rewrite.
    On Delta this becomes a single ``MERGE INTO`` touching only matched
    files; same semantics, finer-than-partition granularity.
    """
    from pyspark.sql import Window

    def merge_batch(batch: DataFrame, _batch_id: int) -> None:
        bucketed = batch.withColumn("_key_bucket", upsert_key_bucket(key, n_buckets))
        w = Window.partitionBy(key).orderBy(F.desc(order_col), F.desc("_is_new"))
        if catalog.exists(table):
            touched = [
                r["_key_bucket"]
                for r in bucketed.select("_key_bucket").distinct().collect()
            ]
            current = catalog.read(table).filter(F.col("_key_bucket").isin(touched))
            src = bucketed.withColumn("_is_new", F.lit(1)).unionByName(
                current.withColumn("_is_new", F.lit(0))
            )
        else:
            src = bucketed.withColumn("_is_new", F.lit(1))
        latest = (
            src.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_is_new")
        )
        if catalog.exists(table):
            catalog.overwrite_partitions(table, latest, ["_key_bucket"])
        else:
            catalog.overwrite(table, latest, partition_by=["_key_bucket"])

    return (
        job.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def sink_to_parquet(job: DataFrame, path: str, checkpoint: str, output_mode: str = "append"):
    """Production sink shape: append-mode parquet (exactly-once via the
    checkpoint + file-sink manifest), the streaming analog of the silver
    delta append (ref: proc_load_silver.sql:228-252)."""
    return (
        job.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .start()
    )


def sink_stream_neardedup(
    docs_stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint: str,
    threshold: float = 0.8,
):
    """Streaming NEAR-dedup sink: every microbatch is near-dedup'd both
    within itself and against EVERYTHING accepted so far, survivors are
    appended to ``out_path`` and to the persistent MinHash signature index
    — the streaming composition of the incremental-index API
    (operators/dedup.py: build/append/query_minhash_index).

    Per batch: (1) the batch LSH pipeline finds within-batch near-dup pairs
    and drops each pair's larger doc_id (keep-first policy, exact dups
    included via their jaccard-1.0 member pairs); (2) the remaining docs
    probe the signature index — banding-join against the stored band table,
    signature-estimated Jaccard confirm — and any doc matching an indexed
    doc is dropped; (3) survivors' signatures append to the index and their
    rows append to the output. The index stores ~300 B/doc (signatures +
    bands, never text), so state grows with the ACCEPTED corpus surface,
    not the stream volume, and each batch's cost is O(batch) work plus a
    narrow join against the band table — no replay of accepted text.

    Watermark note: unlike the time-bounded ``dedup_events_stream`` (state
    expires with the watermark), near-dedup is content-keyed and must
    remember forever — which is exactly why the state lives in the
    restartable on-disk index, not in executor memory.

    Replay safety (foreachBatch is at-least-once): the output lands in a
    per-batch subdirectory written with OVERWRITE, so a retried batch
    replaces its own files instead of double-appending; docs whose own
    doc_id is already in the index (accepted by a prior attempt of the same
    batch) are not re-appended to the index; and a hit on the SAME doc_id
    counts as this document re-observed, never as a duplicate to drop. The
    index/output pair still isn't a single transaction — a crash exactly
    between the two writes leaves the doc indexed but unpublished until the
    retry republishes its batch directory (which the overwrite makes
    idempotent)."""

    from ..operators import dedup

    def _exists(spark: SparkSession, path: str) -> bool:
        # Hadoop FileSystem, not os.path: the index may live on any Spark-
        # readable URI (hdfs://, s3a://), where a driver-local stat would
        # be silently false and skip the cross-batch probe forever.
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return fs.exists(hpath)

    def _dedup_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.select("doc_id", "lang", "text")
        caches: list = []
        try:
            pairs = dedup.minhash_lsh_pairs(batch, threshold=threshold, _caches=caches)
            dups = pairs.select(F.col("doc_id_2").alias("doc_id")).distinct()
            survivors = batch.join(dups, "doc_id", "left_anti")
            indexed_ids = None
            if _exists(spark, f"{index_path}/bands"):
                hits = dedup.query_minhash_index(
                    spark, index_path, survivors, threshold=threshold, _caches=caches
                )
                seen = (
                    hits.filter(F.col("new_doc_id") != F.col("indexed_doc_id"))
                    .select(F.col("new_doc_id").alias("doc_id"))
                    .distinct()
                )
                survivors = survivors.join(seen, "doc_id", "left_anti")
                indexed_ids = spark.read.parquet(f"{index_path}/signatures").select(
                    "doc_id"
                )
            # localCheckpoint — NOT cache(): the survivor plan READS the
            # index paths the next statement APPENDS to, and Spark's cache
            # manager invalidates-and-recomputes any cached plan whose
            # source path is written — the recomputed anti-join would then
            # see the batch's own just-appended signatures and drop every
            # row. The checkpoint cuts lineage to materialized partitions,
            # so both writes consume the pre-append survivor set.
            survivors = survivors.localCheckpoint(eager=True)
            to_index = survivors
            if indexed_ids is not None:
                # replayed batch: survivors already indexed by the prior
                # attempt must not append duplicate signatures
                to_index = survivors.join(indexed_ids, "doc_id", "left_anti")
            dedup.append_minhash_index(to_index, index_path)
            survivors.write.mode("overwrite").parquet(
                f"{out_path}/ingest_batch={batch_id}"
            )
        finally:
            for c in caches:
                c.unpersist()

    return (
        docs_stream.writeStream.foreachBatch(_dedup_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
