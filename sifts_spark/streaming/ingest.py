"""Structured-Streaming ingest into the document store + windowed aggs.

The reference has NO streaming surface (SURVEY.md §2.6 — ingestion is
synchronous batch upsert); this module is the north-star extension
(SURVEY §7 phase 5): continuous document arrival feeding the same
append-only store that batch `add` uses, plus event-stream analytics
with watermarks.

Design: `foreachBatch` bridges the stream to the batch write path, so
EVERY write-side invariant (newest-batch-wins upsert, tombstones,
postings derivation) is shared between batch and streaming — one code
path, no divergence. The store's append-only layout makes each
micro-batch an atomic directory add, and checkpointing gives
exactly-once per micro-batch (re-run batches overwrite by batch id
guard below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from sifts_spark.collection import _AUTO_METADATA, SparkCollection


def make_idempotent_sink(
    collection: SparkCollection,
    checkpoint_dir: str,
    id_col: str = "id",
    content_col: str = "content",
    metadata_col: str | None = _AUTO_METADATA,  # type: ignore[assignment]
):
    """foreachBatch sink with DURABLE per-batch commit markers.

    Spark's checkpoint guarantees a restarted query re-offers the same
    ``batch_id`` with the same data; an in-memory seen-set (the naive
    guard) forgets across restarts, so a replay would re-append the
    batch — and when ids are minted (uuid) that means duplicate
    documents. Here each committed batch writes a zero-byte marker
    ``<checkpoint>/_sifts_commits/<batch_id>`` through the Hadoop
    FileSystem API (object-store safe, same scheme handling as the
    store); replays skip on marker hit regardless of process restarts.

    Remaining window: a crash BETWEEN ``add_dataframe`` and the marker
    write replays the append. With caller-supplied stable ids that is
    idempotent-by-value (newest-batch-wins read); with minted uuid ids
    it can duplicate — supply stable ids for end-to-end exactly-once.

    ``metadata_col`` mirrors the batch default (the same sentinel): a
    ``metadata`` column is auto-detected when present (so streaming and
    batch ingest of the canonical ``(id, content, metadata)`` frame
    agree), NULL-filled when absent; ANY explicitly passed absent
    column — including "metadata" itself — raises in add_dataframe.
    """
    seen, mark = durable_commit_markers(collection.store.spark, checkpoint_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if seen(batch_id):
            return
        if not batch_df.isEmpty():
            collection.add_dataframe(
                batch_df,
                id_col=id_col,
                content_col=content_col,
                metadata_col=metadata_col,
            )
        mark(batch_id)

    return sink


def durable_commit_markers(spark, checkpoint_dir: str):
    """The durable per-batch commit-marker protocol shared by every
    foreachBatch sink in this package → ``(seen, mark)`` closures over
    ``<checkpoint>/_sifts_commits/<batch_id>`` zero-byte files on the
    checkpoint's Hadoop FileSystem (object-store safe). One
    implementation on purpose: a future change to the marker protocol
    (e.g. conditional-put hardening) must not be able to diverge
    between sinks."""
    jvm = spark._jvm
    HPath = jvm.org.apache.hadoop.fs.Path
    commits = f"{checkpoint_dir.rstrip('/')}/_sifts_commits"
    fs = HPath(commits).getFileSystem(spark._jsc.hadoopConfiguration())
    fs.mkdirs(HPath(commits))

    def seen(batch_id: int) -> bool:
        return bool(fs.exists(HPath(f"{commits}/{batch_id}")))

    def mark(batch_id: int) -> None:
        fs.createNewFile(HPath(f"{commits}/{batch_id}"))

    return seen, mark


def stream_collection_ingest(
    stream_df: DataFrame,
    collection: SparkCollection,
    checkpoint_dir: str,
    id_col: str = "id",
    content_col: str = "content",
    metadata_col: str | None = _AUTO_METADATA,  # type: ignore[assignment]
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """readStream source → collection store, via foreachBatch.

    Each micro-batch lands as one store batch directory — identical
    semantics to a batch ``add_dataframe`` call. Restart-safe: the sink
    records durable commit markers (:func:`make_idempotent_sink`), so a
    checkpoint replay after restart skips already-committed batches.
    """
    sink = make_idempotent_sink(
        collection, checkpoint_dir, id_col, content_col, metadata_col
    )
    writer = stream_df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_aggregates(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Streaming tumbling-window aggregation with late-data handling.

    Watermark bounds state: rows later than ``watermark`` behind the max
    seen event time are dropped and their windows finalized — the
    streaming twin of the batch ``events_hourly`` catalog query.
    Works on both streaming and batch DataFrames (watermark is a no-op
    in batch), so the same function serves both tiers.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), key_col, "n", "sum_value")
    )


def sessionized_event_aggregates(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming session windows (gap-based) per key.

    Uses Spark's native ``session_window`` — state-store backed, gap-
    merged at runtime; the streaming twin of the batch lag/cumsum
    ``events_sessionize`` catalog query.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )


def stream_stream_enrich_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "1 hour",
    tolerance: str = "30 minutes",
) -> DataFrame:
    """Stream-stream inner join with bounded state: match left rows to
    right rows of the same key whose event time is within
    ``[left_ts - tolerance, left_ts]`` (the streaming cousin of the
    batch as-of join — a window, not most-recent, because unbounded
    "most recent" needs unbounded state).

    Both sides carry watermarks and the join condition carries the time
    bound — the two things Structured Streaming REQUIRES to evict
    state; without them a stream-stream join buffers both streams
    forever. State per key is bounded by tolerance + watermark. Works
    identically on batch frames (watermarks are no-ops) so batch twins
    can pin values.
    """
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {tolerance}")
        )
    )
    return lw.join(rw, cond, "inner")


def stream_collection_appends(
    collection: SparkCollection, with_batch: bool = True
) -> DataFrame:
    """Tail a collection as a streaming CHANGE FEED of appended rows.

    The store's append-only layout makes this free: every write lands as
    new parquet files under ``name=<collection>/batch=N/``, so Spark's
    file stream source — pointed at the partition directory with a
    recursive lookup — discovers each batch's files in the micro-batch
    after they appear. The outbound complement of
    :func:`stream_into_collection`: downstream consumers (index
    builders, replicators, trainers) subscribe to a collection instead
    of polling snapshots.

    Semantics: an APPEND feed of the store's PHYSICAL write log —
    upserts arrive as new versions of an id, deletes as
    ``deleted=true`` tombstones. With ``with_batch`` (default) each row
    carries its ``batch`` number, parsed from the file path
    (``_metadata.file_path``; the recursive glob disables partition
    inference, but file metadata still knows the dir) — so consumers
    can totally order versions of an id and reconstruct the snapshot
    from the feed alone (``resolve_snapshot`` is the batch helper; the
    streaming twin is a max-batch-wins stateful agg keyed by id).

    **Compaction re-emission caveat**: ``compact()`` rewrites the live
    corpus into a fresh (higher-numbered) batch, and the feed — being a
    physical log — re-emits every surviving row under that new batch
    number. Snapshot-reconstructing consumers are unaffected
    (max-batch-wins is idempotent under re-emission: the folded rows
    ARE the winners), but counting/summing consumers would double-count
    after every compact. If the source collection auto-compacts
    (``auto_compact_batches``), this happens routinely mid-stream — a
    warning is emitted at subscribe time; either consume
    max-batch-wins, or leave compaction to scheduled windows the
    consumer knows about.
    """
    store = collection.store
    if collection.auto_compact_batches:
        import warnings

        warnings.warn(
            "change feed on an auto-compacting collection: every inline "
            "compact() re-emits the surviving corpus under a new batch "
            "number; consume with max-batch-wins (not row counting), or "
            "disable auto_compact_batches on the feed's source",
            stacklevel=2,
        )
    part = store._partition_dir(collection.name)
    # The dir must exist before a stream can watch it.
    store._fs.mkdirs(store.spark._jvm.org.apache.hadoop.fs.Path(part))
    from sifts_spark.sources.store import DOC_SCHEMA

    feed = (
        store.spark.readStream.schema(DOC_SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1000)
        .parquet(part)
    )
    if with_batch:
        feed = feed.withColumn(
            "batch",
            F.regexp_extract(
                F.col("_metadata.file_path"), r"/batch=(\d+)/", 1
            ).cast("long"),
        )
    return feed


def streaming_snapshot_updates(feed: DataFrame) -> DataFrame:
    """Continuously maintained LIVE SNAPSHOT from a change feed: the
    streaming twin of ``resolve_snapshot`` (max-batch-wins per id),
    consuming :func:`stream_collection_appends` output.

    A declarative stateful aggregation — ``max_by`` keyed by ``batch``
    keeps, per id, the newest version's columns; run the sink in
    ``update`` output mode and each micro-batch emits exactly the ids
    whose winning version changed (a CDC-style upsert stream for a
    downstream materialized view). Tombstones are NOT filtered: the
    ``deleted=true`` row is the delete signal the consumer needs to
    drop the id from its view — filtering it here would silently
    resurrect the previous version at the sink.

    State is one entry per live id (the floor for any materialized
    snapshot — this is a keyed agg, not a join buffer; no watermark
    because ids never expire). Batch-mode twin: the SAME expression on
    a batch read of the feed equals ``resolve_snapshot`` minus its
    tombstone filter — pinned by the streaming test.
    """
    versioned = F.struct("content", "metadata", "embedding", "deleted")
    return (
        feed.groupBy("id")
        .agg(
            F.max_by(versioned, F.col("batch")).alias("_v"),
            F.max("batch").alias("batch"),
        )
        .select(
            "id", "_v.content", "_v.metadata", "_v.embedding", "_v.deleted",
            "batch",
        )
    )
