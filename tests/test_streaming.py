"""Structured-Streaming ingest + windowed aggregation tests."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sifts_spark.collection import Collection
from sifts_spark.sources.tables import load_table
from sifts_spark.streaming import (
    sessionized_event_aggregates,
    stream_collection_ingest,
    windowed_event_aggregates,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_TEST_DIR", "/root/testdata/sf0.001")


def test_stream_ingest_into_collection(spark, tmp_path):
    # stage documents as a file-source stream (one file = one micro-batch)
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    docs = load_table(spark, SF_DIR, "documents").limit(100)
    docs.write.parquet(os.path.join(src, "chunk1"))

    col = Collection(str(tmp_path / "store"), "streamed", spark=spark)
    stream = spark.readStream.schema(docs.schema).option(
        "recursiveFileLookup", "true"
    ).parquet(src)
    q = stream_collection_ingest(
        stream.select(
            F.col("doc_id").cast("string").alias("id"),
            F.col("text").alias("content"),
            F.to_json(F.struct("lang", "source")).alias("metadata"),
        ),
        col,
        checkpoint_dir=str(tmp_path / "ckpt"),
        metadata_col="metadata",
    )
    q.awaitTermination(120)
    assert col.count() == 100
    # ingested docs are immediately searchable through the same path
    assert col.query("data")["total"] > 0
    meta = col.get(limit=1)["results"][0]["metadata"]
    assert set(meta) == {"lang", "source"}


def test_replay_after_restart_is_skipped_by_commit_marker(spark, tmp_path):
    """A restarted query re-offers committed batch ids; the durable
    marker (not an in-memory set) must skip them even when ids are
    MINTED (uuid) — the case where a replayed append would duplicate."""
    from sifts_spark.streaming import make_idempotent_sink

    col = Collection(str(tmp_path / "store"), "replays", spark=spark)
    ckpt = str(tmp_path / "ckpt")
    batch = spark.createDataFrame([("doc one",), ("doc two",)], "content string")

    sink = make_idempotent_sink(col, ckpt, id_col="missing_id")
    sink(batch, 0)
    assert col.count() == 2
    sink(batch, 0)  # same-process replay
    assert col.count() == 2

    # "restart": a FRESH sink instance (in-memory state gone) replays
    # batch 0 and then delivers new batch 1
    sink2 = make_idempotent_sink(col, ckpt, id_col="missing_id")
    sink2(batch, 0)
    assert col.count() == 2
    sink2(spark.createDataFrame([("doc three",)], "content string"), 1)
    assert col.count() == 3


def test_stateful_running_stats_accumulate_across_batches(spark, tmp_path):
    """applyInPandasWithState: per-key lifetime totals must ACCUMULATE
    across micro-batches (state store), and the final update per key
    must equal the batch twin."""
    from sifts_spark.streaming.stateful import batch_user_stats, running_user_stats

    events = load_table(spark, SF_DIR, "events").limit(400)
    src = str(tmp_path / "ev_state")
    # two files + maxFilesPerTrigger=1 => two micro-batches
    half1 = events.filter(F.col("event_id") % 2 == 0)
    half2 = events.filter(F.col("event_id") % 2 == 1)
    half1.write.parquet(src)
    half2.write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("running_stats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_state"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM running_stats")
    # update mode emits one row per key per batch it appears in; the
    # LAST emission per key (max n_events — monotone) is the lifetime total
    final = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 6), r["last_ts"])
        for r in got.orderBy("n_events").collect()
    }
    # read-back of src includes both files
    expected = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 6), r["last_ts"])
        for r in batch_user_stats(
            spark.read.schema(events.schema).parquet(src)
        ).collect()
    }
    assert final == expected
    # accumulation proof: some key must have emitted twice (two batches)
    multi = got.groupBy("user_id").count().filter(F.col("count") > 1).count()
    assert multi > 0


def test_windowed_aggregates_stream_equals_batch(spark, tmp_path):
    """The streaming windowed agg must equal the batch twin (same fn)."""
    events = load_table(spark, SF_DIR, "events")
    batch = windowed_event_aggregates(events).orderBy("window_start", "event_type")

    src = str(tmp_path / "ev")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = windowed_event_aggregates(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("winagg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM winagg").orderBy("window_start", "event_type")
    assert [r.asDict() for r in got.collect()] == [
        r.asDict() for r in batch.collect()
    ]


def test_sessionized_aggregates_stream(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "ev2")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = sessionized_event_aggregates(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sessagg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sessagg")
    n_sessions = got.count()
    assert n_sessions > 0
    # every session holds >= 1 event and ends after it starts
    bad = got.filter(
        (F.col("n_events") < 1) | (F.col("session_end") <= F.col("session_start"))
    ).count()
    assert bad == 0
    # session count matches the batch lag/cumsum sessionizer
    from sifts_spark.plans.catalog import events_sessionize

    assert n_sessions == events_sessionize(spark, SF_DIR).count()


def test_stream_stream_join_bounded_and_equals_batch(spark, tmp_path):
    """Stream-stream windowed equi-join: runs as a real streaming query
    (both sides readStream — Spark rejects it outright if state isn't
    bounded by watermark + time-range condition) and matches the same
    function applied to the batch frames."""
    from sifts_spark.streaming import stream_stream_enrich_join

    events = load_table(spark, SF_DIR, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    buys = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("buy_id"), "value"
    )
    batch = stream_stream_enrich_join(clicks, buys, on="user_id")
    n_batch = batch.count()
    assert n_batch > 0

    cdir, bdir = str(tmp_path / "c"), str(tmp_path / "b")
    clicks.write.parquet(cdir)
    buys.write.parquet(bdir)
    cs = spark.readStream.schema(clicks.schema).parquet(cdir)
    bs = spark.readStream.schema(buys.schema).parquet(bdir)
    out = stream_stream_enrich_join(cs, bs, on="user_id")
    q = (
        out.writeStream.format("memory")
        .queryName("ssjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n FROM ssjoin").first()["n"]
    assert got == n_batch


def test_stream_collection_appends_is_a_change_feed(spark, tmp_path):
    """Writes made AFTER the stream starts are discovered by later
    micro-batches: upsert versions and tombstones arrive as appended
    rows (the store's write log), not snapshot diffs."""
    from sifts_spark.collection import Collection
    from sifts_spark.streaming.ingest import stream_collection_appends

    col = Collection(str(tmp_path / "store"), "feed", spark=spark)
    col.add(["first doc"], ids=["1"])

    feed = stream_collection_appends(col)
    q = (
        feed.writeStream.format("memory")
        .queryName("feed_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        col.add(["first doc v2"], ids=["1"])   # upsert -> new version row
        col.delete(["1"])                      # tombstone row
        col.add(["second doc"], ids=["2"])
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT id, content, deleted, batch FROM feed_sink ORDER BY id, content"
        ).collect()
    finally:
        q.stop()
    got = {(r["id"], r["content"], r["deleted"]) for r in rows}
    assert ("1", "first doc", False) in got
    assert ("1", "first doc v2", False) in got
    assert ("1", None, True) in got            # tombstone
    assert ("2", "second doc", False) in got
    assert len(got) == 4

    # Version ORDER is reconstructible from the feed alone: the batch
    # column (parsed from _metadata.file_path) feeds the same
    # newest-batch-wins resolution the store's read path uses, yielding
    # exactly the live snapshot — no arrival-order assumption.
    from sifts_spark.sources.store import resolve_snapshot

    feed_batches = {(r["id"], r["content"]): r["batch"] for r in rows}
    assert feed_batches[("1", "first doc")] < feed_batches[("1", "first doc v2")]
    replay = spark.createDataFrame(
        [(r["id"], r["content"], r["deleted"], r["batch"]) for r in rows],
        "id string, content string, deleted boolean, batch long",
    )
    rebuilt = {
        (r["id"], r["content"])
        for r in resolve_snapshot(replay).select("id", "content").collect()
    }
    truth = {
        (r["id"], r["content"])
        for r in col.store.read("feed").select("id", "content").collect()
    }
    assert rebuilt == truth == {("2", "second doc")}


def test_streaming_snapshot_updates_maintains_live_view(spark, tmp_path):
    """The stateful max-batch-wins agg over the change feed converges to
    the store's snapshot: upserts replace, tombstones surface as
    deleted=true delete signals (not silent resurrection)."""
    from sifts_spark.collection import Collection
    from sifts_spark.streaming.ingest import (
        stream_collection_appends,
        streaming_snapshot_updates,
    )

    col = Collection(str(tmp_path / "store"), "snap", spark=spark)
    col.add(["first doc"], ids=["1"])

    snap = streaming_snapshot_updates(stream_collection_appends(col))
    q = (
        snap.writeStream.format("memory")
        .queryName("snap_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        col.add(["first doc v2"], ids=["1"])   # upsert
        col.add(["second doc"], ids=["2"])
        col.delete(["2"])                      # tombstone
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM snap_sink").collect()
    finally:
        q.stop()
    # update-mode sink: LAST emission per id is the materialized state
    state = {}
    for r in rows:  # memory sink appends updates in emission order
        prev = state.get(r["id"])
        if prev is None or r["batch"] >= prev["batch"]:
            state[r["id"]] = r
    assert state["1"]["content"] == "first doc v2" and not state["1"]["deleted"]
    assert state["2"]["deleted"]  # delete signal, not resurrection
    live = {r["id"] for r in col.store.read("snap").collect()}
    assert {i for i, r in state.items() if not r["deleted"]} == live == {"1"}


def test_stream_first_seen_dedup_gate(spark, tmp_path):
    """Exact-dedup gate: key = md5(text). Duplicated docs across TWO
    micro-batches must pass the gate exactly once, min-id winner, and
    the surviving set must equal the batch twin's."""
    from sifts_spark.streaming.stateful import batch_first_seen, stream_first_seen

    docs = (
        load_table(spark, SF_DIR, "documents")
        .limit(60)
        .select("doc_id", "text", F.md5("text").alias("digest"))
    )
    # batch 1: originals; batch 2: the same texts under shifted ids
    # (every batch-2 row is a duplicate) plus 5 genuinely new texts
    dupes = docs.select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text", "digest"
    )
    fresh = (
        load_table(spark, SF_DIR, "documents")
        .filter("doc_id >= 60 and doc_id < 65")
        .select((F.col("doc_id") + 20_000).alias("doc_id"), "text",
                F.md5("text").alias("digest"))
    )
    src = str(tmp_path / "dd_src")
    docs.write.parquet(src)
    dupes.union(fresh).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream_first_seen(stream, ["digest"], order_col="doc_id")
        .writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["digest"], r["doc_id"])
        for r in spark.sql("SELECT * FROM first_seen").collect()
    }
    everything = spark.read.schema(docs.schema).parquet(src)
    want = {
        (r["digest"], r["doc_id"])
        for r in batch_first_seen(everything, ["digest"], order_col="doc_id").collect()
    }
    assert got == want
    # each key emitted exactly once even though its duplicates arrived
    # in a later micro-batch; every batch-2 duplicate was swallowed
    assert len(got) == len({d for d, _ in got})
    assert all(i < 10_000 or i >= 20_000 for _, i in got)
    # the 5 fresh batch-2 texts DID pass (if their text is genuinely new)
    fresh_digests = {r["digest"] for r in fresh.collect()} - {
        r["digest"] for r in docs.collect()
    }
    assert fresh_digests <= {d for d, _ in got}


def test_stream_first_seen_gate_keyed_by_canonical_url(spark, tmp_path):
    """In-flight URL dedup: the r10 canonicalization composes with the
    streaming first-seen gate — refetch spellings of one resource
    arriving in LATER micro-batches are swallowed; the surviving set
    equals the batch twin's."""
    from sifts_spark.operators.urls import normalize_url
    from sifts_spark.streaming.stateful import (
        batch_first_seen,
        stream_first_seen,
    )

    b1 = spark.createDataFrame(
        [(i, f"https://ex.com/p/{i}?a=1") for i in range(20)],
        "doc_id long, url string",
    )
    # batch 2: the same 20 resources under tracking-param / port / case
    # spellings, plus 5 genuinely new resources
    b2 = spark.createDataFrame(
        [(i + 10_000, f"https://EX.com:443/p/{i}?utm_source=x&a=1#f")
         for i in range(20)]
        + [(i + 20_000, f"https://ex.com/new/{i}") for i in range(5)],
        "doc_id long, url string",
    )
    src = str(tmp_path / "url_src")
    b1.write.parquet(src)
    b2.write.mode("append").parquet(src)

    def keyed(df):
        return df.withColumn("url_key", normalize_url("url"))

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream_first_seen(keyed(stream), ["url_key"], order_col="doc_id")
        .writeStream.format("memory")
        .queryName("url_first_seen")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "url_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["url_key"], r["doc_id"])
        for r in spark.sql("SELECT * FROM url_first_seen").collect()
    }
    everything = spark.read.schema(b1.schema).parquet(src)
    want = {
        (r["url_key"], r["doc_id"])
        for r in batch_first_seen(
            keyed(everything), ["url_key"], order_col="doc_id"
        ).collect()
    }
    assert got == want and len(got) == 25
    # every batch-2 refetch spelling was swallowed by its batch-1 twin
    assert all(i < 10_000 or i >= 20_000 for _, i in got)
