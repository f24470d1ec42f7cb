"""Streaming near-dup-gated ingest — streaming/dedup.py.

Sink-contract tests (the same strategy as test_streaming.py's
idempotent-sink coverage): foreachBatch hands the sink (batch_df,
batch_id); driving the sink directly pins every per-batch decision —
cross-batch rejection through the persisted index, within-batch
transitive canonical keep, replay idempotency — without waiting on a
StreamingQuery. One availableNow file-stream test closes the loop.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sifts_spark.collection import Collection
from sifts_spark.streaming.dedup import make_dedup_sink, stream_dedup_ingest

BASE = "tok" + " tok".join(str(i) for i in range(30))


def _df(spark, rows):
    return spark.createDataFrame(rows, "id string, content string")


@pytest.fixture()
def col(store_root, spark):
    return Collection(store_root, "sdedup", spark=spark)


def _sink(col, tmp_path, **kw):
    return make_dedup_sink(
        col,
        str(tmp_path / "ckpt"),
        str(tmp_path / "index"),
        jaccard_threshold=0.5,
        **kw,
    )


def test_within_batch_transitive_canonical(col, spark, tmp_path):
    sink = _sink(col, tmp_path)
    sink(
        _df(
            spark,
            [
                ("a", BASE),
                ("b", BASE + " tail"),          # ~a
                ("c", BASE + " tail more"),     # ~b (chain)
                ("d", "completely different text about spark engines"),
            ],
        ),
        0,
    )
    ids = {r["id"] for r in col.docs().collect()}
    assert ids == {"a", "d"}  # min-id canonical of the chain + the unique doc


def test_cross_batch_rejection_via_index(col, spark, tmp_path):
    sink = _sink(col, tmp_path)
    sink(_df(spark, [("a", BASE), ("d", "unrelated doc body here now")]), 0)
    # a later batch's near-dup of an ACCEPTED doc is rejected...
    sink(_df(spark, [("e", BASE + " coda"), ("f", "another fresh doc body")]), 1)
    ids = {r["id"] for r in col.docs().collect()}
    assert ids == {"a", "d", "f"}
    sink(_df(spark, [("g", BASE + " coda extra")]), 2)
    assert "g" not in {r["id"] for r in col.docs().collect()}
    # rejected docs never enter the index: it holds exactly the
    # accepted ids (at Jaccard, any strong neighbor of a reject is
    # necessarily a neighbor of the kept canonical — checking index
    # membership pins the non-pollution contract directly)
    idx_ids = {
        r["id"]
        for r in spark.read.parquet(
            str(tmp_path / "index") + "/batch=*"
        ).select("id").distinct().collect()
    }
    assert idx_ids == {"a", "d", "f"}


def test_replay_is_idempotent(col, spark, tmp_path):
    sink = _sink(col, tmp_path)
    batch = _df(spark, [("a", BASE), ("b", "some other body of text")])
    sink(batch, 7)
    n1 = col.count()
    sink(batch, 7)  # checkpoint replay: same id, same data
    assert col.count() == n1
    # a FRESH sink instance (restart) must also skip via the durable marker
    sink2 = _sink(col, tmp_path)
    sink2(batch, 7)
    assert col.count() == n1


def test_empty_batch_and_missing_id_column(col, spark, tmp_path):
    sink = _sink(col, tmp_path)
    sink(_df(spark, []), 0)
    assert col.count() == 0
    with pytest.raises(ValueError, match="stable id"):
        sink(spark.createDataFrame([("x",)], "content string"), 1)


def test_file_stream_end_to_end(col, spark, tmp_path):
    src = tmp_path / "src"
    _df(
        spark,
        [("a", BASE), ("b", BASE + " tail"), ("c", "unique doc number three")],
    ).coalesce(1).write.json(str(src))
    stream = (
        spark.readStream.schema("id string, content string")
        .json(str(src))
    )
    q = stream_dedup_ingest(
        stream, col, str(tmp_path / "ck2"), str(tmp_path / "idx2"),
        jaccard_threshold=0.5,
    )
    q.awaitTermination(120)
    ids = {r["id"] for r in col.docs().collect()}
    assert ids == {"a", "c"}
