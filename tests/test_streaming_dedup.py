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


# ------------------------------------------------- r7: index compaction


def _sketch_rows(spark, rows):
    """rows: [(id, key)] -> a frame matching the sketch-index schema."""
    from sifts_spark.streaming.dedup import _SKETCH_SCHEMA

    return spark.createDataFrame(
        [(i, ["sh-" + i], 0, k) for i, k in rows], _SKETCH_SCHEMA
    )


def _write_batch(spark, index_dir, b, rows):
    _sketch_rows(spark, rows).write.mode("overwrite").parquet(
        f"{index_dir}/batch={b}"
    )


def test_compaction_bounds_dirs_across_100_batches(spark, tmp_path):
    """The r6 VERDICT item-3 'done' gate: ~100 micro-batches end with a
    bounded dir count (minor folds bound batch dirs, major folds bound
    fold dirs), and the folded index reads back every id."""
    import os

    from sifts_spark.streaming.dedup import (
        _index_layout,
        _read_sketch_index,
        compact_sketch_index,
    )

    index_dir = str(tmp_path / "idx")
    for b in range(100):
        _write_batch(spark, index_dir, b, [(f"d{b}", f"k{b}")])
        compact_sketch_index(
            spark, index_dir, max_batch_dirs=10, max_fold_dirs=3
        )
    folds, batches, stale = _index_layout(spark, index_dir)
    assert len(batches) < 10 and len(folds) <= 3 and not stale
    assert len(os.listdir(index_dir)) <= 13
    got = {r["id"] for r in _read_sketch_index(spark, index_dir).collect()}
    assert got == {f"d{b}" for b in range(100)}


def test_fold_is_newest_wins_per_id(spark, tmp_path):
    """A re-sent (upserted) id keeps only its freshest sketches after a
    fold — stale sketches must not keep rejecting docs that are only
    near the DEAD content."""
    from sifts_spark.streaming.dedup import (
        _read_sketch_index,
        compact_sketch_index,
    )

    index_dir = str(tmp_path / "idx")
    _write_batch(spark, index_dir, 0, [("x", "old-key"), ("y", "ky")])
    _write_batch(spark, index_dir, 1, [("z", "kz")])
    _write_batch(spark, index_dir, 2, [("x", "new-key")])
    out = compact_sketch_index(spark, index_dir, max_batch_dirs=3)
    assert out["minor"] is True
    got = {
        (r["id"], r["key"])
        for r in _read_sketch_index(spark, index_dir).collect()
    }
    assert got == {("x", "new-key"), ("y", "ky"), ("z", "kz")}


def test_crash_window_never_double_counts(spark, tmp_path):
    """Fold written + _SUCCESS landed, but the source dirs' deletion
    crashed: the reader must ignore covered batch dirs and contained
    folds; the next compaction reclaims them."""
    from sifts_spark.streaming.dedup import (
        _index_layout,
        _read_sketch_index,
        compact_sketch_index,
    )

    index_dir = str(tmp_path / "idx")
    for b in range(4):
        _write_batch(spark, index_dir, b, [(f"d{b}", f"k{b}")])
    compact_sketch_index(spark, index_dir, max_batch_dirs=4)
    folds, batches, stale = _index_layout(spark, index_dir)
    assert folds == [(0, 3)] and batches == [] and stale == []
    # simulate the crash: a folded source batch dir reappears (replay
    # re-materialized it) — covered by the live fold, so it is ignored
    _write_batch(spark, index_dir, 2, [("d2", "k2")])
    df = _read_sketch_index(spark, index_dir)
    assert df.filter(df.id == "d2").count() == 1  # not doubled
    out = compact_sketch_index(spark, index_dir, max_batch_dirs=99)
    assert out["reclaimed"] == 1  # stale dir reclaimed, no new fold
    _folds, _batches, stale = _index_layout(spark, index_dir)
    assert stale == []


def test_partial_fold_is_invisible(spark, tmp_path):
    """A fold dir without _SUCCESS (crash mid-write) must not hide the
    batch dirs it would have covered."""
    import os

    from sifts_spark.streaming.dedup import _read_sketch_index

    index_dir = str(tmp_path / "idx")
    for b in range(3):
        _write_batch(spark, index_dir, b, [(f"d{b}", f"k{b}")])
    # partial fold: parquet data, no _SUCCESS
    _sketch_rows(spark, [("ghost", "kg")]).write.mode("overwrite").parquet(
        f"{index_dir}/fold=0-2"
    )
    os.remove(f"{index_dir}/fold=0-2/_SUCCESS")
    got = {r["id"] for r in _read_sketch_index(spark, index_dir).collect()}
    assert got == {"d0", "d1", "d2"}  # sources live, ghost invisible


def test_sink_compacts_and_still_rejects_cross_batch(col, spark, tmp_path):
    """End-to-end: a sink with a small compact_every folds its index
    mid-stream, and a later near-dup is still rejected against the
    FOLDED sketches."""
    from sifts_spark.streaming.dedup import _index_layout

    sink = _sink(col, tmp_path, compact_every=3)
    words = lambda b: " ".join(f"w{b}x{j}" for j in range(30))  # noqa: E731
    for b in range(9):
        sink(_df(spark, [(f"u{b}", words(b))]), b)
    folds, batches, _ = _index_layout(spark, str(tmp_path / "index"))
    assert folds and len(batches) < 3
    # near-dup of u4 (accepted five batches ago, now living in a fold)
    sink(_df(spark, [("dup", words(4) + " tail")]), 9)
    ids = {r["id"] for r in col.docs().collect()}
    assert "dup" not in ids and {f"u{b}" for b in range(9)} <= ids


def test_compaction_failure_does_not_kill_the_stream(col, spark, tmp_path,
                                                     monkeypatch):
    """r7 ADVICE: compaction runs AFTER the batch commits (mark), so a
    transient FS error there must be swallowed — foreachBatch propagates
    exceptions and would kill the streaming query for work that is safe
    to retry next batch."""
    import sifts_spark.streaming.dedup as SD

    monkeypatch.setattr(
        SD, "compact_sketch_index",
        lambda *a, **k: (_ for _ in ()).throw(OSError("transient FS")),
    )
    sink = _sink(col, tmp_path, compact_every=1)
    sink(_df(spark, [("ok", BASE)]), 0)  # must NOT raise
    assert {r["id"] for r in col.docs().collect()} == {"ok"}
    # the next batch still ingests (and would retry compaction)
    sink(_df(spark, [("ok2", "entirely different words here")]), 1)
    assert {r["id"] for r in col.docs().collect()} == {"ok", "ok2"}


def test_resent_id_keeps_accepted_precedence(col, spark, tmp_path):
    """ADVICE r6: a batch that re-sends an already-accepted id is an
    upsert — pairs sourced from that id's index rows must classify as
    accepted-vs-new (challenger rejected), not within-batch min-id.
    'a0' < 'resent' alphabetically is deliberately NOT the case here:
    challenger 'a0' would WIN a min-id tie, so acceptance of the resent
    doc's precedence is observable."""
    sink = _sink(col, tmp_path)
    sink(_df(spark, [("resent", BASE)]), 0)
    # same id re-sent in batch 1 alongside a new near-dup challenger
    # whose id sorts BEFORE it
    sink(_df(spark, [("resent", BASE), ("a0", BASE + " tail")]), 1)
    ids = {r["id"] for r in col.docs().collect()}
    assert ids == {"resent"}


def test_sink_inherits_collection_tokenizer(store_root, spark, tmp_path):
    # a cjk_bigram-pinned collection's stream gate sketches at bigram
    # granularity: an unspaced CJK near-dup (one appended char — the
    # deterministic md5 band collision pinned in test_cjk_tokenize) is
    # rejected across batches, where the unicode family would see two
    # unrelated whole-run tokens and admit it
    cjk = Collection(store_root, "sdcjk", spark=spark, tokenizer="cjk_bigram")
    sink = make_dedup_sink(
        cjk, str(tmp_path / "ck1"), str(tmp_path / "ix1"),
        jaccard_threshold=0.5,
    )
    sink(_df(spark, [("a", "机器学习是人工智能的分支")]), 0)
    sink(_df(spark, [("b", "机器学习是人工智能的分支了")]), 1)
    assert {r["id"] for r in cjk.docs().collect()} == {"a"}

    uni = Collection(store_root, "sduni", spark=spark)
    sink_u = make_dedup_sink(
        uni, str(tmp_path / "ck2"), str(tmp_path / "ix2"),
        jaccard_threshold=0.5,
    )
    sink_u(_df(spark, [("a", "机器学习是人工智能的分支")]), 0)
    sink_u(_df(spark, [("b", "机器学习是人工智能的分支了")]), 1)
    assert {r["id"] for r in uni.docs().collect()} == {"a", "b"}


def test_index_dir_family_marker_guards_mismatch(store_root, spark, tmp_path):
    # the sketch index records its family at first write; a sink that
    # would sketch under a different family refuses instead of silently
    # under-rejecting (band keys from different families never align)
    cjk = Collection(store_root, "mk1", spark=spark, tokenizer="cjk_bigram")
    idx = str(tmp_path / "ix")
    sink = make_dedup_sink(cjk, str(tmp_path / "ck"), idx)
    sink(_df(spark, [("a", "机器学习是人工智能的分支")]), 0)
    # same family reattaches fine (restart path)
    make_dedup_sink(cjk, str(tmp_path / "ck"), idx)
    # a different family against the same index_dir raises
    uni = Collection(store_root, "mk2", spark=spark)
    with pytest.raises(ValueError, match="built under"):
        make_dedup_sink(uni, str(tmp_path / "ck2"), idx)
    # legacy pre-marker dirs with existing batches resolve to the
    # default family: strip the marker and reattach
    import os
    os.remove(os.path.join(idx, "_tokenizer"))
    with pytest.raises(ValueError, match="built under"):
        make_dedup_sink(cjk, str(tmp_path / "ck3"), idx)  # cjk vs default
    make_dedup_sink(uni, str(tmp_path / "ck4"), idx)  # default ok


def test_retokenize_sketch_index_lifecycle(store_root, spark, tmp_path):
    # r15: collection retokenize() must not strand the streaming dedup
    # index — the rebuild verb re-sketches the live snapshot under the
    # new family into one covering fold, reclaims old-family dirs, and
    # the resumed stream accepts/rejects correctly under the new family
    from sifts_spark.streaming.dedup import retokenize_sketch_index

    col = Collection(store_root, "rtk1", spark=spark)  # unicode default
    idx = str(tmp_path / "ix")
    sink = make_dedup_sink(col, str(tmp_path / "ck"), idx)
    # under unicode, the one-char-appended CJK near-dup is two
    # unrelated whole-run tokens → both accepted
    sink(_df(spark, [("a", "机器学习是人工智能的分支")]), 0)
    sink(_df(spark, [("b", "机器学习是人工智能的分支了")]), 1)
    assert {r["id"] for r in col.docs().collect()} == {"a", "b"}

    col.retokenize("cjk_bigram")
    # the stranded-index state the verb exists for: family mismatch
    with pytest.raises(ValueError, match="built under"):
        make_dedup_sink(col, str(tmp_path / "ck"), idx)

    out = retokenize_sketch_index(col, idx)
    assert out["tokenizer"] == "cjk_bigram"
    assert out["resketched"] == 2
    assert out["fold"] == "0-1"
    assert sorted(out["reclaimed"]) == ["batch=0", "batch=1"]

    # resumed stream (same index_dir, monotone batch ids): a near-dup
    # of an ACCEPTED doc is now rejected at bigram granularity, a
    # genuinely new doc still lands
    sink2 = make_dedup_sink(col, str(tmp_path / "ck"), idx)
    sink2(
        _df(
            spark,
            [
                ("c", "机器学习是人工智能的分支的"),  # ~a under cjk_bigram
                ("d", "完全不同的另一篇文档内容在这里"),
            ],
        ),
        2,
    )
    assert {r["id"] for r in col.docs().collect()} == {"a", "b", "d"}


def test_retokenize_sketch_index_concurrent_writer_guard(
    store_root, spark, tmp_path, monkeypatch
):
    # ADVICE r16: a sink micro-batch committed between the layout
    # snapshot and the final marker stamp carries OLD-family sketches
    # with an id above the rebuild fold's hi — the verb must raise and
    # leave the rebuilding: sentinel (sinks keep failing loudly)
    # instead of stamping the mixed index clean.
    import os

    import sifts_spark.operators.dedup as dedup_ops
    from sifts_spark.streaming.dedup import retokenize_sketch_index

    col = Collection(store_root, "rtk4", spark=spark)
    idx = str(tmp_path / "ix")
    sink = make_dedup_sink(col, str(tmp_path / "ck"), idx)
    sink(_df(spark, [("a", "机器学习是人工智能的分支")]), 0)
    col.retokenize("cjk_bigram")

    real = dedup_ops.minhash_banded_sketches

    def racing(*args, **kw):
        # simulate a still-running sink committing batch 5 mid-rebuild
        os.makedirs(f"{idx}/batch=5", exist_ok=True)
        return real(*args, **kw)

    monkeypatch.setattr(dedup_ops, "minhash_banded_sketches", racing)
    with pytest.raises(RuntimeError, match="still writing"):
        retokenize_sketch_index(col, idx)
    monkeypatch.undo()
    # sentinel stays: sinks raise until the verb completes
    with open(f"{idx}/_tokenizer") as f:
        assert f.read() == "rebuilding:cjk_bigram"
    with pytest.raises(ValueError, match="built under"):
        make_dedup_sink(col, str(tmp_path / "ck2"), idx)
    # re-run with the writer stopped: the new snapshot covers the late
    # batch (hi=5), the rebuild completes, and the stamp lands
    out = retokenize_sketch_index(col, idx)
    assert out["tokenizer"] == "cjk_bigram" and out["fold"] == "0-5"
    with open(f"{idx}/_tokenizer") as f:
        assert f.read() == "cjk_bigram"


def test_retokenize_sketch_index_empty_and_interrupted(
    store_root, spark, tmp_path
):
    from sifts_spark.streaming.dedup import retokenize_sketch_index

    # empty index (nothing committed): only the marker moves
    col = Collection(store_root, "rtk2", spark=spark, tokenizer="cjk_bigram")
    idx = str(tmp_path / "ix")
    out = retokenize_sketch_index(col, idx)
    assert out == {
        "tokenizer": "cjk_bigram", "resketched": 0,
        "fold": None, "reclaimed": [],
    }
    # r14 advice #2: marker present but zero committed batches — a
    # different-family sink adopts its own family instead of raising
    uni = Collection(store_root, "rtk3", spark=spark)
    make_dedup_sink(uni, str(tmp_path / "ck"), idx)
    with open(f"{idx}/_tokenizer") as f:
        assert f.read() == "unicode"

    # interrupted rebuild: the sentinel marker makes every sink raise
    # until the verb is re-run (idempotent completion)
    sink = make_dedup_sink(uni, str(tmp_path / "ck"), idx)
    sink(_df(spark, [("a", "alpha beta gamma delta")]), 0)
    uni.store._write_small_text_atomic(
        f"{idx}/_tokenizer", "rebuilding:cjk_bigram"
    )
    with pytest.raises(ValueError, match="built under"):
        make_dedup_sink(uni, str(tmp_path / "ck2"), idx)
    uni.retokenize("cjk_bigram")
    out = retokenize_sketch_index(uni, idx)
    assert out["tokenizer"] == "cjk_bigram" and out["resketched"] == 1
    make_dedup_sink(uni, str(tmp_path / "ck3"), idx)  # reattaches clean
