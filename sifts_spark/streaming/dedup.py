"""Streaming ingest with near-duplicate rejection at the door.

North-star extension (no reference analog — the reference ingests
synchronously and never dedups): continuous document arrival where each
micro-batch is MinHash-LSH-checked against everything already accepted
BEFORE it lands in the store, so the collection never accumulates
near-duplicates that a later batch job has to claw back. The composition:

* the idempotent foreachBatch bridge (streaming/ingest.py) supplies
  exactly-once per micro-batch via durable commit markers;
* :func:`~sifts_spark.operators.dedup.minhash_lsh_pairs_incremental`
  supplies increment-proportional candidate generation against a
  persisted sketch index — each batch pays for ITS buckets, the corpus
  is never re-sketched (the same index the batch path uses);
* within-batch duplicates resolve through
  :func:`~sifts_spark.operators.dedup.duplicate_clusters` (transitive:
  a chain a~b~c keeps exactly its canonical min id, not a greedy
  first-wins scattering);
* ACCEPTED docs append both to the collection and to the sketch index
  (``<index_dir>/batch=<micro_batch_id>``, overwrite mode — a replayed
  batch rewrites the identical sketches instead of doubling them), so
  batch N+1 dedups against batch N with no rebuild;
* the index is size-tiered-compacted in place
  (:func:`compact_sketch_index`): batch dirs fold into ``fold=<lo>-<hi>``
  ranges once ``compact_every`` of them accumulate, folds fold into
  bigger folds — so a stream running for months lists a bounded number
  of dirs per batch instead of one per micro-batch ever ingested.

Rejected docs never enter the index: a near-dup of an accepted doc is
dropped even if it arrives a thousand batches later, while two docs
that are only near-dups OF EACH OTHER'S REJECTS stay independent —
exactly the batch `dedup()` semantics, enforced online.

Scale shape per micro-batch: map-side sketching of the batch, a
broadcast semi-join pruning the (bucketed) index to touched buckets, a
candidate join proportional to collisions, batch-sized clustering.
Nothing corpus-sized moves.
"""

from __future__ import annotations

import logging
import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from sifts_spark.collection import _AUTO_METADATA, SparkCollection

logger = logging.getLogger(__name__)

_SKETCH_SCHEMA = (
    "id string, sh array<string>, band int, key string"
)

_BATCH_DIR_RE = re.compile(r"^batch=(\d+)$")
_FOLD_DIR_RE = re.compile(r"^fold=(\d+)-(\d+)$")


def _index_fs(spark, index_dir: str):
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(index_dir)
    return jvm, path.getFileSystem(spark._jsc.hadoopConfiguration()), path


def _index_layout(spark, index_dir: str) -> tuple:
    """Crash-consistent view of the sketch index directory →
    ``(folds, batches, stale)``:

    * ``folds`` — live fold ranges ``[(lo, hi), ...]``: dirs named
      ``fold=<lo>-<hi>`` whose ``_SUCCESS`` marker exists and whose
      range is NOT contained in another live fold (containment = the
      bigger fold already holds these rows — the small one is a
      not-yet-reclaimed compaction source);
    * ``batches`` — live micro-batch ids: ``batch=<n>`` dirs with n
      outside every live fold range (a covered dir is a compaction
      source whose deletion didn't land before a crash, or an
      already-folded batch a replay re-materialized — reading it would
      double its rows);
    * ``stale`` — dir names safe to reclaim: covered batch dirs,
      contained folds, and partial folds (no ``_SUCCESS``) covered by a
      live fold.
    """
    jvm, fs, root = _index_fs(spark, index_dir)
    if not fs.exists(root):
        return [], [], []
    all_folds: list[tuple[int, int, bool]] = []
    batch_ids: list[int] = []
    for st in fs.listStatus(root):
        if not st.isDirectory():
            continue
        name = st.getPath().getName()
        if m := _BATCH_DIR_RE.match(name):
            batch_ids.append(int(m.group(1)))
        elif m := _FOLD_DIR_RE.match(name):
            ok = fs.exists(
                jvm.org.apache.hadoop.fs.Path(f"{index_dir}/{name}/_SUCCESS")
            )
            all_folds.append((int(m.group(1)), int(m.group(2)), ok))
    live_folds = [
        (lo, hi)
        for lo, hi, ok in all_folds
        if ok
        and not any(
            (lo2 <= lo and hi <= hi2 and (lo2, hi2) != (lo, hi) and ok2)
            for lo2, hi2, ok2 in all_folds
        )
    ]
    covered = lambda n: any(lo <= n <= hi for lo, hi in live_folds)  # noqa: E731
    live_batches = sorted(b for b in batch_ids if not covered(b))
    stale = [f"batch={b}" for b in batch_ids if covered(b)] + [
        f"fold={lo}-{hi}"
        for lo, hi, ok in all_folds
        if (lo, hi) not in live_folds
        and any(lo2 <= lo and hi <= hi2 for lo2, hi2 in live_folds)
    ]
    return sorted(live_folds), live_batches, stale


def _has_data(jvm, fs, path: str) -> bool:
    gl = fs.globStatus(jvm.org.apache.hadoop.fs.Path(f"{path}/[!_.]*"))
    return gl is not None and len(gl) > 0


def _live_index_paths(spark, index_dir: str) -> list[str]:
    jvm, fs, _ = _index_fs(spark, index_dir)
    folds, batches, _stale = _index_layout(spark, index_dir)
    paths = [f"{index_dir}/fold={lo}-{hi}" for lo, hi in folds]
    paths += [f"{index_dir}/batch={b}" for b in batches]
    return [p for p in paths if _has_data(jvm, fs, p)]


def _read_sketch_index(spark, index_dir: str) -> DataFrame:
    """The accepted-docs sketch index (live folds + live batch dirs),
    or an empty frame before the first commit."""
    paths = _live_index_paths(spark, index_dir)
    if not paths:
        return spark.createDataFrame([], _SKETCH_SCHEMA)
    return spark.read.schema(_SKETCH_SCHEMA).parquet(*paths).select(
        "id", "sh", "band", "key"
    )


def compact_sketch_index(
    spark,
    index_dir: str,
    max_batch_dirs: int = 16,
    max_fold_dirs: int = 8,
    max_fold_bytes: int | None = None,
) -> dict:
    """Size-tiered compaction of the streaming sketch index — the
    ``DocumentStore.compact``/``vacuum`` posture applied to the
    ``stream_dedup_ingest`` sidecar, which otherwise accretes one
    ``batch=<micro_batch_id>`` dir per micro-batch forever (listing +
    task overhead per batch grows linearly with stream age).

    Two tiers, mirroring an LSM:

    * **minor** — when live ``batch=*`` dirs reach ``max_batch_dirs``,
      fold them into one ``fold=<lo>-<hi>`` dir. Work is
      increment-sized (never touches existing folds). Newest batch
      wins per id, so a re-sent (upserted) id keeps only its freshest
      sketches.
    * **major** — when live folds reach ``max_fold_dirs``, merge the
      maximal RECENT suffix of folds each under ``max_fold_bytes``
      (None = all of them, the full rewrite) into one covering fold;
      higher-range sources win per id. The suffix rule is the store's
      size-tier invariant: old big folds are left alone, so bytes
      rewritten stay tier-sized, not corpus-sized.

    Crash-safety without a manifest: a fold is LIVE only once its
    ``_SUCCESS`` lands, and readers (:func:`_index_layout`) ignore any
    batch dir covered by a live fold's range and any fold contained in
    a bigger live fold — so the write-fold-then-delete-sources protocol
    never double-counts, whichever step a crash interrupts; orphaned
    sources are reclaimed as ``stale`` on the next call. Safe because
    the sink is the index's only reader/writer and micro-batches are
    sequential (no reader can be mid-plan on a source being reclaimed —
    the multi-writer store needs vacuum retention for that; this
    sidecar does not).

    Returns ``{"minor": bool, "major": bool, "reclaimed": int}``.
    """
    jvm, fs, _root = _index_fs(spark, index_dir)
    Path = jvm.org.apache.hadoop.fs.Path
    out = {"minor": False, "major": False, "reclaimed": 0}

    def _reclaim() -> None:
        _folds, _batches, stale = _index_layout(spark, index_dir)
        for name in stale:
            try:
                fs.delete(Path(f"{index_dir}/{name}"), True)
                out["reclaimed"] += 1
            except Exception:  # pragma: no cover - best-effort cleanup
                logger.warning("sketch-index reclaim failed for %s", name)

    _reclaim()
    folds, batches, _stale = _index_layout(spark, index_dir)

    def _tagged(path: str, rank: int) -> DataFrame:
        return spark.read.schema(_SKETCH_SCHEMA).parquet(path).withColumn(
            "_b", F.lit(rank)
        )

    def _fold(frames: list[DataFrame], lo: int, hi: int) -> None:
        src = frames[0]
        for f in frames[1:]:
            src = src.unionByName(f)
        w = Window.partitionBy("id")
        (
            src.withColumn("_mb", F.max("_b").over(w))
            .filter(F.col("_b") == F.col("_mb"))
            .select("id", "sh", "band", "key")
            .write.mode("overwrite")
            .parquet(f"{index_dir}/fold={lo}-{hi}")
        )

    if len(batches) >= max_batch_dirs:
        frames = [
            _tagged(f"{index_dir}/batch={b}", b)
            for b in batches
            if _has_data(jvm, fs, f"{index_dir}/batch={b}")
        ]
        if frames:
            _fold(frames, min(batches), max(batches))
            out["minor"] = True
            _reclaim()
            folds, batches, _stale = _index_layout(spark, index_dir)

    if len(folds) >= max_fold_dirs:
        suffix = list(folds)
        if max_fold_bytes is not None:
            suffix = []
            for lo, hi in reversed(folds):
                size = fs.getContentSummary(
                    Path(f"{index_dir}/fold={lo}-{hi}")
                ).getLength()
                if size >= max_fold_bytes:
                    break
                suffix.append((lo, hi))
            suffix = list(reversed(suffix))
        if len(suffix) > 1:
            frames = [
                _tagged(f"{index_dir}/fold={lo}-{hi}", hi) for lo, hi in suffix
            ]
            _fold(frames, suffix[0][0], suffix[-1][1])
            out["major"] = True
            _reclaim()
    return out


def retokenize_sketch_index(
    collection: SparkCollection,
    index_dir: str,
    tokenizer: str | None = None,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_size: int = 3,
) -> dict:
    """Rebuild the streaming sketch index under a new tokenizer family
    — the :meth:`Collection.retokenize` verb for the
    :func:`stream_dedup_ingest` sidecar (r14 shipped the mismatch
    RAISE; without this verb a collection retokenize stranded its
    streaming dedup index permanently).

    Re-sketches the collection's LIVE snapshot (the accepted docs —
    rejected docs never entered the index) under ``tokenizer``
    (default: the collection's pinned ``_tokenizer`` marker, i.e. what
    a post-``retokenize()`` collection now uses) into ONE fold covering
    every live batch/fold range, reclaims the old-family dirs, and
    re-stamps the index marker — so the SAME ``index_dir`` and
    checkpoint keep working: the next micro-batch id is greater than
    every id the fold covers (batch ids are monotone per checkpoint),
    so it is never masked by the rebuild fold.

    Crash-safe by sentinel: the marker is first set to
    ``rebuilding:<family>`` (atomic), then the fold is written
    (overwrite + ``_SUCCESS``), stale sources reclaimed, and only then
    the final family stamped — an interruption anywhere leaves a
    marker no sink family can match, so the next
    :func:`make_dedup_sink` raises loudly and re-running this verb
    (idempotent: snapshot re-read, fold overwritten, marker re-stamped)
    completes the upgrade. Sketch params must match the sink's
    (``num_hashes``/``bands``/``shingle_size`` — band keys are
    positional).

    **STOP the stream first.** A sink micro-batch committed between
    the layout snapshot and the final marker stamp gets a batch id
    above the rebuild fold's ``hi`` — it survives reclaim carrying
    OLD-family sketches, and the final stamp would make the mix
    invisible (silent under-reject, the exact failure the marker
    exists to prevent). The verb guards this mechanically: after the
    fold lands it re-lists the layout and RAISES — leaving the
    ``rebuilding:`` sentinel in place, so sinks keep failing loudly —
    if any batch/fold id beyond ``hi`` appeared mid-rebuild; stop the
    writer and re-run the verb to recover (ADVICE r16).

    Returns ``{"tokenizer": family, "resketched": n_docs,
    "fold": "lo-hi" | None, "reclaimed": [dir, ...]}``.
    """
    from sifts_spark.functions.text import resolve_tokenizer
    from sifts_spark.operators.dedup import minhash_banded_sketches

    store = collection.store
    spark = store.spark
    if tokenizer is None:
        tokenizer = collection._tok_family()
    tokenizer = resolve_tokenizer(tokenizer)
    marker = f"{index_dir.rstrip('/')}/_tokenizer"
    jvm, fs, _root = _index_fs(spark, index_dir)
    folds, batches, _stale = _index_layout(spark, index_dir)
    if not folds and not batches:
        # Nothing ever committed — only the marker (if any) moves.
        store._write_small_text_atomic(marker, tokenizer)
        return {
            "tokenizer": tokenizer, "resketched": 0,
            "fold": None, "reclaimed": [],
        }
    lo = min([f[0] for f in folds] + list(batches))
    hi = max([f[1] for f in folds] + list(batches))
    store._write_small_text_atomic(marker, f"rebuilding:{tokenizer}")
    docs = collection.docs().select("id", "content").persist()
    try:
        n = docs.count()
        minhash_banded_sketches(
            docs, id_col="id", text_col="content",
            num_hashes=num_hashes, bands=bands,
            shingle_size=shingle_size, tokenizer=tokenizer,
        ).write.mode("overwrite").parquet(f"{index_dir}/fold={lo}-{hi}")
    finally:
        docs.unpersist()
    # The covering fold is live (its _SUCCESS landed), so every other
    # batch/fold dir inside [lo, hi] is now a stale compaction source.
    reclaimed: list[str] = []
    Path = jvm.org.apache.hadoop.fs.Path
    new_folds, new_batches, stale = _index_layout(spark, index_dir)
    # Concurrent-writer guard: ids beyond the snapshot's hi mean a sink
    # committed OLD-family sketches mid-rebuild. Raise BEFORE the final
    # stamp — the rebuilding: sentinel stays, sinks keep failing loudly,
    # and re-running the verb (with the stream stopped) recovers.
    late = sorted(
        {h for _lo, h in new_folds if h > hi}
        | {b for b in new_batches if b > hi}
    )
    if late:
        raise RuntimeError(
            f"sketch index {index_dir!r} gained batch ids {late} during "
            f"retokenize (snapshot covered <= {hi}): a dedup sink is "
            "still writing old-family sketches. Stop the stream, then "
            "re-run retokenize_sketch_index; the index marker stays "
            f"'rebuilding:{tokenizer}' so sinks fail loudly until then."
        )
    for name in stale:
        try:
            fs.delete(Path(f"{index_dir}/{name}"), True)
            reclaimed.append(name)
        except Exception:  # pragma: no cover - best-effort cleanup
            logger.warning("sketch-index reclaim failed for %s", name)
    store._write_small_text_atomic(marker, tokenizer)
    return {
        "tokenizer": tokenizer, "resketched": n,
        "fold": f"{lo}-{hi}", "reclaimed": reclaimed,
    }


def make_dedup_sink(
    collection: SparkCollection,
    checkpoint_dir: str,
    index_dir: str,
    id_col: str = "id",
    content_col: str = "content",
    metadata_col: str | None = _AUTO_METADATA,  # type: ignore[assignment]
    jaccard_threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_size: int = 3,
    max_bucket_size: int | None = 10_000,
    compact_every: int | None = 16,
    tokenizer: str | None = None,
):
    """foreachBatch sink: reject near-dups, append survivors, grow the
    index. Same durable-marker idempotency contract as
    :func:`~sifts_spark.streaming.ingest.make_idempotent_sink` —
    stable caller-supplied ids give end-to-end exactly-once; the index
    write is per-batch-dir overwrite, so replays rewrite rather than
    double. Requires ``id_col`` present (dedup decisions must name
    stable ids; minting uuids per replay would break both idempotency
    and the keep-canonical rule).

    Precedence: an already-ACCEPTED doc always beats a new near-dup —
    classified by sketch provenance (``include_origin``), so a re-sent
    id (an upsert) keeps accepted status: its index-backed pairs still
    reject the new challengers, and if it survives its own gate the
    re-send lands newest-wins in both collection and index (old
    sketches retire at the next compaction fold).

    ``compact_every``: once live ``batch=*`` dirs reach this count the
    sink runs :func:`compact_sketch_index` after committing — bounding
    per-batch listing cost on long-running streams (None disables).
    ``index_dir`` is coupled to ``checkpoint_dir``'s lifetime: batch
    ids must stay monotone, so restarting with a FRESH checkpoint needs
    a fresh index dir too.

    ``tokenizer`` defaults to the COLLECTION's pinned family (sticky
    ``_tokenizer`` marker — the find_duplicates contract), so a
    cjk_bigram collection's stream gate sketches at bigram granularity.
    The sketch index inherits that family at first write; band keys
    from different families never align, so ``retokenize()`` on a
    streamed collection must be followed by
    :func:`retokenize_sketch_index` on its ``index_dir`` (an old-family
    index would silently under-reject, never corrupt — the family
    marker below makes the mismatch a loud raise instead)."""
    from sifts_spark.operators.dedup import (
        duplicate_clusters,
        minhash_banded_sketches,
        minhash_lsh_pairs_incremental,
        report_dropped_buckets,
    )

    from sifts_spark.streaming.ingest import durable_commit_markers

    spark = collection.store.spark
    seen, mark = durable_commit_markers(spark, checkpoint_dir)
    if tokenizer is None:
        tokenizer = collection._tok_family()
    # The sketch index is family-coupled exactly like postings sidecars
    # (band keys from different families never align), so it carries
    # its own `_tokenizer` marker — without one, a library upgrade or
    # collection retokenize between restarts would silently sketch new
    # batches under a family the persisted index wasn't built with,
    # and the gate would stop rejecting (r14 review finding #2).
    # Absent marker + existing batches = a pre-marker index, which was
    # built under the then-hardwired default family. The STRICT read
    # distinguishes absent from unreadable — a transient FS failure
    # must propagate, not masquerade as "pre-marker" and let a
    # default-family sink clobber a real marker (r14 advice #1).
    from sifts_spark.functions.text import DEFAULT_TOKENIZER, resolve_tokenizer

    tokenizer = resolve_tokenizer(tokenizer)
    store = collection.store
    _marker = f"{index_dir.rstrip('/')}/_tokenizer"
    _on_disk = store._read_small_text_strict(_marker)
    _live = _live_index_paths(spark, index_dir)
    _recorded = _on_disk
    if _recorded is None and _live:
        _recorded = DEFAULT_TOKENIZER
    if _recorded is not None and _recorded != tokenizer:
        if _live:
            raise ValueError(
                f"sketch index at {index_dir!r} was built under "
                f"tokenizer={_recorded!r} but this sink would sketch "
                f"with {tokenizer!r} — band keys from different "
                "families never align, so the gate would silently stop "
                "rejecting. Rebuild it under the new family "
                "(streaming.dedup.retokenize_sketch_index), start a "
                "fresh index_dir (and checkpoint), or pass "
                f"tokenizer={_recorded!r} explicitly."
            )
        # Marker stamped at an earlier sink's construction (or by an
        # interrupted retokenize_sketch_index) but ZERO batches ever
        # committed: nothing is mis-sketched — adopt this sink's
        # family instead of demanding a manual delete of an empty
        # index_dir (r14 advice #2).
        store._write_small_text_atomic(_marker, tokenizer)
    elif _on_disk is None:
        store._write_small_text_atomic(_marker, tokenizer)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if seen(batch_id):
            return
        if id_col not in batch_df.columns:
            raise ValueError(
                f"dedup ingest requires a stable id column {id_col!r}; "
                "got columns " + str(batch_df.columns)
            )
        batch = batch_df.withColumn(id_col, F.col(id_col).cast("string"))
        if batch.isEmpty():
            mark(batch_id)
            return
        batch = batch.persist()
        cached = [batch]  # released in finally — a failed batch gets
        try:              # retried; stranding caches would leak per attempt
            index = _read_sketch_index(spark, index_dir)
            # endpoint origin rides the pairs themselves (a_new/b_new,
            # provenance-true): an id re-sent after acceptance keeps
            # accepted precedence instead of degrading its index-backed
            # pairs to within-batch min-id ties.
            flagged = minhash_lsh_pairs_incremental(
                batch, index, id_col=id_col, text_col=content_col,
                num_hashes=num_hashes, bands=bands,
                shingle_size=shingle_size,
                jaccard_threshold=jaccard_threshold,
                max_bucket_size=max_bucket_size,
                include_origin=True,
                tokenizer=tokenizer,
            ).withColumnRenamed("a_new", "_an").withColumnRenamed(
                "b_new", "_bn"
            ).persist()
            new_ids = batch.select(F.col(id_col).alias("id"))
            cached.append(flagged)
            # vs-accepted pairs: the new side always loses (the index
            # holds only docs already committed — first wins)
            cross_victims = (
                flagged.filter(F.col("_an") & ~F.col("_bn"))
                .select(F.col("id_a").alias("id"))
                .unionByName(
                    flagged.filter(F.col("_bn") & ~F.col("_an"))
                    .select(F.col("id_b").alias("id"))
                )
                .distinct()
            )
            # within-batch pairs among docs that survived the cross
            # check: transitive canonical keep (min id per component)
            nn = (
                flagged.filter(F.col("_an") & F.col("_bn"))
                .join(cross_victims.withColumnRenamed("id", "id_a"),
                      "id_a", "left_anti")
                .join(cross_victims.withColumnRenamed("id", "id_b"),
                      "id_b", "left_anti")
                .select("id_a", "id_b")
            )
            batch_victims = (
                duplicate_clusters(
                    new_ids.join(cross_victims, "id", "left_anti"), nn,
                    id_col="id",
                )
                .filter(F.col("id") != F.col("cluster_id"))
                .select("id")
            )
            victims = cross_victims.unionByName(batch_victims).persist()
            cached.append(victims)
            survivors = batch.join(
                victims.withColumnRenamed("id", id_col), id_col, "left_anti"
            ).persist()
            cached.append(survivors)
            n_in, n_victims = batch.count(), victims.count()
            if n_victims:
                logger.info(
                    "dedup ingest batch %s: rejected %d/%d near-dup docs",
                    batch_id, n_victims, n_in,
                )
            if n_victims < n_in:
                collection.add_dataframe(
                    survivors, id_col=id_col, content_col=content_col,
                    metadata_col=metadata_col,
                )
                # index the ACCEPTED docs only; per-batch dir overwrite
                # keeps replays idempotent
                minhash_banded_sketches(
                    survivors, id_col=id_col, text_col=content_col,
                    num_hashes=num_hashes, bands=bands,
                    shingle_size=shingle_size, tokenizer=tokenizer,
                ).write.mode("overwrite").parquet(
                    f"{index_dir.rstrip('/')}/batch={batch_id}"
                )
            report_dropped_buckets()
        finally:
            for df in cached:
                df.unpersist()
        mark(batch_id)
        if compact_every is not None:
            # Best-effort: the batch above already committed (mark ran),
            # and the compaction layout protocol is safe to retry on the
            # next batch — a transient FS error here must not kill the
            # streaming query (foreachBatch propagates exceptions).
            try:
                compact_sketch_index(
                    spark, index_dir, max_batch_dirs=compact_every
                )
            except Exception:
                logger.warning(
                    "dedup ingest batch %s: sketch-index compaction "
                    "failed; will retry on the next batch", batch_id,
                    exc_info=True,
                )

    return sink


def stream_dedup_ingest(
    stream_df: DataFrame,
    collection: SparkCollection,
    checkpoint_dir: str,
    index_dir: str,
    trigger_available_now: bool = True,
    **kwargs,
) -> StreamingQuery:
    """readStream source → near-dup-gated collection ingest (see
    :func:`make_dedup_sink` for the per-batch contract and kwargs)."""
    sink = make_dedup_sink(collection, checkpoint_dir, index_dir, **kwargs)
    writer = stream_df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
