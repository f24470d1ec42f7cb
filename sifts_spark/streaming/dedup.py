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
  batch N+1 dedups against batch N with no rebuild.

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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from sifts_spark.collection import _AUTO_METADATA, SparkCollection

logger = logging.getLogger(__name__)

_SKETCH_SCHEMA = (
    "id string, sh array<string>, band int, key string"
)


def _read_sketch_index(spark, index_dir: str) -> DataFrame:
    """The accepted-docs sketch index, or an empty frame before the
    first commit (absent dir / no parquet yet)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(index_dir)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(p) and len(fs.globStatus(
        jvm.org.apache.hadoop.fs.Path(f"{index_dir}/batch=*/[!_.]*")
    ) or []) > 0:
        return spark.read.schema(_SKETCH_SCHEMA).option(
            "basePath", index_dir
        ).parquet(f"{index_dir}/batch=*").select("id", "sh", "band", "key")
    return spark.createDataFrame([], _SKETCH_SCHEMA)


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
):
    """foreachBatch sink: reject near-dups, append survivors, grow the
    index. Same durable-marker idempotency contract as
    :func:`~sifts_spark.streaming.ingest.make_idempotent_sink` —
    stable caller-supplied ids give end-to-end exactly-once; the index
    write is per-batch-dir overwrite, so replays rewrite rather than
    double. Requires ``id_col`` present (dedup decisions must name
    stable ids; minting uuids per replay would break both idempotency
    and the keep-canonical rule)."""
    from sifts_spark.operators.dedup import (
        duplicate_clusters,
        minhash_banded_sketches,
        minhash_lsh_pairs_incremental,
        report_dropped_buckets,
    )

    from sifts_spark.streaming.ingest import durable_commit_markers

    spark = collection.store.spark
    seen, mark = durable_commit_markers(spark, checkpoint_dir)

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
            pairs = minhash_lsh_pairs_incremental(
                batch, index, id_col=id_col, text_col=content_col,
                num_hashes=num_hashes, bands=bands,
                shingle_size=shingle_size,
                jaccard_threshold=jaccard_threshold,
                max_bucket_size=max_bucket_size,
            )
            new_ids = batch.select(F.col(id_col).alias("id"))
            # classify endpoints: a pair side is "new" iff its id is in
            # this batch (both frames are batch-sized -> broadcast)
            an = F.broadcast(new_ids.select(F.col("id").alias("id_a"))
                             .withColumn("_an", F.lit(True)))
            bn = F.broadcast(new_ids.select(F.col("id").alias("id_b"))
                             .withColumn("_bn", F.lit(True)))
            flagged = (
                pairs.join(an, "id_a", "left").join(bn, "id_b", "left")
                .withColumn("_an", F.coalesce("_an", F.lit(False)))
                .withColumn("_bn", F.coalesce("_bn", F.lit(False)))
                .persist()
            )
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
                    shingle_size=shingle_size,
                ).write.mode("overwrite").parquet(
                    f"{index_dir.rstrip('/')}/batch={batch_id}"
                )
            report_dropped_buckets()
        finally:
            for df in cached:
                df.unpersist()
        mark(batch_id)

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
