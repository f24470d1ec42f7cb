"""Log-structured partitioned-Parquet document store.

Replaces the reference's mutable row stores (SQLite b-tree / PG heap,
/root/reference/src/sifts/core.py:457-482, :603-632) with an append-only
layout that gives Spark-native upsert/delete WITHOUT requiring Delta:

    root/
      name=<collection>/          <- partition column: tenant pruning
        batch=<n>/part-*.parquet  <- monotonically increasing write batches
      _postings/                  <- derived FTS postings (operators/search)

* ``add`` appends a new ``batch=N`` directory — never rewrites live data,
  so concurrent readers see a consistent snapshot (reads list batch dirs
  at plan time).
* upsert-on-conflict (core.py:493-501 ``ON CONFLICT(id) DO UPDATE``) is
  resolved AT READ: ``row_number() OVER (PARTITION BY id ORDER BY batch
  DESC) = 1`` keeps the newest version of each id.
* ``delete`` appends tombstone rows (``deleted=true``); the read path
  filters them after dedup — classic LSM semantics.
* ``delete_all`` drops the ``name=X`` partition (a metadata/fs operation,
  like Delta ``replaceWhere`` — core.py:386-400 parity).
* ``compact()`` folds a collection's batches into one, bounding the
  read-time dedup cost; at 100 TB you run it on a schedule exactly like
  Delta OPTIMIZE.

**Object-store safe**: every layout/metadata operation (batch discovery,
partition drop, compaction cleanup) goes through the Hadoop FileSystem
API resolved from the root's scheme — the identical code path serves
local disk, ``file://``, ``hdfs://``, ``s3a://``, ``gs://``, ``abfs://``.
No driver-side POSIX directory calls anywhere: at 100 TB the store
lives on an object store that those calls would simply not see.

Schema evolution (reference core.py:472-482 ``PRAGMA table_info`` +
``ALTER TABLE ADD COLUMN`` parity): DOC_SCHEMA is the canonical superset;
``append_batch`` fills any absent nullable column with NULL, and the read
path always presents the canonical schema (missing columns in old batch
files read as NULL via explicit-schema parquet reads) — an old store
created before a column existed keeps working, like the reference's
lazily ALTERed tables.

Scale notes: the dedup shuffle is per-collection (partition-pruned) and
keyed by ``id`` — the same shuffle a Delta MERGE pays. A freshly
compacted collection has exactly one version per id, and AQE coalesces
the near-empty post-filter partitions.
"""

from __future__ import annotations

import os
import re
import urllib.parse

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Canonical document schema (reference core.py:457-482 + embedding column).
# metadata is a JSON STRING (schemaless, like SQLite's JSON TEXT column);
# embedding is ARRAY<FLOAT> (pgvector parity, float32 storage).
DOC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
        T.StructField("metadata", T.StringType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("deleted", T.BooleanType(), False),
    ]
)

_NAME_RE = re.compile(r"^[-a-zA-Z0-9_\+~#=/]+$")


def validate_name(name: str) -> str:
    """Collection-name validation (reference core.py:93-97)."""
    if not name or not isinstance(name, str) or not _NAME_RE.match(name):
        raise ValueError(
            "Collection name must be a non-empty string matching "
            "[-a-zA-Z0-9_+~#=/]+"
        )
    return name


def normalize_root(root: str) -> str:
    """Scheme-preserving root normalization: URIs pass through untouched
    (``hdfs://``, ``s3a://``, ``file://`` …); bare local paths are
    absolutized so the store is stable under driver cwd changes."""
    if "://" in root or root.startswith("file:"):
        return root.rstrip("/")
    return os.path.abspath(root)


def resolve_snapshot(raw: DataFrame) -> DataFrame:
    """LSM snapshot resolution: newest version per ``id`` wins
    (``batch`` descending), tombstones (``deleted``) dropped after the
    version race — the read-time equivalent of the reference's
    ``ON CONFLICT(id) DO UPDATE`` + ``DELETE`` (core.py:493-501,
    :370-384).

    Shared by :meth:`DocumentStore.read` and the catalog's
    ``store_snapshot`` oracle entry, so the write-path semantics (W1
    upsert / W5 delete) are pinned by the DuckDB correctness gate, not
    only by pytest. One shuffle keyed by ``id``."""
    w = Window.partitionBy("id").orderBy(F.col("batch").desc())
    return (
        raw.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (~F.col("deleted")))
        .drop("_rn", "batch")
    )


class DocumentStore:
    """One storage root holding many named collections (multi-tenant,
    reference core.py:226: one physical table, ``name``-filtered)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = normalize_root(root)
        jvm = spark._jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        # FileSystem resolved from the ROOT's scheme — local, HDFS and
        # object stores all route through this one handle.
        self._fs = self._Path(self.root).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )
        self._fs.mkdirs(self._Path(self.root))

    # ---- layout helpers (driver-side fs metadata ops, like a catalog) ----
    # All go through the Hadoop FileSystem API: object-store safe.

    def _exists(self, path: str) -> bool:
        return self._fs.exists(self._Path(path))

    def _ls_names(self, path: str) -> list[str]:
        if not self._exists(path):
            return []
        return [
            st.getPath().getName() for st in self._fs.listStatus(self._Path(path))
        ]

    def _delete_dir(self, path: str) -> None:
        if self._exists(path):
            self._fs.delete(self._Path(path), True)

    def _partition_dir(self, name: str) -> str:
        return f"{self.root}/name={urllib.parse.quote(name, safe='')}"

    _BATCH_DIR_RE = re.compile(r"^batch=(\d+)$")
    _RESERVE_RE = re.compile(r"^\.reserve-batch-(\d+)$")

    def _batch_dirs(self, name: str) -> list[str]:
        return sorted(
            d for d in self._ls_names(self._partition_dir(name))
            if self._BATCH_DIR_RE.match(d)
        )

    def next_batch(self, name: str) -> int:
        """Next unclaimed batch number: one past the max over BOTH
        written batch dirs and in-flight reservation markers, so a
        writer that reserved but hasn't materialized its dir yet still
        holds its number against other writers."""
        nums = [0]
        for d in self._ls_names(self._partition_dir(name)):
            m = self._BATCH_DIR_RE.match(d) or self._RESERVE_RE.match(d)
            if m:
                nums.append(int(m.group(1)))
        return max(nums) + 1

    def reserve_batch(self, name: str) -> int:
        """Atomically claim the next batch number via a marker file.

        ``FileSystem.createNewFile`` is atomic on local disk and HDFS
        (O_EXCL / namenode create): of two racing writers exactly one
        wins a number, the loser re-lists and claims the next. On
        eventual-consistency object stores without atomic create the
        marker narrows but cannot close the race — there, run one
        writer per collection (the same contract Delta's S3 single-
        writer LogStore documents) or front writes with a queue.

        The marker outlives a FAILED write on purpose: the number stays
        burned, so a half-written ``batch=N`` dir can never be claimed
        by a later writer; readers never see N because ``_batch_dirs``
        lists only materialized dirs and ``append_batch`` removes the
        marker only after its write commits."""
        part = self._partition_dir(name)
        self._fs.mkdirs(self._Path(part))
        for _ in range(64):
            batch = self.next_batch(name)
            marker = self._Path(f"{part}/.reserve-batch-{batch}")
            try:
                if self._fs.createNewFile(marker):
                    return batch
            except Exception:
                pass  # lost the race for this number — re-list, try next
        raise RuntimeError(
            f"could not reserve a write batch for collection {name!r} "
            "after 64 attempts — writer storm or stuck reservation markers"
        )

    def collection_names(self) -> list[str]:
        return sorted(
            urllib.parse.unquote(d.split("=", 1)[1])
            for d in self._ls_names(self.root)
            if d.startswith("name=")
        )

    # ---- write path ----

    def append_batch(self, name: str, df: DataFrame) -> int:
        """Append one batch (columns of DOC_SCHEMA minus partition cols).

        Schema evolution: columns of DOC_SCHEMA absent from ``df`` are
        filled with NULL (except ``deleted`` → false), so callers with
        older/narrower shapes keep working — the reference's lazy
        ALTER-ADD-COLUMN parity (core.py:472-482)."""
        cols = []
        for f in DOC_SCHEMA.fields:
            if f.name in df.columns:
                cols.append(F.col(f.name).cast(f.dataType))
            elif f.name == "deleted":
                cols.append(F.lit(False).alias("deleted"))
            elif f.name == "id":
                raise ValueError("append_batch requires an 'id' column")
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        batch = self.reserve_batch(name)
        out = f"{self._partition_dir(name)}/batch={batch}"
        df.select(*cols).write.mode("errorifexists").parquet(out)
        # Write committed: the dir itself now claims the number; the
        # marker's remaining job (shielding an in-flight write) is done.
        self._fs.delete(self._Path(f"{self._partition_dir(name)}/.reserve-batch-{batch}"), False)
        return batch

    def drop_collection(self, name: str) -> None:
        self._delete_dir(self._partition_dir(name))
        self._delete_dir(self._postings_dir(name))
        self._delete_dir(self._doclen_dir(name))

    def compact(self, name: str, postings: bool = False) -> None:
        """Fold all batches of a collection into a single new batch;
        stale postings batches are dropped with their docs batches (the
        OPTIMIZE moment where liveness-join dead weight is reclaimed)."""
        old = self._batch_dirs(name)
        if len(old) <= 1:
            return
        current = self.read(name)
        # Materialize the deduped snapshot into a NEW batch dir (never
        # overwrite inputs mid-read), then drop the superseded batches.
        batch = self.reserve_batch(name)
        out = f"{self._partition_dir(name)}/batch={batch}"
        current.select([f.name for f in DOC_SCHEMA.fields]).write.parquet(out)
        self._fs.delete(
            self._Path(f"{self._partition_dir(name)}/.reserve-batch-{batch}"), False
        )
        for d in old:
            self._delete_dir(f"{self._partition_dir(name)}/{d}")
        for d in self._postings_batch_dirs(name):
            if d != f"batch={batch}":
                self._delete_dir(f"{self._postings_dir(name)}/{d}")
        for d in self._doclen_batch_dirs(name):
            if d != f"batch={batch}":
                self._delete_dir(f"{self._doclen_dir(name)}/{d}")
        if postings:
            self.maintain_postings(name)

    # ---- read path ----

    def read_raw(self, name: str) -> DataFrame:
        """All batches of one collection, versions + tombstones included."""
        dirs = self._batch_dirs(name)
        if not dirs:
            return self.spark.createDataFrame([], DOC_SCHEMA).withColumn(
                "batch", F.lit(0).cast("long")
            )
        # basePath keeps the batch partition column; the name= filter is
        # done by path selection => partition pruning by construction.
        return self.spark.read.schema(DOC_SCHEMA).option(
            "basePath", self._partition_dir(name)
        ).parquet(
            *[f"{self._partition_dir(name)}/{d}" for d in dirs]
        )

    def read(self, name: str) -> DataFrame:
        """Current snapshot: newest version per id, tombstones dropped."""
        return resolve_snapshot(self.read_raw(name))

    def live_versions(self, name: str) -> DataFrame:
        """(id, batch) of the winning non-deleted version per id — a
        column-pruned scan (parquet reads id/batch/deleted only)."""
        raw = self.read_raw(name).select("id", "batch", "deleted")
        w = Window.partitionBy("id").orderBy(F.col("batch").desc())
        return (
            raw.withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_rn") == 1) & (~F.col("deleted")))
            .select("id", "batch")
        )

    # ---- derived postings index (W3: FTS5/GIN replacement) -------------
    #
    # Incrementally maintained: every docs batch gets a postings batch
    # derived from the WRITTEN parquet (one evaluation of the caller's
    # plan even with non-deterministic columns like uuid() ids), written
    # term-sorted so a term lookup is a row-group probe. Staleness is
    # resolved at read by joining on the live (id, batch) winners —
    # Lucene-segment semantics: stale postings are dead weight until
    # ``compact`` physically drops them. Crash between docs write and
    # postings write self-heals: a missing postings batch is rebuilt
    # lazily (and repaired on the next ``maintain_postings`` call).
    # Reference analog: fts index maintained on every add
    # (/root/reference/src/sifts/core.py:504-514).

    def _postings_dir(self, name: str) -> str:
        return f"{self.root}/_postings/name={urllib.parse.quote(name, safe='')}"

    def _postings_batch_dirs(self, name: str) -> list[str]:
        return sorted(
            d for d in self._ls_names(self._postings_dir(name))
            if d.startswith("batch=")
        )

    # ---- doclen sidecar (corpus stats without touching the index) ------
    #
    # BM25 needs (N, avgdl) over the LIVE snapshot. Deriving them from
    # the postings index is a full index-stats scan per query — the
    # scale-killer FTS5/GIN avoid by materializing stats. The Spark
    # answer is a Lucene-norms-style sidecar: one (id, dl) row per doc
    # per batch, written beside each postings batch. Stats then cost a
    # two-column scan of ~N tiny rows joined to the live winners —
    # postings-index-size-independent — and the Collection facade
    # memoizes the resulting two scalars per store snapshot.

    def _doclen_dir(self, name: str) -> str:
        return f"{self.root}/_doclen/name={urllib.parse.quote(name, safe='')}"

    def _doclen_batch_dirs(self, name: str) -> list[str]:
        return sorted(
            d for d in self._ls_names(self._doclen_dir(name))
            if d.startswith("batch=")
        )

    def _read_batch_docs(self, name: str, batch_dir: str) -> DataFrame:
        return self.spark.read.schema(DOC_SCHEMA).parquet(
            f"{self._partition_dir(name)}/{batch_dir}"
        )

    def _build_batch_postings(self, name: str, batch_dir: str) -> DataFrame:
        from sifts_spark.operators.search import build_postings

        batch = int(batch_dir.split("=", 1)[1])
        docs = self._read_batch_docs(name, batch_dir).filter(~F.col("deleted"))
        return build_postings(docs, "id", "content").withColumn(
            "batch", F.lit(batch).cast("long")
        )

    def maintain_postings(self, name: str) -> None:
        """Write postings (and doclen-sidecar) batches for every docs
        batch that lacks one (normally exactly the batch just appended).
        Idempotent; overwrite mode heals partial writes."""
        have = set(self._postings_batch_dirs(name))
        for d in self._batch_dirs(name):
            if d in have:
                continue
            p = self._build_batch_postings(name, d)
            # term-sorted within files => parquet min/max row-group
            # skipping turns a term lookup into an index probe; the term
            # bloom filter additionally drops groups on rare-term misses
            p.sortWithinPartitions("term", "id").write.mode(
                "overwrite"
            ).option("parquet.bloom.filter.enabled#term", "true").parquet(
                f"{self._postings_dir(name)}/{d}"
            )
        # Doclens derive from the WRITTEN postings parquet (no second
        # tokenize pass); a doclen batch trails its postings batch only
        # across a crash, and heals here / lazily in read_doclens.
        have_dl = set(self._doclen_batch_dirs(name))
        for d in self._postings_batch_dirs(name):
            if d in have_dl:
                continue
            self._batch_doclens_from_postings(name, d).write.mode(
                "overwrite"
            ).parquet(f"{self._doclen_dir(name)}/{d}")

    def _batch_doclens_from_postings(self, name: str, batch_dir: str) -> DataFrame:
        batch = int(batch_dir.split("=", 1)[1])
        return (
            self.spark.read.parquet(f"{self._postings_dir(name)}/{batch_dir}")
            .groupBy("id")
            .agg(F.first("dl").alias("dl"))
            .withColumn("batch", F.lit(batch).cast("long"))
        )

    def read_postings(self, name: str) -> DataFrame:
        """Live postings (term, id, dl, tf) — one lazy plan.

        On-disk postings batches are unioned with lazily-built postings
        for any docs batch not yet indexed (crash healing / stores
        written with use_fts off), then joined with the live (id, batch)
        winners so stale versions and tombstoned docs drop out."""
        docs_dirs = self._batch_dirs(name)
        POSTINGS_SCHEMA = T.StructType(
            [
                T.StructField("term", T.StringType(), True),
                T.StructField("id", T.StringType(), True),
                T.StructField("dl", T.IntegerType(), True),
                T.StructField("tf", T.LongType(), True),
            ]
        )
        if not docs_dirs:
            return self.spark.createDataFrame([], POSTINGS_SCHEMA)
        have = set(self._postings_batch_dirs(name))
        on_disk = [d for d in docs_dirs if d in have]
        missing = [d for d in docs_dirs if d not in have]
        parts: list[DataFrame] = []
        if on_disk:
            parts.append(
                self.spark.read.schema(POSTINGS_SCHEMA)
                .option("basePath", self._postings_dir(name))
                .parquet(*[f"{self._postings_dir(name)}/{d}" for d in on_disk])
                .select("term", "id", "dl", "tf", F.col("batch").cast("long"))
            )
        for d in missing:
            parts.append(self._build_batch_postings(name, d))
        p = parts[0]
        for more in parts[1:]:
            p = p.unionByName(more)
        live = self.live_versions(name)
        return p.join(live, ["id", "batch"]).select("term", "id", "dl", "tf")

    def read_doclens(self, name: str) -> DataFrame:
        """Live (id, dl) for every doc with ≥1 token — the stats-sidecar
        read path. Missing sidecar batches (crash, use_fts=False stores)
        fall back to the batch postings (on disk if present, else built
        from the docs batch), so the result is always exact."""
        docs_dirs = self._batch_dirs(name)
        DL_SCHEMA = T.StructType(
            [
                T.StructField("id", T.StringType(), True),
                T.StructField("dl", T.IntegerType(), True),
                T.StructField("batch", T.LongType(), True),
            ]
        )
        if not docs_dirs:
            return self.spark.createDataFrame([], DL_SCHEMA)
        have = set(self._doclen_batch_dirs(name))
        have_postings = set(self._postings_batch_dirs(name))
        on_disk = [d for d in docs_dirs if d in have]
        parts: list[DataFrame] = []
        if on_disk:
            parts.append(
                self.spark.read.schema(DL_SCHEMA)
                .parquet(*[f"{self._doclen_dir(name)}/{d}" for d in on_disk])
            )
        for d in docs_dirs:
            if d in have:
                continue
            if d in have_postings:
                parts.append(self._batch_doclens_from_postings(name, d))
            else:
                batch = int(d.split("=", 1)[1])
                parts.append(
                    self._build_batch_postings(name, d)
                    .groupBy("id")
                    .agg(F.first("dl").alias("dl"))
                    .withColumn("batch", F.lit(batch).cast("long"))
                )
        p = parts[0]
        for more in parts[1:]:
            p = p.unionByName(more)
        live = self.live_versions(name)
        return p.join(live, ["id", "batch"]).select("id", "dl")

    def corpus_stats(self, name: str) -> tuple[int, float]:
        """(N, avgdl) of the live snapshot from the doclen sidecar — a
        tiny two-column scan, NOT a postings-index aggregation. Callers
        (Collection) memoize per store snapshot."""
        row = self.read_doclens(name).agg(
            F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
        ).first()
        return (row["n"] or 0), float(row["avgdl"] or 0.0)
