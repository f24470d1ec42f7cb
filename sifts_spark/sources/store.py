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

Scale notes: the dedup shuffle is per-collection (partition-pruned) and
keyed by ``id`` — the same shuffle a Delta MERGE pays. A freshly
compacted collection has exactly one version per id, and AQE coalesces
the near-empty post-filter partitions.
"""

from __future__ import annotations

import os
import re
import shutil
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


class DocumentStore:
    """One storage root holding many named collections (multi-tenant,
    reference core.py:226: one physical table, ``name``-filtered)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ---- layout helpers (driver-side fs metadata ops, like a catalog) ----

    def _partition_dir(self, name: str) -> str:
        return os.path.join(self.root, f"name={urllib.parse.quote(name, safe='')}")

    def _batch_dirs(self, name: str) -> list[str]:
        pdir = self._partition_dir(name)
        if not os.path.isdir(pdir):
            return []
        return sorted(
            d for d in os.listdir(pdir) if d.startswith("batch=")
        )

    def next_batch(self, name: str) -> int:
        dirs = self._batch_dirs(name)
        if not dirs:
            return 1
        return max(int(d.split("=", 1)[1]) for d in dirs) + 1

    def collection_names(self) -> list[str]:
        return sorted(
            urllib.parse.unquote(d.split("=", 1)[1])
            for d in os.listdir(self.root)
            if d.startswith("name=")
        )

    # ---- write path ----

    def append_batch(self, name: str, df: DataFrame) -> int:
        """Append one batch (columns of DOC_SCHEMA minus partition cols)."""
        batch = self.next_batch(name)
        out = os.path.join(self._partition_dir(name), f"batch={batch}")
        df.select([f.name for f in DOC_SCHEMA.fields]).write.mode(
            "errorifexists"
        ).parquet(out)
        return batch

    def drop_collection(self, name: str) -> None:
        pdir = self._partition_dir(name)
        if os.path.isdir(pdir):
            shutil.rmtree(pdir)

    def compact(self, name: str) -> None:
        """Fold all batches of a collection into a single new batch."""
        old = self._batch_dirs(name)
        if len(old) <= 1:
            return
        current = self.read(name)
        # Materialize the deduped snapshot into a NEW batch dir (never
        # overwrite inputs mid-read), then drop the superseded batches.
        batch = self.next_batch(name)
        out = os.path.join(self._partition_dir(name), f"batch={batch}")
        current.select([f.name for f in DOC_SCHEMA.fields]).write.parquet(out)
        for d in old:
            shutil.rmtree(os.path.join(self._partition_dir(name), d))

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
            *[os.path.join(self._partition_dir(name), d) for d in dirs]
        )

    def read(self, name: str) -> DataFrame:
        """Current snapshot: newest version per id, tombstones dropped."""
        raw = self.read_raw(name)
        w = Window.partitionBy("id").orderBy(F.col("batch").desc())
        return (
            raw.withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_rn") == 1) & (~F.col("deleted")))
            .drop("_rn", "batch")
        )
