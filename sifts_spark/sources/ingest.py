"""Corpus ingestion sources: JSONL / CSV / parquet / raw-text readers
with malformed-record quarantine.

The reference only ever ingests through ``collection.add`` (Python
lists, /root/reference/src/sifts/core.py:139-187); a 100 TB pipeline
ingests FILES. These readers normalize heterogeneous corpus formats to
one canonical frame — ``(id STRING, content STRING, metadata STRING)``
— ready for ``Collection.add_dataframe`` / the dedup + text-analysis
operators, without collecting anything to the driver:

* **jsonl / csv**: Spark-native readers in PERMISSIVE mode; rows whose
  parse failed land in a ``_corrupt_record`` column and are split into
  a quarantine frame instead of poisoning the batch (at scale a bad
  shard is a certainty, and FAILFAST kills a 6-hour job at hour 5).
* **parquet**: columnar fast path, schema projected down to the three
  canonical columns.
* **text**: one document per file (``wholetext``) with the file path
  as id — the common raw-scrape layout.

All four return lazily-planned DataFrames: filters/projections applied
downstream still push into the scan where the format supports it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CANON_FIELDS = ("id", "content", "metadata")

_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("metadata", T.StringType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def _canonical(df: DataFrame) -> DataFrame:
    cols = [
        (F.col(c) if c in df.columns else F.lit(None)).cast("string").alias(c)
        for c in CANON_FIELDS
    ]
    return df.select(*cols)


def read_documents(
    spark: SparkSession, path: str, fmt: str = "jsonl"
) -> tuple[DataFrame, DataFrame]:
    """Read a corpus at ``path`` → ``(good, quarantined)``.

    ``good`` has the canonical (id, content, metadata) columns;
    ``quarantined`` carries the raw offending line (jsonl/csv) and is
    empty for formats that cannot produce partial parses (parquet,
    text). Callers decide quarantine policy (count, log, dead-letter
    sink) — nothing is silently dropped.
    """
    if fmt == "jsonl":
        # text + from_json rather than the native json reader: Spark
        # refuses plans that reference only ``_corrupt_record``
        # (QUERY_ONLY_CORRUPT_RECORD_COLUMN) unless the parse is
        # cached; parsing explicitly keeps both splits lazy and
        # cache-free. PERMISSIVE from_json signals a malformed line by
        # filling the in-schema ``_corrupt_record`` field (a bare null
        # check on the struct doesn't fire — it comes back all-null).
        raw = (
            spark.read.text(path)
            .filter(F.length(F.trim(F.col("value"))) > 0)
            .select(F.from_json(F.col("value"), _JSONL_SCHEMA).alias("doc"))
        )
        bad = raw.filter(F.col("doc._corrupt_record").isNotNull()).select(
            F.col("doc._corrupt_record").alias("raw")
        )
        good = raw.filter(F.col("doc._corrupt_record").isNull()).select("doc.*")
        return _canonical(good), bad
    if fmt == "csv":
        schema = T.StructType(
            [
                T.StructField("id", T.StringType()),
                T.StructField("content", T.StringType()),
                T.StructField("metadata", T.StringType()),
                T.StructField("_corrupt_record", T.StringType()),
            ]
        )
        # multiLine CSV records can span physical lines, so the native
        # reader is required; Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN
        # rule then demands the parse be cached before the quarantine
        # split (the documented pattern). Scope: callers unpersist via
        # good/bad lineage going out of scope or an explicit release.
        raw = (
            spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("header", "true")
            .option("multiLine", "true")
            .option("escape", '"')
            .csv(path)
            .cache()
        )
        bad = raw.filter(F.col("_corrupt_record").isNotNull()).select(
            F.col("_corrupt_record").alias("raw")
        )
        return _canonical(raw.filter(F.col("_corrupt_record").isNull())), bad
    if fmt == "parquet":
        good = _canonical(spark.read.parquet(path))
        return good, good.limit(0).select(F.col("id").alias("raw"))
    if fmt == "text":
        # one doc per file; id = file path (stable, unique by construction)
        raw = (
            spark.read.option("wholetext", "true")
            .text(path)
            .select(
                F.input_file_name().alias("id"),
                F.col("value").alias("content"),
                F.lit(None).cast("string").alias("metadata"),
            )
        )
        return raw, raw.limit(0).select(F.col("id").alias("raw"))
    raise ValueError(f"unknown corpus format: {fmt!r}")
