"""Curated-corpus export sink: write a finished dataset as
evenly-sized files — the delivery end of a training-data pipeline.

The reference has no bulk export (its read path is paginated query
results, /root/reference/src/sifts/core.py:190-364). At 100 TB the
export itself is an operator with failure modes of its own:

* **File sizing.** Downstream trainers stream shards; a skewed export
  (one 80 GB file + ten thousand 2 MB files) serializes the slowest
  reader and floods the namenode/listing. We calibrate bytes-per-row
  by writing a small SAMPLE through the real encoder (same format,
  same compression — measuring serialized bytes, not in-memory size),
  then size ``repartition(n)`` + ``maxRecordsPerFile`` so every file
  lands near ``target_file_mb``.
* **Compression locality.** ``sort_within`` columns feed
  ``sortWithinPartitions`` — grouping similar rows (same language,
  same source) inside each file typically shrinks zstd parquet
  noticeably and gives trainers contiguous domains. A sort WITHIN
  partitions is a local sort: no shuffle beyond the repartition that
  was already needed for sizing.
* **Determinism.** ``repartition(n, col)`` on a provided key (default:
  the id column if present) makes reruns produce identical file
  contents — hash-partitioned, not round-robin (round-robin depends on
  input split order).

Formats: ``parquet`` (columnar, the default) and ``jsonl`` (what most
LLM data-loading stacks ingest).
"""

from __future__ import annotations

import math
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MB = 1024 * 1024


def _dir_bytes(spark, path: str) -> tuple[int, int]:
    """(total bytes, file count) of data files under ``path`` via the
    Hadoop FileSystem API — works on any scheme the session can read."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    total, nfiles = 0, 0
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        total += st.getLen()
        nfiles += 1
    return total, nfiles


def _write(df: DataFrame, path: str, fmt: str, compression: str,
           max_records: int | None, partition_by: list[str] | None) -> None:
    w = df.write.mode("overwrite")
    if max_records:
        w = w.option("maxRecordsPerFile", max_records)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "parquet":
        w.option("compression", compression).parquet(path)
    elif fmt == "jsonl":
        w.option("compression", "gzip" if compression == "gzip" else "none").json(path)
    else:
        raise ValueError(f"unsupported export format {fmt!r}")


def export_corpus(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    target_file_mb: float = 256.0,
    sort_within: list[str] | None = None,
    partition_by: list[str] | None = None,
    key_col: str | None = None,
    compression: str = "zstd",
    sample_rows: int = 2000,
    seed: int = 1,
) -> dict:
    """Write ``df`` to ``path`` in ~``target_file_mb`` files → manifest
    ``{rows, files, bytes, bytes_per_row, rows_per_file, format}``.

    Pipeline: seeded sample → trial write through the real encoder →
    bytes/row → ``rows_per_file = target_bytes / bytes_per_row`` →
    ``repartition(ceil(rows / rows_per_file) [, key])`` +
    ``maxRecordsPerFile`` (the belt-and-braces cap for skewed hash
    partitions) → optional ``sortWithinPartitions`` → final write.

    Cost beyond the write itself: one count, one sample-encode of
    ≤ ``sample_rows`` rows. Both are corpus-scans Spark pipelines into
    the work it was doing anyway (the count reuses cached/parquet
    metadata when available).
    """
    spark = df.sparkSession
    n_rows = df.count()
    if n_rows == 0:
        _write(df, path, fmt, compression, None, partition_by)
        return {"rows": 0, "files": 0, "bytes": 0, "bytes_per_row": 0.0,
                "rows_per_file": 0, "format": fmt}

    # --- calibrate bytes/row through the real encoder -----------------
    frac = min(1.0, (sample_rows * 1.3) / n_rows)
    # Persist the sample so the trial write and the row count read the
    # SAME materialization: with non-deterministic upstream partitioning
    # two executions of the sample plan can select different rows,
    # skewing bytes_per_row and thus every shard-size decision.
    sample = (
        df.sample(withReplacement=False, fraction=frac, seed=seed)
        .limit(sample_rows)
        .persist()
    )
    trial = f"{path.rstrip('/')}__calib_{uuid.uuid4().hex[:8]}"
    try:
        _write(sample.coalesce(1), trial, fmt, compression, None, None)
        tbytes, _ = _dir_bytes(spark, trial)
        tn = sample.count()
    finally:
        sample.unpersist()
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(trial)
    p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()).delete(p, True)
    bytes_per_row = max(tbytes / max(tn, 1), 1.0)

    rows_per_file = max(int(target_file_mb * _MB / bytes_per_row), 1)
    n_parts = max(math.ceil(n_rows / rows_per_file), 1)

    # Determinism default: hash-partition on the first id-like column
    # when the caller names none — bare repartition(n) is round-robin,
    # whose file composition depends on input split order (breaking
    # the rerun-identical contract this module documents).
    key = key_col if key_col in df.columns else next(
        (c for c in ("id", "doc_id", "seq_id", "vec_id") if c in df.columns),
        None,
    )
    out = df.repartition(n_parts, F.col(key)) if key else df.repartition(n_parts)
    if sort_within:
        out = out.sortWithinPartitions(*[F.col(c) for c in sort_within])
    _write(out, path, fmt, compression, rows_per_file, partition_by)

    total, nfiles = _dir_bytes(spark, path)
    return {
        "rows": n_rows,
        "files": nfiles,
        "bytes": total,
        "bytes_per_row": round(bytes_per_row, 2),
        "rows_per_file": rows_per_file,
        "format": fmt,
    }
