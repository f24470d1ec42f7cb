"""Curated-corpus export: file sizing, determinism, roundtrip, jsonl."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from sifts_spark.pipelines.export import export_corpus
from sifts_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _data_files(path, pattern="part-*"):
    return [
        f for f in glob.glob(os.path.join(path, "**", pattern), recursive=True)
        if not f.endswith(".crc")
    ]


def test_export_sizes_files_near_target(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "out")
    # tiny target forces multi-file output even at sf0.001
    m = export_corpus(docs, out, target_file_mb=0.005, key_col="doc_id",
                      compression="snappy")
    files = _data_files(out)
    assert m["files"] == len(files) >= 3
    assert m["rows"] == docs.count()
    sizes = [os.path.getsize(f) for f in files]
    target = 0.005 * 1024 * 1024
    # every file within sane envelope of target (parquet per-file
    # footer overhead dominates at these toy sizes, hence the slack)
    assert max(sizes) <= 4 * target, f"oversized shard: {max(sizes)}"
    # roundtrip: nothing lost, nothing duplicated
    back = spark.read.parquet(out)
    assert back.count() == m["rows"]
    assert (
        back.select(F.sum(F.hash("doc_id")).alias("h")).collect()[0]["h"]
        == docs.select(F.sum(F.hash("doc_id")).alias("h")).collect()[0]["h"]
    )


def test_export_deterministic_rerun(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    ma = export_corpus(docs, a, target_file_mb=0.01, key_col="doc_id",
                       sort_within=["lang", "doc_id"], compression="snappy")
    mb = export_corpus(docs, b, target_file_mb=0.01, key_col="doc_id",
                       sort_within=["lang", "doc_id"], compression="snappy")
    assert ma["files"] == mb["files"] and ma["rows"] == mb["rows"]
    # hash-partitioned on doc_id + local sort -> identical per-file row
    # sets across reruns
    fa = sorted(_data_files(a)); fb = sorted(_data_files(b))
    for x, y in zip(fa, fb):
        ha = spark.read.parquet(x).select(F.sum(F.hash("doc_id"))).collect()[0][0]
        hb = spark.read.parquet(y).select(F.sum(F.hash("doc_id"))).collect()[0][0]
        assert ha == hb


def test_export_partition_by_and_jsonl(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "bylang")
    m = export_corpus(docs, out, target_file_mb=1.0, partition_by=["lang"],
                      compression="snappy")
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    subdirs = {d.split("=")[1] for d in os.listdir(out) if d.startswith("lang=")}
    assert subdirs == langs
    assert spark.read.parquet(out).count() == m["rows"]

    jout = str(tmp_path / "jsonl")
    mj = export_corpus(docs, jout, fmt="jsonl", target_file_mb=0.01)
    assert mj["format"] == "jsonl"
    back = spark.read.json(jout)
    assert back.count() == docs.count()
    # jsonl shards exist and no calibration dir leaked behind
    assert _data_files(jout)
    assert not glob.glob(str(tmp_path / "*__calib_*"))


def test_export_empty_frame(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").filter("doc_id < 0")
    m = export_corpus(docs, str(tmp_path / "empty"), target_file_mb=1.0)
    assert m == {"rows": 0, "files": 0, "bytes": 0, "bytes_per_row": 0.0,
                 "rows_per_file": 0, "format": "parquet"}


def test_export_rejects_unknown_format(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    with pytest.raises(ValueError, match="unsupported export format"):
        export_corpus(docs, str(tmp_path / "x"), fmt="avro")


def test_export_default_key_is_deterministic(spark, tmp_path):
    """Without key_col the exporter hash-partitions on the first
    id-like column (doc_id here) — reruns must compose identical
    shards, not round-robin ones."""
    docs = load_table(spark, SF_DIR, "documents")
    a, b = str(tmp_path / "da"), str(tmp_path / "db")
    export_corpus(docs, a, target_file_mb=0.01, compression="snappy")
    export_corpus(docs, b, target_file_mb=0.01, compression="snappy")
    fa, fb = sorted(_data_files(a)), sorted(_data_files(b))
    assert len(fa) == len(fb) > 1
    for x, y in zip(fa, fb):
        ha = spark.read.parquet(x).select(F.sum(F.hash("doc_id"))).collect()[0][0]
        hb = spark.read.parquet(y).select(F.sum(F.hash("doc_id"))).collect()[0][0]
        assert ha == hb
