"""Corpus ingestion readers: canonical schema, corrupt-record quarantine.

The reference ingests only via Python lists (core.py:139-187); these
readers are the file-scale front door. Quarantine contract: nothing
silently dropped, bad rows isolated, good rows canonicalized.
"""

from __future__ import annotations

import os

from sifts_spark.sources.ingest import CANON_FIELDS, read_documents


def test_jsonl_good_and_quarantine(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"id": "a", "content": "hello world", "metadata": "{\\"k\\": 1}"}\n'
        "this is not json at all\n"
        '{"id": "b", "content": "second doc"}\n'
        '{"id": "c", "content": "third", "extra_field_ignored": true}\n'
    )
    good, bad = read_documents(spark, str(p), fmt="jsonl")
    assert tuple(good.columns) == CANON_FIELDS
    rows = {r["id"]: r for r in good.collect()}
    assert set(rows) == {"a", "b", "c"}
    assert rows["a"]["metadata"] == '{"k": 1}'
    assert rows["b"]["metadata"] is None
    quarantined = [r["raw"] for r in bad.collect()]
    assert quarantined == ["this is not json at all"]


def test_csv_roundtrip(spark, tmp_path):
    p = tmp_path / "corpus.csv"
    p.write_text('id,content,metadata\na,"multi\nline doc",\nb,plain,"{""k"":2}"\n')
    good, bad = read_documents(spark, str(p), fmt="csv")
    rows = {r["id"]: r for r in good.collect()}
    assert rows["a"]["content"] == "multi\nline doc"
    assert rows["b"]["metadata"] == '{"k":2}'
    assert bad.count() == 0


def test_text_one_doc_per_file(spark, tmp_path):
    d = tmp_path / "scrape"
    d.mkdir()
    (d / "x.txt").write_text("doc one body")
    (d / "y.txt").write_text("doc two body")
    good, bad = read_documents(spark, str(d), fmt="text")
    rows = sorted(good.collect(), key=lambda r: r["id"])
    assert [os.path.basename(r["id"]) for r in rows] == ["x.txt", "y.txt"]
    assert rows[0]["content"] == "doc one body"
    assert bad.count() == 0


def test_parquet_projection(spark, tmp_path):
    src = spark.createDataFrame(
        [("a", "body", '{"k":1}', 42)], "id STRING, content STRING, metadata STRING, extra INT"
    )
    out = str(tmp_path / "p")
    src.write.parquet(out)
    good, bad = read_documents(spark, out, fmt="parquet")
    assert tuple(good.columns) == CANON_FIELDS
    assert good.first()["content"] == "body"
    assert bad.count() == 0


def test_explicit_metadata_name_raises_when_absent(store_root, spark):
    """An EXPLICIT metadata_col="metadata" on a frame without that
    column must raise (the sentinel default, not the string, is what
    NULL-fills) — ADVICE r03."""
    import pytest

    from sifts_spark.collection import Collection

    col = Collection(store_root, "adv", spark=spark)
    df = spark.createDataFrame([("a", "text")], "id string, content string")
    with pytest.raises(ValueError, match="metadata"):
        col.add_dataframe(df, metadata_col="metadata")
    # the default still NULL-fills quietly
    col.add_dataframe(df)
    assert col.count() == 1
