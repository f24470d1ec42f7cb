"""DocumentStore layout tests: scheme-agnostic Hadoop-FS ops, schema
evolution, and factory URL dispatch (SURVEY §2.1 S3/S4)."""

from __future__ import annotations

import pytest

from sifts_spark.collection import Collection
from sifts_spark.sources.store import DocumentStore, normalize_root


def test_file_scheme_uri_store(tmp_path, spark):
    """The store works addressed through an explicit file:// URI — the
    layout ops resolve the FileSystem from the root's scheme, the same
    code path hdfs://, s3a://, gs:// take (no POSIX os.* involved)."""
    root = f"file://{tmp_path}/scheme_store"
    col = Collection(root, "test", spark=spark)
    col.add(["Lorem ipsum", "sit amet"], ids=["a", "b"])
    assert col.count() == 2
    col.delete(["a"])
    assert col.count() == 1
    # reopen through the URI — data persisted under the scheme'd root
    col2 = Collection(root, "test", spark=spark)
    assert col2.count() == 1
    assert col2.store.collection_names() == ["test"]
    col2.compact()
    assert col2.count() == 1
    col2.delete_all()
    assert col2.count() == 0


def test_normalize_root():
    assert normalize_root("s3a://bucket/store/") == "s3a://bucket/store"
    assert normalize_root("hdfs://nn/store") == "hdfs://nn/store"
    assert normalize_root("rel/path").startswith("/")  # absolutized


def test_no_posix_layout_ops():
    """Regression gate: the store must not regrow driver-side POSIX
    layout calls (the round-1 100 TB blocker)."""
    import inspect

    import sifts_spark.sources.store as store_mod

    src = inspect.getsource(store_mod)
    for banned in ("os.listdir", "os.makedirs", "shutil", "os.path.isdir"):
        assert banned not in src, f"POSIX layout op {banned} reintroduced"


def test_append_batch_schema_evolution(store_root, spark):
    """A narrower DataFrame (missing embedding/metadata/deleted) appends
    cleanly; absent columns read back as NULL — reference lazy
    ALTER-ADD-COLUMN parity (core.py:472-482)."""
    store = DocumentStore(spark, store_root)
    narrow = spark.createDataFrame(
        [("x", "hello world")], "id string, content string"
    )
    store.append_batch("t", narrow)
    snap = store.read("t").collect()
    assert len(snap) == 1
    row = snap[0]
    assert row["content"] == "hello world"
    assert row["metadata"] is None and row["embedding"] is None


def test_append_batch_requires_id(store_root, spark):
    store = DocumentStore(spark, store_root)
    no_id = spark.createDataFrame([("c",)], "content string")
    with pytest.raises(ValueError, match="id"):
        store.append_batch("t", no_id)


def test_factory_url_dispatch(tmp_path, spark):
    # sqlite:/// parity: the reference's SQLite URL routes to a store root
    root = str(tmp_path / "via_sqlite_url")
    col = Collection(f"sqlite:///{root}", "test", spark=spark)
    col.add(["doc"], ids=["1"])
    assert Collection(root, "test", spark=spark).count() == 1
    # PG DSNs rejected with guidance
    with pytest.raises(ValueError, match="storage root"):
        Collection("postgresql://user@host/db", "test", spark=spark)
    with pytest.raises(ValueError, match="storage root"):
        Collection("postgres://user@host/db", "test", spark=spark)
