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


def test_concurrent_writers_reserve_distinct_batches(store_root, spark):
    """Two handles on one collection: a reservation claimed before the
    other writer's dir even exists must still push the second writer to
    the next number (the reserve-marker protocol, atomic createNewFile)."""
    from sifts_spark.sources.store import DocumentStore

    a = DocumentStore(spark, store_root)
    b = DocumentStore(spark, store_root)
    # a reserves but has not materialized its batch dir yet (in-flight)
    n1 = a.reserve_batch("c")
    n2 = b.reserve_batch("c")  # must see a's marker, not reuse the number
    assert (n1, n2) == (1, 2)

    # both writes land under their reserved numbers
    df1 = spark.createDataFrame([("x", "one")], "id string, content string")
    df2 = spark.createDataFrame([("y", "two")], "id string, content string")
    out1 = f"{a._partition_dir('c')}/batch={n1}"
    out2 = f"{b._partition_dir('c')}/batch={n2}"
    from pyspark.sql import functions as F
    for df, out in ((df1, out1), (df2, out2)):
        df.select(
            "id", "content",
            F.lit(None).cast("string").alias("metadata"),
            F.lit(None).cast("array<float>").alias("embedding"),
            F.lit(False).alias("deleted"),
        ).write.parquet(out)
    assert {r["id"] for r in a.read("c").collect()} == {"x", "y"}


def test_interleaved_writers_via_append_batch(store_root, spark):
    """Plain interleaved append_batch through two handles: distinct
    batches, no leftover reservation markers, consistent snapshot."""
    from sifts_spark.sources.store import DocumentStore

    a = DocumentStore(spark, store_root)
    b = DocumentStore(spark, store_root)
    df = lambda i, c: spark.createDataFrame([(i, c)], "id string, content string")
    assert a.append_batch("c", df("x", "one")) == 1
    assert b.append_batch("c", df("y", "two")) == 2
    assert a.append_batch("c", df("x", "one-v2")) == 3
    # markers removed after committed writes
    assert not [
        n for n in a._ls_names(a._partition_dir("c")) if n.startswith(".reserve")
    ]
    got = {r["id"]: r["content"] for r in a.read("c").collect()}
    assert got == {"x": "one-v2", "y": "two"}


def test_failed_write_burns_the_reserved_number(store_root, spark):
    """A reservation whose write never committed keeps its number burned
    (marker survives), so later writers skip it and readers never see a
    half-written dir."""
    from sifts_spark.sources.store import DocumentStore

    a = DocumentStore(spark, store_root)
    n = a.reserve_batch("c")          # crash here: marker left behind
    assert n == 1
    b = DocumentStore(spark, store_root)
    df = spark.createDataFrame([("y", "two")], "id string, content string")
    assert b.append_batch("c", df) == 2
    assert b._batch_dirs("c") == ["batch=2"]
    assert [r["id"] for r in b.read("c").collect()] == ["y"]
