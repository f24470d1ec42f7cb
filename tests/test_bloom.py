"""Bloom-filter blocklist anti-join: exactness vs plain anti-join,
no false negatives, fp-rate sanity, prebuilt-filter reuse."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sifts_spark.functions.bloom import (
    bloom_anti_join,
    bloom_might_contain,
    bloom_params,
    build_bloom,
)
from sifts_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_bloom_params_shape():
    m, k = bloom_params(1000, 0.01)
    assert m % 8 == 0 and 9000 < m < 11000  # ~9.6 bits/key at 1%
    assert 6 <= k <= 8


def test_no_false_negatives_and_bounded_fp(spark):
    members = spark.range(0, 2000).select(F.concat(F.lit("k"), "id").alias("key"))
    bf = build_bloom(members, "key", fpp=0.01)
    assert bf["n_items"] == 2000
    # every member probes positive
    hits = members.filter(bloom_might_contain(F.col("key"), bf)).count()
    assert hits == 2000
    # non-members: fp rate near the target (generous 5x envelope)
    others = spark.range(100_000, 120_000).select(
        F.concat(F.lit("k"), "id").alias("key")
    )
    fp = others.filter(bloom_might_contain(F.col("key"), bf)).count()
    assert fp / 20_000 < 0.05, f"fp rate {fp/20_000}"


def test_bloom_anti_join_equals_plain_anti_join(spark):
    docs = load_table(spark, SF_DIR, "documents")
    block = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.col("text").alias("blocked_text")
    ).select(F.col("blocked_text").alias("text"))
    got = bloom_anti_join(docs, block, on="text")
    want = docs.join(block.distinct(), "text", "left_anti")
    assert got.count() == want.count()
    gs = {r["doc_id"] for r in got.select("doc_id").collect()}
    ws = {r["doc_id"] for r in want.select("doc_id").collect()}
    assert gs == ws
    # schema passes through untouched
    assert set(got.columns) == set(docs.columns)


def test_bloom_anti_join_prebuilt_reuse(spark):
    docs = load_table(spark, SF_DIR, "documents")
    block = docs.filter("doc_id < 20").select("text")
    bf = build_bloom(block, "text")
    a = bloom_anti_join(docs, block, on="text", bloom=bf)
    b = bloom_anti_join(docs.limit(50), block, on="text", bloom=bf)
    assert a.count() == docs.count() - 20
    assert b.count() <= 50
    # without exact verify: still zero false negatives (blocked rows
    # all gone), may drop a few extra (fp) — never more than the corpus
    loose = bloom_anti_join(docs, block, on="text", bloom=bf, exact_verify=False)
    blocked_texts = {r["text"] for r in block.collect()}
    assert not any(
        r["text"] in blocked_texts for r in loose.collect()
    )


def test_bloom_empty_blocklist(spark):
    docs = load_table(spark, SF_DIR, "documents")
    empty = docs.filter("doc_id < 0").select("text")
    got = bloom_anti_join(docs, empty, on="text")
    assert got.count() == docs.count()


def test_bloom_never_false_negative_property(spark):
    """Property: for ANY set of member strings (unicode, empties,
    collision-bait), every member probes positive. Uses hypothesis
    examples driven through one Spark job per case batch."""
    from hypothesis import given, settings, strategies as st

    from sifts_spark.functions.bloom import bloom_might_contain, build_bloom

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.text(min_size=0, max_size=40), min_size=1, max_size=30, unique=True
        )
    )
    def check(members):
        df = spark.createDataFrame([(m,) for m in members], "key string")
        bf = build_bloom(df, "key", fpp=0.05)
        assert df.filter(bloom_might_contain(F.col("key"), bf)).count() == len(
            members
        )

    check()
