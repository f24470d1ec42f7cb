"""Domain mixing (mix_corpus) and sequence packing (pack_sequences)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sifts_spark.operators.sampling import mix_corpus, pack_sequences
from sifts_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    d = (
        load_table(spark, SF_DIR, "documents")
        .select(
            "doc_id", "lang",
            F.size(F.split(F.col("text"), r"\s+")).alias("n_tokens"),
        )
        .cache()
    )
    d.count()
    yield d
    d.unpersist()


def test_mix_hits_target_proportions(spark, docs):
    weights = {"en": 0.7, "de": 0.3}
    budget = 4000
    out = mix_corpus(docs, "lang", "n_tokens", weights, budget).cache()
    got = {
        r["lang"]: r["t"]
        for r in out.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
    }
    # each group lands its budget, overshooting by at most one doc
    max_doc = docs.agg(F.max("n_tokens")).collect()[0][0]
    for g, w in weights.items():
        assert got[g] >= w * budget, f"{g} under budget: {got[g]}"
        assert got[g] < w * budget + max_doc, f"{g} overshot: {got[g]}"
    # unlisted groups are dropped
    assert set(got) == {"en", "de"}
    out.unpersist()


def test_mix_upsampling_epochs(spark, docs):
    # budget far above the corpus: groups repeat in whole epochs
    total = docs.filter(F.col("lang") == "en").agg(F.sum("n_tokens")).collect()[0][0]
    out = mix_corpus(docs, "lang", "n_tokens", {"en": 1.0}, int(total * 2.5))
    eps = out.groupBy("epoch").count().orderBy("epoch").collect()
    assert [r["epoch"] for r in eps] == [0, 1, 2]
    # epochs 0 and 1 are complete copies; epoch 2 is the truncated tail
    assert eps[0]["count"] == eps[1]["count"] >= eps[2]["count"]
    # determinism
    a = sorted((r["doc_id"], r["epoch"]) for r in out.collect())
    b = sorted(
        (r["doc_id"], r["epoch"])
        for r in mix_corpus(
            docs, "lang", "n_tokens", {"en": 1.0}, int(total * 2.5)
        ).collect()
    )
    assert a == b
    # capped mode: exactly one epoch
    capped = mix_corpus(docs, "lang", "n_tokens", {"en": 1.0},
                        int(total * 2.5), allow_upsampling=False)
    assert capped.agg(F.max("epoch")).collect()[0][0] == 0


def test_mix_rejects_bad_weights(docs):
    with pytest.raises(ValueError, match="positive"):
        mix_corpus(docs, "lang", "n_tokens", {"en": 0.0}, 100)


def test_pack_sequences_partition_and_fill(spark, docs):
    max_tokens = 256
    packed = pack_sequences(docs, "doc_id", "n_tokens", max_tokens).cache()
    rows = packed.collect()
    # every doc appears exactly once across all bins
    all_ids = [d for r in rows for d in r["doc_ids"]]
    assert len(all_ids) == docs.count()
    assert len(set(all_ids)) == len(all_ids)
    # bin invariants: <= max unless a single oversize doc
    tok = {str(r["doc_id"]): r["n_tokens"] for r in docs.collect()}
    for r in rows:
        assert r["total_tokens"] == sum(tok[d] for d in r["doc_ids"])
        if r["n_docs"] > 1:
            assert r["total_tokens"] <= max_tokens
        assert r["fill"] == pytest.approx(
            r["total_tokens"] / max_tokens, abs=1e-6  # operator rounds to 6 dp
        )
    # seq ids unique
    sids = [r["seq_id"] for r in rows]
    assert len(set(sids)) == len(sids)
    # aggregate fill: first-fit on small docs should pack tightly
    closed = [r for r in rows if r["total_tokens"] <= max_tokens]
    fill = sum(r["total_tokens"] for r in closed) / (max_tokens * len(closed))
    assert fill > 0.7, f"loose packing: {fill}"
    packed.unpersist()


def test_pack_sequences_deterministic(spark, docs):
    a = {r["seq_id"]: list(r["doc_ids"])
         for r in pack_sequences(docs, "doc_id", "n_tokens", 256).collect()}
    b = {r["seq_id"]: list(r["doc_ids"])
         for r in pack_sequences(docs, "doc_id", "n_tokens", 256).collect()}
    assert a == b


def test_pack_oversize_doc_isolated(spark):
    df = spark.createDataFrame(
        [("a", 10), ("b", 5000), ("c", 20)], "doc_id string, n_tokens long"
    )
    rows = pack_sequences(df, "doc_id", "n_tokens", 100).collect()
    big = [r for r in rows if "b" in r["doc_ids"]]
    assert len(big) == 1 and big[0]["doc_ids"] == ["b"] and big[0]["fill"] > 1


def test_mix_extreme_upsampling_no_per_row_arrays(spark, docs):
    """A tiny domain under a huge budget (hundreds of epochs) must
    work — the epoch fan-out is a broadcast (group, epoch) frame, not
    a per-row sequence array."""
    tiny = docs.filter(F.col("lang") == "de").limit(3)
    total = tiny.agg(F.sum("n_tokens")).collect()[0][0]
    out = mix_corpus(tiny, "lang", "n_tokens", {"de": 1.0}, int(total * 300))
    eps = out.agg(F.max("epoch"), F.count("*")).collect()[0]
    assert eps[0] >= 299
    assert eps[1] >= 3 * 299
    # per-(doc, epoch) uniqueness still holds
    assert out.select("doc_id", "epoch").distinct().count() == eps[1]
