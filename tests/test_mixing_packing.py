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


class TestSplitCorpus:
    """Deterministic train/validation/holdout assignment
    (split_corpus): hash-mode value parity with a Python md5
    reference, subset stability, exact-mode size guarantees, and
    input validation."""

    def test_hash_mode_python_reference_and_plan(self, spark):
        import hashlib

        from sifts_spark.operators.sampling import split_corpus

        splits = {"train": 0.8, "val": 0.1, "holdout": 0.1}
        docs = load_table(spark, SF_DIR, "documents").select("doc_id")
        got = {
            r["doc_id"]: r["split"]
            for r in split_corpus(docs, splits, seed="s1").collect()
        }
        assert len(got) == 500

        def ref(doc_id):
            h = hashlib.md5(f"s1\x00{doc_id}".encode()).hexdigest()
            u = int(h[:8], 16) / 2**32
            if u < 0.8:
                return "train"
            if u < 0.9:
                return "val"
            return "holdout"

        for doc_id, split in got.items():
            assert split == ref(doc_id), doc_id
        # every named split materializes at plausible proportions
        from collections import Counter

        c = Counter(got.values())
        assert 350 < c["train"] < 450 and c["val"] > 20 and c["holdout"] > 20

        # the 100 TB contract: pure map-side, no shuffle
        plan = (
            split_corpus(docs, splits, seed="s1")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan

    def test_hash_mode_subset_stability(self, spark):
        from sifts_spark.operators.sampling import split_corpus

        splits = {"train": 0.9, "holdout": 0.1}
        docs = load_table(spark, SF_DIR, "documents").select("doc_id")
        full = {
            r["doc_id"]: r["split"]
            for r in split_corpus(docs, splits).collect()
        }
        subset = {
            r["doc_id"]: r["split"]
            for r in split_corpus(
                docs.filter(F.col("doc_id") % 3 == 0), splits
            ).collect()
        }
        # removing other rows never moves a surviving row's split
        for doc_id, split in subset.items():
            assert split == full[doc_id]

    def test_seed_changes_assignment(self, spark):
        from sifts_spark.operators.sampling import split_corpus

        splits = {"a": 0.5, "b": 0.5}
        docs = load_table(spark, SF_DIR, "documents").select("doc_id")
        s1 = {r["doc_id"]: r["split"]
              for r in split_corpus(docs, splits, seed="x").collect()}
        s2 = {r["doc_id"]: r["split"]
              for r in split_corpus(docs, splits, seed="y").collect()}
        assert s1 != s2
        assert s1 == {
            r["doc_id"]: r["split"]
            for r in split_corpus(docs, splits, seed="x").collect()
        }

    def test_exact_mode_sizes_and_stratification(self, spark):
        from collections import Counter

        from sifts_spark.operators.sampling import split_corpus

        docs = load_table(spark, SF_DIR, "documents").select(
            "doc_id", "lang"
        )
        splits = {"train": 0.8, "holdout": 0.2}
        # global exact: floor/ceil-exact sizes
        rows = split_corpus(docs, splits, method="exact").collect()
        c = Counter(r["split"] for r in rows)
        assert c["train"] == 400 and c["holdout"] == 100
        # stratified: the SAME proportions inside every language
        rows = split_corpus(
            docs, splits, method="exact", stratify_col="lang"
        ).collect()
        per_lang = {}
        for r in rows:
            per_lang.setdefault(r["lang"], Counter())[r["split"]] += 1
        for lang, cc in per_lang.items():
            n = sum(cc.values())
            want_train = int(0.8 * n + 0.5)
            assert cc["train"] == want_train, (lang, cc)
            assert cc["holdout"] == n - want_train, (lang, cc)

    def test_validation(self, spark):
        from sifts_spark.operators.sampling import split_corpus

        docs = load_table(spark, SF_DIR, "documents").select("doc_id")
        with pytest.raises(ValueError, match="sum to 1"):
            split_corpus(docs, {"a": 0.5, "b": 0.2})
        with pytest.raises(ValueError, match="positive"):
            split_corpus(docs, {"a": 1.5, "b": -0.5})
        with pytest.raises(ValueError, match="at least one"):
            split_corpus(docs, {})
        with pytest.raises(ValueError, match="unknown split method"):
            split_corpus(docs, {"a": 1.0}, method="nope")
        with pytest.raises(ValueError, match="stratify_col requires"):
            split_corpus(docs, {"a": 1.0}, stratify_col="lang")

    def test_null_ids_fail_loudly(self, spark):
        from pyspark.errors.exceptions.captured import SparkRuntimeException

        from sifts_spark.operators.sampling import split_corpus

        df = spark.createDataFrame(
            [("a",), (None,)], "doc_id string"
        )
        out = split_corpus(df, {"train": 0.5, "holdout": 0.5})
        with pytest.raises(SparkRuntimeException, match="non-null ids"):
            out.collect()

    def test_recipe_holdout_stage(self, spark, tmp_path):
        from sifts_spark.pipelines.curation import prepare_training_data

        docs = load_table(spark, SF_DIR, "documents").select(
            "doc_id", "text"
        ).limit(120)
        m = prepare_training_data(
            docs, str(tmp_path / "out"), min_quality=0.0, ppl_band=None,
            allowed_langs=("en", "de", "fr", "es", "it", "und"),
            jaccard_threshold=1.01,  # no dedup attrition: split math clean
            holdout_frac=0.25,
        )
        assert m["stages"]["holdout"] + m["stages"]["train_split"] == (
            m["stages"]["curated"]
        )
        assert m["stages"]["holdout"] > 0
        hold = spark.read.parquet(str(tmp_path / "out" / "holdout"))
        train = spark.read.parquet(str(tmp_path / "out" / "docs"))
        hold_ids = {r["id"] for r in hold.select("id").collect()}
        train_ids = {r["id"] for r in train.select("id").collect()}
        assert hold_ids and not (hold_ids & train_ids)
        assert len(hold_ids) == m["stages"]["holdout"]


class TestRenderSequences:
    """Packed-sequence payload materialization: packing order
    preserved, separator applied, missing docs drop, recipe e2e."""

    def test_order_and_separator(self, spark):
        from sifts_spark.operators.sampling import (
            pack_sequences,
            render_sequences,
        )

        rows = [("d1", "alpha text", 900), ("d2", "beta text", 900),
                ("d3", "gamma text", 900), ("d4", "delta text", 1800)]
        df = spark.createDataFrame(
            rows, "doc_id string, text string, n_tokens long"
        )
        seqs = pack_sequences(df, max_tokens=2000)
        rendered = {
            r["seq_id"]: r
            for r in render_sequences(
                seqs, df, sep=" <EOS> "
            ).collect()
        }
        texts = dict(
            (doc_id, text) for doc_id, text, _ in rows
        )
        by_seq = {r["seq_id"]: list(r["doc_ids"]) for r in seqs.collect()}
        assert len(rendered) == len(by_seq)
        for sid, ids in by_seq.items():
            want = " <EOS> ".join(texts[i] for i in ids)
            got = rendered[sid]
            assert got["text"] == want, sid
            assert got["n_docs"] == len(ids)

    def test_missing_and_null_docs(self, spark):
        from sifts_spark.operators.sampling import (
            pack_sequences,
            render_sequences,
        )

        df = spark.createDataFrame(
            [("a", "visible", 10), ("b", None, 10)],
            "doc_id string, text string, n_tokens long",
        )
        seqs = pack_sequences(df, max_tokens=100)
        # NULL text renders as empty string, not a dropped member
        r = render_sequences(seqs, df).collect()[0]
        assert r["n_docs"] == 2 and "visible" in r["text"]
        # a doc id absent from the payload frame drops from its seq
        r2 = render_sequences(
            seqs, df.filter("doc_id = 'a'")
        ).collect()[0]
        assert r2["n_docs"] == 1 and r2["text"] == "visible"

    def test_recipe_renders_payloads(self, spark, tmp_path):
        from sifts_spark.pipelines.curation import prepare_training_data

        docs = load_table(spark, SF_DIR, "documents").limit(40).select(
            "doc_id", "text"
        )
        m = prepare_training_data(
            docs, str(tmp_path / "out"), min_quality=0.0, ppl_band=None,
            allowed_langs=("en", "de", "fr", "es", "it", "zh", "und"),
            jaccard_threshold=1.01, max_seq_tokens=512,
            render_sequence_text=True, sequence_sep=" <EOS> ",
        )
        assert m["export_sequence_text"]["rows"] > 0
        seqs = spark.read.parquet(str(tmp_path / "out" / "sequences"))
        payloads = spark.read.parquet(
            str(tmp_path / "out" / "sequences_text")
        )
        assert payloads.count() == seqs.count()
        joined = seqs.select("seq_id", "n_docs").join(
            payloads.select(
                "seq_id", F.col("n_docs").alias("n2"), "text"
            ),
            "seq_id",
        ).collect()
        assert joined and all(r["n_docs"] == r["n2"] for r in joined)
        multi = [r for r in joined if r["n_docs"] > 1]
        assert all(
            r["text"].count(" <EOS> ") == r["n_docs"] - 1 for r in multi
        )
