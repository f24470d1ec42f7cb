"""Corpus-curation composite: stage tagging, canonical dedup, report
consistency — driven over the real sf0.001 documents table."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from sifts_spark.operators.dedup import minhash_lsh_pairs
from sifts_spark.pipelines import curate_corpus
from sifts_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_curate_corpus_end_to_end(spark):
    docs = load_table(spark, SF_DIR, "documents")
    curated, report = curate_corpus(docs, allowed_langs=("en",), min_quality=0.2)
    cur = curated.collect()
    rep = report.collect()

    n_input = docs.count()
    assert sum(r["n"] for r in rep) == n_input  # report covers every doc
    assert 0 < len(cur) < n_input  # gates actually fire

    # every kept doc passes its gates
    assert all(r["pred_lang"] == "en" and r["quality"] >= 0.2 for r in cur)

    # canonical-keep: no two kept docs are near-dups of each other
    kept_ids = {r["id"] for r in cur}
    pairs = minhash_lsh_pairs(
        docs.select(F.col("doc_id").alias("id"), "text"), id_col="id"
    ).collect()
    for p in pairs:
        assert not (p["id_a"] in kept_ids and p["id_b"] in kept_ids)

    # attrition matrix equals the kept count
    kept_row = [r for r in rep if r["lang_ok"] and r["quality_ok"] and r["canonical"]]
    assert len(kept_row) == 1 and kept_row[0]["n"] == len(cur)


def test_curate_scrubs_pii(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox and the lazy dog with a mail to " +
                "reach me at bob@example.com for more and more of this " +
                "text that is long enough to pass the quality gate with " +
                "many varied common english words in it today"),
        ],
        "doc_id INT, text STRING",
    )
    curated, _ = curate_corpus(docs, min_quality=0.0)
    row = curated.first()
    assert row is not None
    assert "bob@example.com" not in row["text"]
    assert re.search(r"\[EMAIL\]|<EMAIL>|\bEMAIL\b", row["text"]) or "@" not in row["text"]


def test_curate_soft_dedup_keeps_members_with_weights(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog in the morning light",
        "a completely different story about ships sailing on the open sea",
    ]
    rows = [
        ("a", texts[0] + " marker one"),
        ("b", texts[0] + " marker two"),  # near-dup of a
        ("c", texts[1]),                  # singleton
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")

    hard, _ = curate_corpus(docs, min_quality=0.0)
    assert sorted(r["id"] for r in hard.collect()) == ["a", "c"]
    assert "dup_weight" not in hard.columns

    soft, report = curate_corpus(docs, min_quality=0.0, soft_dedup=True)
    got = {r["id"]: r["dup_weight"] for r in soft.collect()}
    assert got == {"a": 0.5, "b": 0.5, "c": 1.0}
    # the canonical tag stays informative in the report
    tags = {(r["canonical"]): r["n"] for r in report.collect()}
    assert tags[True] == 2 and tags[False] == 1


def test_recipe_soft_dedup_exports_weights(spark, tmp_path):
    from sifts_spark.pipelines.curation import prepare_training_data

    texts = [
        "the quick brown fox jumps over the lazy dog in the morning light",
        "a completely different story about ships sailing on the open sea",
        "engineers measure the long bridge span with careful instruments",
    ]
    rows = [("a", texts[0] + " marker one"), ("b", texts[0] + " marker two"),
            ("c", texts[1]), ("d", texts[2])]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    m = prepare_training_data(
        docs, str(tmp_path / "out"), min_quality=0.0, ppl_band=None,
        soft_dedup=True,
    )
    assert m["dedup_mode"] == "soft"
    assert m["stages"]["curated"] == 4  # nothing hard-dropped
    out = spark.read.parquet(str(tmp_path / "out" / "docs"))
    got = {r["id"]: r["dup_weight"] for r in out.collect()}
    assert got == {"a": 0.5, "b": 0.5, "c": 1.0, "d": 1.0}


def test_recipe_gates_with_trained_langid_model(spark, tmp_path):
    """VERDICT r12 item 3: `langid_model=` threads through the recipe —
    the trained classifier (not the 5-language marker lexicon) gates
    the language stage, so a multilingual run can keep scripts the
    markers cannot label. Attrition keys unchanged."""
    import random

    from sifts_spark.operators import textanalysis as TA
    from sifts_spark.pipelines.curation import prepare_training_data

    pools = {
        "en": "the and of to in is that it was for on with as his they be at one have this".split(),
        "ru": "и в не на что он как это по но они мы из его все так она было если уже".split(),
        "el": "και το να του με την από είναι που δεν για στο μια τον οι αυτό όπως θα".split(),
    }
    rng = random.Random(3)
    rows = [
        (f"{lang}{i}", " ".join(rng.choices(pool, k=25)), lang)
        for lang, pool in sorted(pools.items())
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string, lang string")
    model = TA.train_langid(docs, sample_per_lang=100, dim=2**10)

    m = prepare_training_data(
        docs, str(tmp_path / "out"), min_quality=0.0, ppl_band=None,
        allowed_langs=("en", "ru"), langid_model=model,
    )
    assert m["langid"] == "model"
    # attrition keys are the unchanged tag trio
    assert all(
        set(r) == {"lang_ok", "quality_ok", "canonical", "n", "tokens"}
        for r in m["attrition"]
    )
    out = spark.read.parquet(str(tmp_path / "out" / "docs"))
    got = out.select("id", "pred_lang").collect()
    kept_langs = {r["pred_lang"] for r in got}
    assert kept_langs <= {"en", "ru"} and "ru" in kept_langs
    # the marker lexicon cannot label Cyrillic/Greek: the same recipe
    # without the model drops every ru doc (pred 'und'), proving the
    # trained model is what gated here
    assert all(not r["id"].startswith("el") for r in got)
    m2 = prepare_training_data(
        docs, str(tmp_path / "out2"), min_quality=0.0, ppl_band=None,
        allowed_langs=("en", "ru"),
    )
    assert m2["langid"] == "marker"
    out2 = spark.read.parquet(str(tmp_path / "out2" / "docs"))
    assert all(
        not r["id"].startswith(("ru", "el")) for r in out2.select("id").collect()
    )
