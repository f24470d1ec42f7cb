"""Trainable language ID (r11 verdict item 3): the hashed-char-n-gram
softmax classifier must beat the 5-language marker lexicon on a
held-out multilingual corpus, roundtrip through the artifact store,
and stay deterministic.

The synthetic corpus below covers 10 languages across 4 scripts —
word pools are common/function words (public knowledge). Docs are
seeded-random samples from one pool each, so the task is real (shared
orthography within Latin script) but reproducible.
"""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from sifts_spark.operators import textanalysis as TA

POOLS = {
    "en": "the and of to in is that it was for on with as his they be at one have this from or had by word what some".split(),
    "de": "der die und das ist nicht ein mit von zu sich auf für wird eine werden auch nach wenn über ihre durch".split(),
    "fr": "le la les et des est un une du que dans pour qui sur pas plus par avec tout nous comme mais être cette".split(),
    "es": "el la los las que de un una es por con para como más pero sus le ha me si sin sobre este cuando muy".split(),
    "it": "il la che di un una per con del non sono della anche come dalla gli nel alla più questo suo essere".split(),
    "pt": "o que de um uma para com não por mais das como mas foi ele ser tem seu sua ou quando muito nos já".split(),
    "nl": "de het een van is dat in te zijn op niet met voor als maar om ook er uit aan bij naar dan nog wordt".split(),
    "pl": "się nie jest na do tak jak ale czy już tylko przez jego było być może przy tym bardzo kiedy przed".split(),
    "ru": "и в не на что он как это по но они мы из его все так она было если уже для вот меня только".split(),
    "el": "και το να του με την από είναι που δεν για στο μια τον οι αυτό όπως θα τους κατά ένα".split(),
}


def _corpus(n_per_lang=40, words_per_doc=18, seed=7):
    rng = random.Random(seed)
    rows = []
    i = 0
    for lang, pool in sorted(POOLS.items()):
        for _ in range(n_per_lang):
            rows.append((i, " ".join(rng.choices(pool, k=words_per_doc)), lang))
            i += 1
    rng.shuffle(rows)
    return rows


@pytest.fixture(scope="module")
def corpus(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    # deterministic split: 60% train / 40% held out
    train = df.filter(F.col("doc_id") % 5 < 3)
    test = df.filter(F.col("doc_id") % 5 >= 3)
    return train, test


@pytest.fixture(scope="module")
def model(corpus):
    train, _ = corpus
    return TA.train_langid(train, sample_per_lang=200, dim=2**12)


def _accuracy(pred_df, truth_df):
    joined = pred_df.join(
        truth_df.select(F.col("doc_id").alias("id"), "lang"), "id"
    )
    n = joined.count()
    ok = joined.filter(F.col("pred_lang") == F.col("lang")).count()
    return ok / n


class TestLangidModel:
    def test_beats_marker_baseline_on_held_out(self, corpus, model):
        _, test = corpus
        clf_acc = _accuracy(TA.langid_score(test, model), test)
        marker_acc = _accuracy(TA.language_id(test), test)
        # markers only know 5 of the 10 languages — the classifier must
        # clear a real floor AND the baseline by a wide margin
        assert clf_acc >= 0.95, clf_acc
        assert clf_acc > marker_acc + 0.2, (clf_acc, marker_acc)

    def test_covers_scripts_markers_cannot(self, corpus, model):
        _, test = corpus
        preds = {
            r["id"]: r["pred_lang"]
            for r in TA.langid_score(test, model).collect()
        }
        truth = {r["doc_id"]: r["lang"] for r in test.collect()}
        for lang in ("ru", "el", "pl", "pt", "nl"):
            ids = [i for i, l in truth.items() if l == lang]
            hit = sum(preds[i] == lang for i in ids) / len(ids)
            assert hit >= 0.9, (lang, hit)

    def test_empty_and_null_text_score_und(self, spark, model):
        df = spark.createDataFrame(
            [(1, ""), (2, None), (3, "   ")], "doc_id long, text string"
        )
        rows = {r["id"]: r for r in TA.langid_score(df, model).collect()}
        for i in (1, 2, 3):
            assert rows[i]["pred_lang"] == "und"
            assert rows[i]["lang_prob"] is None

    def test_artifact_roundtrip(self, spark, corpus, model, tmp_path):
        from sifts_spark.functions.artifacts import load_artifact, save_artifact

        _, test = corpus
        path = str(tmp_path / "langid.json")
        save_artifact(spark, path, model)
        loaded = load_artifact(spark, path)
        assert loaded["langs"] == model["langs"]
        assert loaded["weights"] == model["weights"]  # bytes roundtrip
        a = sorted(
            map(tuple, TA.langid_score(test, model).collect())
        )
        b = sorted(
            map(tuple, TA.langid_score(test, loaded).collect())
        )
        assert a == b

    def test_training_is_deterministic(self, corpus):
        train, _ = corpus
        m1 = TA.train_langid(train, sample_per_lang=50, dim=2**10, epochs=10)
        m2 = TA.train_langid(train, sample_per_lang=50, dim=2**10, epochs=10)
        assert m1["weights"] == m2["weights"] and m1["bias"] == m2["bias"]

    def test_feature_hash_is_stable(self):
        # the vectorized rolling hash is part of the model contract: a
        # platform where these buckets move would silently invalidate
        # every persisted model. Pin a few concrete buckets.
        X = TA._langid_features(["ab"], 1 << 13)
        import numpy as np

        nz = sorted(np.nonzero(X[0])[0].tolist())
        P, S = TA._LANGID_P, TA._LANGID_SALT
        a, b = np.uint64(ord("a")), np.uint64(ord("b"))
        exp = sorted({
            int((a ^ S[0]) % np.uint64(1 << 13)),
            int((b ^ S[0]) % np.uint64(1 << 13)),
            int(((a * P + b) ^ S[1]) % np.uint64(1 << 13)),
        })
        assert nz == exp

    def test_broadcast_memoized_and_released(self, spark, corpus, model):
        # the bpe _BC_CACHE posture: repeated scoring calls share ONE
        # broadcast per (session, model); release_all drains it via the
        # registered hook — a bench loop must not accumulate broadcasts
        from sifts_spark.caching import release_all

        _, test = corpus
        TA._LANGID_BC_CACHE.clear()
        TA.langid_score(test, model).count()
        TA.langid_score(test, model).count()
        assert len(TA._LANGID_BC_CACHE) == 1
        release_all()
        assert not TA._LANGID_BC_CACHE

    def test_needs_two_languages(self, spark):
        df = spark.createDataFrame(
            [(1, "hello", "en")], "doc_id long, text string, lang string"
        )
        with pytest.raises(ValueError, match=">=2"):
            TA.train_langid(df)


class TestLangid50:
    """r12 verdict item 8 (stretch): the architecture scales with labels
    by construction — pin it at REAL L: 53 languages across 13 scripts
    (tools/langid50.py pools), per-script held-out floors, and the
    broadcast stays megabyte-sized (the 1000-executor shape claim:
    one (L, dim) float32 matrix rides one broadcast, scoring is still
    a single Arrow matmul scan)."""

    @pytest.fixture(scope="class")
    def corpus50(self, spark):
        from tools.langid50 import corpus_rows

        rows = corpus_rows()
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        return df.filter(F.col("doc_id") % 5 < 3), df.filter(F.col("doc_id") % 5 >= 3)

    @pytest.fixture(scope="class")
    def model50(self, corpus50):
        train, _ = corpus50
        return TA.train_langid(train, sample_per_lang=200, dim=2**13)

    def test_label_count_and_broadcast_size(self, model50):
        from tools.langid50 import N_LANGS

        assert N_LANGS >= 50
        assert len(model50["langs"]) == N_LANGS
        # (L, dim) float32 + bias: still broadcast-trivial at real L
        approx = len(model50["langs"]) * model50["dim"] * 4
        assert approx < 8 * 2**20, approx  # < 8 MiB

    def test_per_script_heldout_floors(self, spark, corpus50, model50):
        from tools.langid50 import SCRIPT_OF

        _, test = corpus50
        pred = TA.langid_score(test, model50)
        joined = pred.join(
            test.select(F.col("doc_id").alias("id"), "lang"), "id"
        ).collect()
        tot: dict[str, int] = {}
        ok: dict[str, int] = {}
        for r in joined:
            s = SCRIPT_OF[r["lang"]]
            tot[s] = tot.get(s, 0) + 1
            ok[s] = ok.get(s, 0) + int(r["pred_lang"] == r["lang"])
        overall = sum(ok.values()) / sum(tot.values())
        # measured 0.9705 overall / 0.954 latin / >=0.979 elsewhere;
        # floors leave seed-robust margin. Latin's misses are the
        # linguistically-real pairs (id<->ms, no<->da).
        assert overall >= 0.93, overall
        for s, n in tot.items():
            acc = ok[s] / n
            floor = 0.90 if s == "latin" else 0.95
            assert acc >= floor, (s, acc)

    def test_gates_multiscript_curation(self, spark, corpus50, model50):
        # the recipe integration at real L: allow one language per
        # script family and confirm only those survive the gate
        from sifts_spark.pipelines.curation import curate_corpus

        _, test = corpus50
        allowed = ("en", "ru", "ar", "zh", "hi", "th")
        cur, _ = curate_corpus(
            test, allowed_langs=allowed, min_quality=0.0,
            langid_model=model50,
        )
        got = cur.join(
            test.select(F.col("doc_id").cast("string").alias("id"), "lang"),
            "id",
        ).collect()
        assert len(got) > 0
        kept_true_langs = {r["lang"] for r in got}
        # everything kept truly belongs to an allowed language (the
        # gate runs on predictions; held-out accuracy floors above
        # bound the leakage — assert none HERE for these far scripts)
        assert kept_true_langs <= set(allowed), kept_true_langs
        from sifts_spark.caching import release_all

        release_all()


class TestShippedArtifact:
    """r14 (r13 verdict stretch 8): the committed pretrained
    53-language artifact (artifacts/langid53.json, built by
    tools/make_langid_artifact.py) loads through functions/artifacts,
    clears a held-out floor on FRESH pool draws, and reaches the
    recipe as a plain path kwarg — multilingual gating with no
    training step."""

    ART = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts",
        "langid53.json",
    )

    def test_artifact_loads_and_scores(self, spark):
        from sifts_spark.caching import release_all
        from sifts_spark.functions.artifacts import load_artifact
        from tools.langid50 import N_LANGS, corpus_rows

        model = load_artifact(spark, self.ART)
        assert model["kind"] == "langid_softmax"
        assert len(model["langs"]) == N_LANGS
        test = spark.createDataFrame(
            corpus_rows(n_per_lang=4, seed=123),
            "doc_id long, text string, lang string",
        )
        pred = TA.langid_score(test, model)
        joined = pred.withColumnRenamed("id", "doc_id").join(
            test.select("doc_id", "lang"), "doc_id"
        )
        acc = joined.selectExpr(
            "avg(CAST(pred_lang = lang AS DOUBLE)) AS a"
        ).first()["a"]
        assert acc >= 0.90, acc
        release_all()

    def test_curate_corpus_accepts_artifact_path(self, spark):
        from sifts_spark.caching import release_all
        from sifts_spark.pipelines.curation import curate_corpus
        from tools.langid50 import corpus_rows

        rows = [
            (i, t, lang)
            for i, t, lang in corpus_rows(n_per_lang=3, seed=7)
            if lang in ("en", "de", "ru")
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string"
        )
        curated, _ = curate_corpus(
            docs,
            allowed_langs=("ru",),
            min_quality=0.0,
            langid_model=self.ART,  # PATH, not dict
        )
        got = curated.select("id", "pred_lang").collect()
        assert got and all(r["pred_lang"] == "ru" for r in got)
        want_ru = {i for i, _, lang in rows if lang == "ru"}
        assert {r["id"] for r in got} <= want_ru and len(got) >= 2
        release_all()
