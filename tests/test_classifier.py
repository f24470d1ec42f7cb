"""Quality classifier + DSIR importance resampling (operators/classifier.py)
and paragraph-level dedup (operators/dedup.py::dedup_paragraphs)."""

from __future__ import annotations

import hashlib
import math
import random

import numpy as np
import pytest

from pyspark.sql import functions as F

from sifts_spark.operators.classifier import (
    classifier_score,
    importance_weights,
    pareto_keep,
    train_quality_classifier,
    weighted_sample,
)
from sifts_spark.operators.dedup import dedup_paragraphs
from sifts_spark.operators.textanalysis import train_unigram_lm


CLEAN_VOCAB = (
    "the of and to in a is that it was for on are as with his they at be "
    "this have from or had by word but what some we can out other were all"
).split()
NOISE_VOCAB = [f"zx{i}q" for i in range(40)] + CLEAN_VOCAB[:8]


def _mk_docs(vocab, n, seed, words=30):
    rng = random.Random(seed)
    return [" ".join(rng.choice(vocab) for _ in range(words)) for _ in range(n)]


@pytest.fixture(scope="module")
def corpus(spark):
    pos = _mk_docs(CLEAN_VOCAB, 300, seed=1)
    neg = _mk_docs(NOISE_VOCAB, 300, seed=2)
    pos_df = spark.createDataFrame([(f"p{i}", t) for i, t in enumerate(pos)], "doc_id string, text string")
    neg_df = spark.createDataFrame([(f"n{i}", t) for i, t in enumerate(neg)], "doc_id string, text string")
    return pos, neg, pos_df, neg_df


# ------------------------------------------------------- classifier


def test_classifier_separates_heldout_classes(spark, corpus):
    pos, neg, pos_df, neg_df = corpus
    model = train_quality_classifier(pos_df, neg_df, sample_per_class=200)
    held_pos = _mk_docs(CLEAN_VOCAB, 60, seed=11)
    held_neg = _mk_docs(NOISE_VOCAB, 60, seed=12)
    held = spark.createDataFrame(
        [(f"hp{i}", t) for i, t in enumerate(held_pos)]
        + [(f"hn{i}", t) for i, t in enumerate(held_neg)],
        "doc_id string, text string",
    )
    scored = {r["id"]: r["quality_prob"] for r in classifier_score(held, model).collect()}
    acc = (
        sum(scored[f"hp{i}"] > 0.5 for i in range(60))
        + sum(scored[f"hn{i}"] <= 0.5 for i in range(60))
    ) / 120
    assert acc >= 0.95, f"held-out accuracy {acc}"


def test_classifier_training_is_deterministic(corpus):
    _, _, pos_df, neg_df = corpus
    m1 = train_quality_classifier(pos_df, neg_df, sample_per_class=50, epochs=5)
    m2 = train_quality_classifier(pos_df, neg_df, sample_per_class=50, epochs=5)
    assert m1["weights"] == m2["weights"] and m1["bias"] == m2["bias"]


def test_classifier_score_matches_numpy_reference(spark, corpus):
    from sifts_spark.functions.hashing import _py_tokenize
    from sifts_spark.operators.classifier import _bucket

    _, _, pos_df, neg_df = corpus
    model = train_quality_classifier(pos_df, neg_df, sample_per_class=50, epochs=5)
    texts = ["the of and zx1q", "", "zx2q zx3q zx3q", None]
    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], "doc_id string, text string"
    )
    got = {r["id"]: r["quality_prob"] for r in classifier_score(df, model).collect()}
    w = np.frombuffer(model["weights"], dtype="<f4")
    for i, t in enumerate(texts):
        toks = _py_tokenize(t or "")
        z = (sum(float(w[_bucket(k, model["dim"])]) for k in toks) / len(toks) if toks else 0.0) + model["bias"]
        assert got[str(i)] == pytest.approx(round(1 / (1 + math.exp(-z)), 6), abs=1e-6)


def test_classifier_artifact_roundtrip(spark, corpus, tmp_path):
    from sifts_spark.functions.artifacts import load_artifact, save_artifact

    _, _, pos_df, neg_df = corpus
    model = train_quality_classifier(pos_df, neg_df, sample_per_class=50, epochs=5)
    path = str(tmp_path / "quality_lr.json")
    save_artifact(spark, path, model)
    loaded = load_artifact(spark, path)
    assert loaded["weights"] == model["weights"]
    assert loaded["bias"] == model["bias"] and loaded["dim"] == model["dim"]


def test_pareto_keep_orders_survival_by_score(spark):
    # 2000 ids at two scores: the high-score band must survive at a
    # much higher rate; draws are per-id deterministic.
    rows = [(f"d{i}", 0.95 if i % 2 else 0.30) for i in range(2000)]
    df = spark.createDataFrame(rows, "id string, quality_prob double")
    kept = df.filter(pareto_keep("quality_prob", "id")).collect()
    hi = sum(1 for r in kept if r["quality_prob"] > 0.5)
    lo = len(kept) - hi
    # keep prob is (2-q)^-9: ~0.64 at q=0.95, ~0.008 at q=0.30; the
    # md5 draw is seed-deterministic, so loose bounds cannot flake.
    assert 500 < hi < 800
    assert 0 < lo < 50       # long tail: some low-quality survives
    again = df.filter(pareto_keep("quality_prob", "id")).count()
    assert again == len(kept)


# ------------------------------------------------------------- DSIR


def test_importance_weights_prefer_target_like_docs(spark, corpus):
    pos, neg, pos_df, neg_df = corpus
    target_lm = train_unigram_lm(pos_df, vocab_size=1000)
    source_lm = train_unigram_lm(pos_df.unionAll(neg_df), vocab_size=1000)
    held = spark.createDataFrame(
        [("t0", _mk_docs(CLEAN_VOCAB, 1, seed=21)[0]),
         ("s0", _mk_docs(NOISE_VOCAB, 1, seed=22)[0]),
         ("e0", "")],
        "doc_id string, text string",
    )
    got = {r["id"]: r for r in importance_weights(held, target_lm, source_lm).collect()}
    assert got["t0"]["log_weight"] > 0 > got["s0"]["log_weight"]
    assert got["e0"]["log_weight"] == 0.0 and got["e0"]["n_tokens"] == 0


def test_weighted_sample_exact_n_deterministic_and_proportional(spark):
    # weight ratio 9:1 between two halves → the heavy half should take
    # ~90% of a 200-of-2000 draw; repeat under two seeds.
    rows = [(f"d{i}", math.log(9.0) if i < 1000 else 0.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "id string, log_weight double")
    s1 = weighted_sample(df, 200, seed=1)
    got1 = s1.collect()
    assert len(got1) == 200
    heavy = sum(1 for r in got1 if r["log_weight"] > 0)
    assert 150 <= heavy <= 200
    assert [r["id"] for r in weighted_sample(df, 200, seed=1).collect()] == [r["id"] for r in got1]
    assert {r["id"] for r in weighted_sample(df, 200, seed=2).collect()} != {r["id"] for r in got1}


def test_weighted_sample_null_weight_never_wins(spark):
    rows = [("a", 0.0), ("b", None), ("c", 0.0)]
    df = spark.createDataFrame(rows, "id string, log_weight double")
    got = {r["id"] for r in weighted_sample(df, 3, seed=0).collect()}
    assert got == {"a", "c"}


# ----------------------------------------------------- paragraph dedup


def _py_dedup_paragraphs(rows, min_chars=1):
    """Independent Python reference: first occurrence by (id, pos)."""
    import re

    paras = []
    for did, text in rows:
        pos = 0
        for seg in re.split(r"\n+", text or ""):
            if seg.strip():
                paras.append((did, pos, seg))
                pos += 1
    winner = {}
    for did, pos, seg in paras:
        if len(seg) < min_chars:
            continue
        key = re.sub(r"\s+", " ", seg.strip().lower())
        if key not in winner or (did, pos) < winner[key]:
            winner[key] = (did, pos)
    out = {did: ([], 0) for did, _ in rows}
    counts = {did: 0 for did, _ in rows}
    for did, pos, seg in paras:
        counts[did] += 1
        key = re.sub(r"\s+", " ", seg.strip().lower())
        if len(seg) < min_chars or winner[key] == (did, pos):
            out[did][0].append(seg)
    return {
        did: ("\n".join(segs), counts[did], len(segs))
        for did, (segs, _) in out.items()
    }


PARA_ROWS = [
    ("a", "All rights reserved.\nUnique body text one.\nShare this article"),
    ("b", "unique second doc.\nAll  Rights   Reserved.\nShare this article"),
    ("c", "All rights reserved.\nShare this article"),
    ("d", "ok\nAll rights reserved.\nok"),   # short paras exempt
    ("e", ""),                               # paragraph-less doc survives
    ("f", None),
]


def test_dedup_paragraphs_matches_python_reference(spark):
    df = spark.createDataFrame(PARA_ROWS, "doc_id string, text string")
    got = {r["id"]: r for r in dedup_paragraphs(df, min_chars=3).collect()}
    ref = _py_dedup_paragraphs(PARA_ROWS, min_chars=3)
    assert set(got) == set(ref)
    for did, (text, n_paras, n_kept) in ref.items():
        assert got[did]["text"] == text, did
        assert got[did]["n_paras"] == n_paras
        assert got[did]["n_kept"] == n_kept
        assert got[did]["n_dropped"] == n_paras - n_kept


def test_dedup_paragraphs_duckdb_twin(spark):
    """DuckDB replays the exact winner rule (md5 over the normalized
    paragraph, min (id,pos) wins) — pins engine-independence of the
    semantics the same way the catalog oracles do."""
    import duckdb

    df = spark.createDataFrame(PARA_ROWS, "doc_id string, text string")
    got = {
        (r["id"]): (r["text"], r["n_paras"], r["n_kept"])
        for r in dedup_paragraphs(df, min_chars=3).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", PARA_ROWS)
    sql = r"""
    WITH paras AS (
      SELECT doc_id AS id, seg, row_number() OVER (PARTITION BY doc_id ORDER BY ord) - 1 AS pos
      FROM (
        SELECT doc_id, l[ord] AS seg, ord FROM
          (SELECT doc_id, string_split_regex(coalesce(text, ''), '\n+') AS l FROM docs),
          UNNEST(generate_series(1, len(l))) AS t(ord)
      ) WHERE trim(seg) <> ''
    ), hashed AS (
      SELECT *, length(seg) < 3 AS short,
             md5(regexp_replace(lower(trim(seg)), '\s+', ' ', 'g')) AS h
      FROM paras
    ), winners AS (
      SELECT h, min(struct_pack(id := id, pos := pos)) AS win
      FROM hashed WHERE NOT short GROUP BY h
    ), kept AS (
      SELECT hashed.*, (short OR (win.id = hashed.id AND win.pos = hashed.pos)) AS keep
      FROM hashed LEFT JOIN winners USING (h)
    )
    SELECT d.doc_id AS id,
           coalesce(string_agg(seg, chr(10) ORDER BY pos) FILTER (WHERE keep), '') AS text,
           count(pos) AS n_paras,
           count(CASE WHEN keep THEN 1 END) AS n_kept
    FROM docs d LEFT JOIN kept ON kept.id = d.doc_id
    GROUP BY d.doc_id
    """
    for rid, text, n_paras, n_kept in con.sql(sql).fetchall():
        assert got[rid] == (text, n_paras, n_kept), rid


# ------------------------------------------- pipeline integration


def test_prepare_training_data_with_new_stages(spark, corpus, tmp_path):
    """paragraph_dedup + quality_model stages slot into the recipe:
    attrition stays monotone, boilerplate paragraphs vanish from the
    exported text, classifier-rejected docs fall out."""
    from sifts_spark.pipelines.curation import prepare_training_data

    pos, neg, pos_df, neg_df = corpus
    model = train_quality_classifier(pos_df, neg_df, sample_per_class=200)

    boiler = "all rights reserved on this very long footer line"
    rows = (
        [(f"p{i}", f"{t}\n{boiler}") for i, t in enumerate(pos[:30])]
        + [(f"n{i}", f"{t}\n{boiler}") for i, t in enumerate(neg[:30])]
    )
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    m = prepare_training_data(
        docs,
        str(tmp_path / "out"),
        allowed_langs=("en", "de", "fr", "es", "zh"),
        min_quality=0.0,
        jaccard_threshold=0.99,
        ppl_band=None,
        paragraph_dedup=True,
        quality_model=model,
        classifier_min_prob=0.5,
        target_file_mb=0.01,
    )
    s = m["stages"]
    assert s["curated"] >= s["paragraph_deduped"] >= s["classifier_filtered"] > 0
    # the classifier gate removed the noise-vocab docs
    assert s["classifier_filtered"] <= s["paragraph_deduped"] - 20
    exported = spark.read.parquet(str(tmp_path / "out" / "docs"))
    texts = [r["text"] for r in exported.select("text").collect()]
    # first occurrence only — and it rode doc n0 (lowest id), which the
    # classifier gate then dropped, so the export may hold 0 copies
    assert sum(boiler in t for t in texts) <= 1
    assert all(t.strip() for t in texts)
