"""Impl-equivalence pins for the text-analysis Arrow kernels.

Value parity with DuckDB is pinned by the catalog oracle entries
(text_langid etc.); these tests pin the Arrow kernel against the
pure-JVM expression twin on adversarial rows the sf corpus may not
contain: NULLs, empty strings, ties between languages, tokens shared
by several marker sets, and marker words embedded inside longer tokens.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sifts_spark.operators.textanalysis import language_id
from sifts_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_TEST_DIR", "/root/testdata/sf0.001")


def test_langid_arrow_matches_hof_on_edge_rows(spark):
    rows = [
        (1, "the cat and the hat was in that box"),          # clear en
        (2, "le chien et la vie est une du que"),            # clear fr
        (3, "der hund und die katze ist nicht ein"),         # clear de
        (4, "la la la"),                                     # fr/es/it tie (shared token)
        (5, "un une le el la il"),                           # multi-lang soup
        (6, "zzz qqq www"),                                  # no hits -> und
        (7, ""),                                             # empty
        (8, None),                                           # null text
        (9, "theory android often"),                         # markers inside words: no hits
        (10, "QUE Des EST la"),                              # case folding
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    arrow = {
        r["id"]: (r["pred_lang"], r["lang_hits"])
        for r in language_id(docs, impl="arrow").collect()
    }
    hof = {
        r["id"]: (r["pred_lang"], r["lang_hits"])
        for r in language_id(docs, impl="hof").collect()
    }
    assert arrow == hof
    # spot-pin the semantics themselves, not just impl agreement
    assert arrow[1][0] == "en"
    assert arrow[2][0] == "fr"
    assert arrow[6] == ("und", 0)
    assert arrow[9] == ("und", 0)
    # tie on "la la la": fr/es/it all score 3 -> alphabetically first
    assert arrow[4] == ("es", 3) or arrow[4] == ("fr", 3) or arrow[4] == ("it", 3)
    assert arrow[4] == hof[4]


def test_quality_arrow_matches_hof(spark):
    from sifts_spark.operators.textanalysis import quality_score

    rows = [
        (1, "the cat and the hat was in that box of things"),
        (2, "zzz!!! ??? ###"),
        (3, ""),
        (4, None),
        (5, "the " * 60),             # length saturation + repetition
        (6, "a b c d e f g h i j"),   # short, no stopwords beyond 'a'
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["id"]: (r["punct_ratio"], r["stopword_ratio"], r["quality"])
         for r in quality_score(docs, impl="arrow").collect()}
    h = {r["id"]: (r["punct_ratio"], r["stopword_ratio"], r["quality"])
         for r in quality_score(docs, impl="hof").collect()}
    assert a == h


def test_quality_python_reference(spark):
    """Pin quality_score values against an independent driver-side
    Python computation — guards the r17 staged-Project restructure
    (tokenize bound once, punct count as a regexp_replace length
    delta) against any value drift, including the punct-count
    equivalence (single-char class: chars removed == matches)."""
    import re

    from sifts_spark.operators.textanalysis import LANG_MARKERS, quality_score

    rows = [
        (1, "the cat and the hat was in that box of things!!"),
        (2, "zzz!!! ??? ###"),
        (3, ""),
        (5, "the " * 60),
        (6, "a b c d e f g h i j"),
        (7, "Mixé unicode: çà-et-là 123, twice twice."),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["id"]: (r["punct_ratio"], r["stopword_ratio"], r["quality"])
        for r in quality_score(docs).collect()
    }
    stop = set(LANG_MARKERS["en"])
    for doc_id, text in rows:
        toks = [t for t in re.split(r"[^\w]+", text.lower(), flags=re.UNICODE) if t]
        # \w in python ~ [\p{L}\p{N}_]; the engine's unicode family has
        # no underscore — split on it too for the reference
        toks = [p for t in toks for p in t.split("_") if p]
        n = len(toks)
        n_punct = len(re.findall(r"[^a-zA-Z0-9\s]", text))
        punct_ratio = round(n_punct / max(len(text), 1), 6)
        stop_ratio = round(sum(t in stop for t in toks) / max(n, 1), 6)
        ttr = len(set(toks)) / max(n, 1)
        len_feat = min(n / 50.0, 1.0)
        quality = round(
            0.35 * len_feat
            + 0.25 * ttr
            + 0.25 * min(stop_ratio * 5.0, 1.0)
            + 0.15 * (1.0 - min(punct_ratio * 10.0, 1.0)),
            6,
        )
        assert got[doc_id] == (punct_ratio, stop_ratio, quality), (
            doc_id,
            got[doc_id],
            (punct_ratio, stop_ratio, quality),
        )


def test_repetition_stats_against_python_reference(spark):
    """Arrow kernel pinned against an independent driver-side Python
    computation on real corpus docs plus hand-built degenerate cases."""
    import re
    from collections import Counter

    from sifts_spark.operators.textanalysis import repetition_stats

    hand = [
        (9001, "loop loop loop loop"),                       # one word repeated
        (9002, "a\nb\na\n\n  a  \nc"),                       # dup lines
        (9003, "unique words only here today"),              # clean
        (9004, ""),                                          # empty
        (9005, None),                                        # null
        (9006, "x"),                                         # no bigrams
    ]
    docs = load_table(spark, SF_DIR, "documents").limit(50).select(
        "doc_id", "text"
    ).unionByName(spark.createDataFrame(hand, "doc_id long, text string"))

    got = {r["id"]: r for r in repetition_stats(docs).collect()}

    word_re = re.compile(r"[a-z0-9]+")
    for row in docs.collect():
        t = row["text"]
        lines = [ln.strip() for ln in t.split("\n") if ln.strip()] if t else []
        words = word_re.findall(t.lower()) if t else []
        bigrams = list(zip(words, words[1:]))
        trigrams = list(zip(words, words[1:], words[2:]))
        exp = (
            round(1 - len(set(lines)) / len(lines), 6) if lines else 0.0,
            round(1 - len(set(words)) / len(words), 6) if words else 0.0,
            round(max(Counter(bigrams).values()) / len(bigrams), 6) if bigrams else 0.0,
            round(1 - len(set(trigrams)) / len(trigrams), 6) if trigrams else 0.0,
        )
        g = got[row["doc_id"]]
        assert (
            g["dup_line_frac"], g["dup_word_frac"],
            g["top_bigram_frac"], g["dup_trigram_frac"],
        ) == exp, f"doc {row['doc_id']}"

    # spot semantics: the degenerate loop doc maxes out
    g = got[9001]
    assert g["dup_word_frac"] == 0.75 and g["top_bigram_frac"] == 1.0
    assert got[9002]["dup_line_frac"] == round(1 - 3 / 5, 6)
    assert got[9004]["dup_line_frac"] == 0.0 == got[9005]["top_bigram_frac"]


def test_unigram_lm_perplexity_matches_python_reference(spark):
    """train_unigram_lm + perplexity_score vs an independent pure-
    Python recomputation (Counter over the same regex tokens)."""
    import math
    import re
    from collections import Counter

    from sifts_spark.operators.textanalysis import (
        perplexity_score,
        train_unigram_lm,
    )
    from sifts_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(120)
    model = train_unigram_lm(docs, vocab_size=50)

    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    word_re = re.compile(r"[a-z0-9]+")
    counts: Counter = Counter()
    for t in rows.values():
        counts.update(word_re.findall(t.lower()))
    total = sum(counts.values())
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    ref_lp = {w: math.log(n / total) for w, n in top}
    tail = max(total - sum(n for _, n in top), 1)
    ref_oov = math.log(tail / total)
    assert model["total_tokens"] == total
    assert model["oov_logprob"] == pytest.approx(ref_oov)
    assert model["logprob"] == pytest.approx(ref_lp)

    got = {r["id"]: r for r in perplexity_score(docs, model).collect()}
    assert set(got) == set(rows)
    for did, text in list(rows.items())[:30]:
        words = word_re.findall(text.lower())
        mean = sum(ref_lp.get(w, ref_oov) for w in words) / len(words)
        assert got[did]["n_tokens"] == len(words)
        assert got[did]["logprob_mean"] == pytest.approx(round(mean, 6))
        assert got[did]["perplexity"] == pytest.approx(
            round(math.exp(-mean), 6)
        )


def test_unigram_lm_edges(spark):
    from sifts_spark.operators.textanalysis import (
        perplexity_score,
        train_unigram_lm,
    )

    docs = spark.createDataFrame(
        [(1, "aa bb aa"), (2, ""), (3, None), (4, "zz unseen words")],
        "doc_id long, text string",
    )
    model = train_unigram_lm(docs.filter("doc_id = 1"), vocab_size=10)
    got = {r["id"]: r for r in perplexity_score(docs, model).collect()}
    # empty/null docs: no tokens, NULL perplexity (never inf/NaN)
    for did in (2, 3):
        assert got[did]["n_tokens"] == 0 and got[did]["perplexity"] is None
    # fully-OOV doc scores strictly worse (higher ppl) than in-vocab
    assert got[4]["perplexity"] > got[1]["perplexity"]
    with pytest.raises(ValueError, match="empty corpus"):
        train_unigram_lm(docs.filter("doc_id = 2"))


def test_find_contaminated_ngram_overlap(spark):
    """Planted contamination: docs embedding an eval 13-gram are
    flagged; clean docs are not; short eval items match verbatim."""
    from sifts_spark.operators.textanalysis import find_contaminated

    eval_q = (
        "what is the capital of the country that borders both "
        "france and spain on the iberian peninsula today"
    )
    docs = spark.createDataFrame(
        [
            # 1: embeds the eval question verbatim mid-document
            (1, "intro text here " + eval_q + " and some trailing words"),
            # 2: clean — shares words but never 13 consecutive
            (2, "the capital of france is paris and spain borders it"),
            # 3: embeds a short eval answer (whole-string shingle)
            (3, "students wrote andorra la vella on their sheets"),
            (4, "completely unrelated text about spark joins"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r
        for r in find_contaminated(
            docs, [eval_q, "andorra la vella"], n=13
        ).collect()
    }
    assert set(out) == {1, 3}
    assert out[1]["n_hits"] >= 1
    assert "andorra" in out[3]["sample_ngram"]
    # decontaminate: anti-join leaves only the clean docs
    flagged = find_contaminated(docs, [eval_q, "andorra la vella"], n=13)
    clean = docs.join(
        flagged.withColumnRenamed("id", "doc_id").select("doc_id"),
        "doc_id", "left_anti",
    )
    assert {r["doc_id"] for r in clean.collect()} == {2, 4}


def test_find_contaminated_eval_dataframe_and_real_corpus(spark):
    from sifts_spark.operators.textanalysis import find_contaminated
    from sifts_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    # eval set = verbatim copies of 5 real docs -> exactly those flagged
    # (plus any other doc sharing a full n-gram; use a large n to avoid)
    ev = docs.filter("doc_id < 5").select("text")
    out = find_contaminated(docs, ev, n=10)
    flagged = {r["id"] for r in out.collect()}
    assert {0, 1, 2, 3, 4} <= flagged
    # every flagged doc really shares a 10-gram with an eval doc: spot
    # check that unflagged docs dominate (synthetic corpus is diverse)
    assert len(flagged) < docs.count() / 2


def test_find_contaminated_impl_twins(spark):
    """arrow (hash grams) and hof (string grams) agree on (id,
    n_hits) exactly; sample_ngram is a valid eval gram in both."""
    from sifts_spark.operators.textanalysis import find_contaminated
    from sifts_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    ev = docs.filter("doc_id < 5").select("text")
    a = find_contaminated(docs, ev, n=10, impl="arrow")
    h = find_contaminated(docs, ev, n=10, impl="hof")
    assert (
        {(r["id"], r["n_hits"]) for r in a.collect()}
        == {(r["id"], r["n_hits"]) for r in h.collect()}
    )
    # arrow's sample gram really occurs in some eval text
    evs = [r["text"].lower() for r in ev.collect()]
    for r in a.limit(5).collect():
        assert any(r["sample_ngram"] in t for t in evs)


# ----------------------------- hashed n-gram LM (DSIR feature space)


class TestHashedNgramLM:
    CORPUS_A = ["new york city is big", "new york has new parks"] * 3
    CORPUS_B = ["york new is strange order", "york new again york new"] * 3

    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )

    def test_train_counts_match_python_reference(self, spark):
        from sifts_spark.operators.textanalysis import (
            _py_gram_buckets,
            train_hashed_ngram_lm,
        )
        import numpy as np

        nb = 4096
        m = train_hashed_ngram_lm(
            self._docs(spark, self.CORPUS_A), n=2, num_buckets=nb
        )
        # rebuild the count vector in plain python
        ref = np.zeros(nb, dtype=np.int64)
        for t in self.CORPUS_A:
            for b in _py_gram_buckets(t, 2, nb):
                ref[b] += 1
        lp = np.frombuffer(m["logprob"], dtype="<f4")
        want = np.log((ref + 1.0) / (ref.sum() + nb)).astype("<f4")
        assert m["total_ngrams"] == int(ref.sum())
        assert np.allclose(lp, want)

    def test_bigram_ratio_separates_word_order(self, spark):
        """The point of bigram features: corpora with identical word
        sets but different orderings are indistinguishable to a
        unigram LM yet separable by hashed bigrams."""
        from sifts_spark.operators.classifier import importance_weights
        from sifts_spark.operators.textanalysis import train_hashed_ngram_lm

        nb = 1 << 14
        t_lm = train_hashed_ngram_lm(
            self._docs(spark, self.CORPUS_A), n=2, num_buckets=nb
        )
        s_lm = train_hashed_ngram_lm(
            self._docs(spark, self.CORPUS_B), n=2, num_buckets=nb
        )
        probe = self._docs(
            spark, ["new york city is big and new", "york new strange order here"]
        )
        w = {r["id"]: r["log_weight"]
             for r in importance_weights(probe, t_lm, s_lm).collect()}
        assert w[0] > 0 > w[1]   # A-like doc up-weighted, B-like down

    def test_scoring_and_short_docs(self, spark):
        from sifts_spark.operators.textanalysis import (
            hashed_lm_score,
            train_hashed_ngram_lm,
        )

        m = train_hashed_ngram_lm(
            self._docs(spark, self.CORPUS_A), n=2, num_buckets=2048
        )
        out = {r["id"]: r for r in hashed_lm_score(
            self._docs(spark, ["new york", "word", "", None]), m
        ).collect()}
        assert out[0]["n_ngrams"] == 1 and out[0]["logprob_mean"] < 0
        for i in (1, 2, 3):   # < n tokens -> NULL score
            assert out[i]["n_ngrams"] == 0 and out[i]["logprob_mean"] is None
        # in-distribution text scores higher than junk
        probe = self._docs(spark, ["new york city is big", "zq xv qq jj kk"])
        s = {r["id"]: r["logprob_mean"]
             for r in hashed_lm_score(probe, m).collect()}
        assert s[0] > s[1]

    def test_kind_mismatch_raises(self, spark):
        from sifts_spark.operators.classifier import importance_weights
        from sifts_spark.operators.textanalysis import (
            train_hashed_ngram_lm,
            train_unigram_lm,
        )

        docs = self._docs(spark, self.CORPUS_A)
        uni = train_unigram_lm(docs)
        big = train_hashed_ngram_lm(docs, n=2, num_buckets=1024)
        import pytest as _pt

        with _pt.raises(ValueError, match="feature space"):
            importance_weights(docs, uni, big)
        with _pt.raises(ValueError, match="buckets"):
            importance_weights(
                docs, big, train_hashed_ngram_lm(docs, n=2, num_buckets=2048)
            )

    def test_artifact_roundtrip(self, spark, tmp_path):
        from sifts_spark.functions.artifacts import load_artifact, save_artifact
        from sifts_spark.operators.textanalysis import train_hashed_ngram_lm

        m = train_hashed_ngram_lm(
            self._docs(spark, self.CORPUS_A), n=2, num_buckets=1024
        )
        save_artifact(spark, str(tmp_path / "lm.json"), m)
        m2 = load_artifact(spark, str(tmp_path / "lm.json"))
        assert m2["logprob"] == m["logprob"] and m2["num_buckets"] == 1024


# --------------------------------------------------------------- r7:
# text_fingerprint / text_boilerplate ceded their driver-oracle rows to
# the round-6 family (r6 VERDICT item 1); these DuckDB twins keep their
# value semantics pinned with the same engine-independence the catalog
# oracle gave them.


_FPB_ROWS = [
    (1, "alpha beta gamma delta epsilon zeta"),
    (2, "alpha  BETA gamma delta epsilon zeta"),   # ws/case: same exact_md5
    (3, "alpha beta gamma delta epsilon eta"),     # near-dup: shares shingles
    (4, "one two three four five six seven"),
    (5, "one two three four five six seven"),      # exact dup of 4
    (6, "one two three four five six eight"),
    (7, "one two three four five six nine"),
    (8, "one two three four five six ten"),
    (9, "solo"),                                   # < shingle_size tokens
    (10, ""),                                      # empty
]


def test_fingerprint_duckdb_twin(spark):
    import duckdb

    from sifts_spark.functions.text import shingles_sql, tokenize_sql
    from sifts_spark.operators.textanalysis import fingerprint

    docs = spark.createDataFrame(_FPB_ROWS, "doc_id long, text string")
    got = {
        r["id"]: (r["exact_md5"], r["winnow_fp"])
        for r in fingerprint(docs, k=4, shingle_size=3).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", _FPB_ROWS)
    toks = tokenize_sql("text")
    sh = shingles_sql(toks, 3)
    sql = rf"""
    SELECT doc_id AS id,
           md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS exact_md5,
           md5(array_to_string(
                 list_sort(list_transform(list_distinct({sh}), _s -> md5(_s)))[1:4],
                 '|')) AS winnow_fp
    FROM documents
    """
    ref = {rid: (e, w) for rid, e, w in con.sql(sql).fetchall()}
    assert got == ref
    assert got[1][0] == got[2][0]          # ws/case-normalized exact key
    assert got[4] == got[5]                # exact dups agree on both keys


def test_boilerplate_score_duckdb_twin(spark):
    import duckdb

    from sifts_spark.functions.text import shingles_sql, tokenize_sql
    from sifts_spark.operators.textanalysis import boilerplate_score

    docs = spark.createDataFrame(_FPB_ROWS, "doc_id long, text string")
    got = {
        r["id"]: (r["n_shingles"], r["n_common"], r["boiler_ratio"])
        for r in boilerplate_score(docs, shingle_size=3, min_df=5).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", _FPB_ROWS)
    sh = shingles_sql(tokenize_sql("text"), 3)
    sql = f"""
    WITH base AS (
      SELECT doc_id AS id, list_distinct({sh}) AS shs FROM documents
    ), f AS (
      SELECT id, x AS s FROM base, unnest(shs) AS t(x)
    ), common AS (
      SELECT s FROM (SELECT s, count(*) AS _df FROM f GROUP BY s) WHERE _df >= 5
    ), nc AS (
      SELECT id, count(*) AS n_common FROM f JOIN common USING (s) GROUP BY id
    )
    SELECT base.id,
           CAST(len(shs) AS INT) AS n_shingles,
           CAST(coalesce(nc.n_common, 0) AS BIGINT) AS n_common,
           round(coalesce(nc.n_common, 0) / greatest(len(shs), 1), 6) AS boiler_ratio
    FROM base LEFT JOIN nc ON base.id = nc.id
    """
    ref = {rid: (n, c, b) for rid, n, c, b in con.sql(sql).fetchall()}
    assert got == ref
    # docs 4-8 share 'one two three'-family shingles at df >= 5
    assert got[4][1] > 0 and got[4][2] > 0


def test_keywords_tfidf_duckdb_twin(spark):
    """keywords_tfidf pinned value-exact (tf, df-derived score, rank)
    against DuckDB over the real corpus — same tokenizer, same smoothed
    idf formula, same (score desc, term asc) total order."""
    import duckdb

    from sifts_spark.functions.text import tokenize_sql
    from sifts_spark.operators.textanalysis import keywords_tfidf

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = sorted(
        (r["id"], r["rank"], r["term"], r["tf"], round(r["score"], 6))
        for r in keywords_tfidf(docs, k=3).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = con.execute(f"""
        WITH toks AS (
          SELECT CAST(doc_id AS VARCHAR) AS id, unnest({tokenize_sql('text')}) AS term
          FROM documents
        ), tf AS (
          SELECT id, term, count(*) AS tf FROM toks GROUP BY id, term
        ), dfreq AS (
          SELECT *, count(*) OVER (PARTITION BY term) AS df,
                 (SELECT count(DISTINCT id) FROM tf) AS n_docs
          FROM tf
        ), scored AS (
          SELECT id, term, tf,
                 round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1), 6) AS score
          FROM dfreq
        )
        SELECT id, rank, term, tf, score FROM (
          SELECT *, row_number() OVER (
            PARTITION BY id ORDER BY score DESC, term ASC) AS rank
          FROM scored
        ) WHERE rank <= 3
    """).fetchall()
    want = sorted((i, r, t, f, round(s, 6)) for i, r, t, f, s in want)
    assert len(got) == len(want) > 1000
    assert got == want


def test_keywords_tfidf_rare_term_beats_common(spark):
    docs = spark.createDataFrame(
        [("a", "common common common zyzzogeton"),
         ("b", "common words here"),
         ("c", "common words again")],
        ["doc_id", "text"],
    )
    from sifts_spark.operators.textanalysis import keywords_tfidf

    top_a = [r["term"] for r in keywords_tfidf(docs, k=2).filter(
        "id = 'a'").orderBy("rank").collect()]
    # tf=3 for 'common' (df=3, idf=1) -> 3.0; 'zyzzogeton' tf=1 df=1
    # idf=ln(4/2)+1=1.693 -> common wins on tf, rare term second
    assert top_a == ["common", "zyzzogeton"]


class TestC4Clean:
    """C4 cleaning heuristics (Raffel et al. 2020 §2.2): unit corners
    plus a DuckDB value twin on a corpus synthesized from the real
    documents table (same construction in both engines)."""

    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id string, text string")

    def test_line_filters(self, spark):
        from sifts_spark.operators.textanalysis import c4_clean

        text = "\n".join(
            [
                "This is a proper sentence that survives the gate.",
                "no terminal punctuation here",        # dropped: no punct
                "Too short.",                          # dropped: <3 words
                "Please enable JavaScript to view.",   # dropped: javascript
                "  Another good line stays right here!  ",  # trimmed, kept
                'He said "stop there".',               # kept
                "Is this a question we keep?",         # kept
                "A fifth full sentence closes the page.",  # kept
            ]
        )
        out = c4_clean(
            self._df(spark, [("a", text)]), keep_stats=True
        ).collect()
        assert len(out) == 1
        got = out[0]["text"].split("\n")
        assert got == [
            "This is a proper sentence that survives the gate.",
            "Another good line stays right here!",
            'He said "stop there".',
            "Is this a question we keep?",
            "A fifth full sentence closes the page.",
        ]
        assert out[0]["c4_lines_kept"] == 5
        assert out[0]["c4_lines_dropped"] == 3

    def test_page_gates(self, spark):
        from sifts_spark.operators.textanalysis import c4_clean

        five = " ".join(
            f"This is full sentence number {i} right here." for i in range(5)
        )
        rows = [
            ("keep", five),
            ("short", "Only one good sentence stands here."),  # <5 sentences
            ("lorem", five + " And lorem ipsum filler text follows."),
            # brace on its OWN line with no terminal punct: the line
            # filter removes it BEFORE the page gate sees the brace —
            # C4's order — so the page survives
            ("brace_line", five + "\nfunction() { return; }"),
            # brace inside a punctuated prose line: reaches the page
            # gate and kills the page
            ("brace_prose", five + " Code uses {braces} in prose."),
            ("bad", five + " This page mentions badword once."),
        ]
        kept = sorted(
            r["doc_id"]
            for r in c4_clean(
                self._df(spark, rows), bad_words=("badword",)
            ).collect()
        )
        assert kept == ["brace_line", "keep"]

    def test_duckdb_value_twin(self, spark):
        from sifts_spark.operators.textanalysis import c4_clean

        import duckdb

        # synthesize multi-line pages from real corpus text: each doc's
        # text becomes lines of varying quality keyed by doc_id
        case = (
            "text || '. More words follow here now.' || chr(10) || "
            "'no punct line ' || doc_id || chr(10) || "
            "'Another full sentence appears right here! Then one more "
            "lands. And a third closes. A fourth too. Plus a fifth.'"
        )
        docs = (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .selectExpr("doc_id", f"{case} AS text")
        )
        got = {
            r["doc_id"]: r["text"]
            for r in c4_clean(docs, min_words_per_line=3).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
        )
        want = con.execute(f"""
            WITH src AS (SELECT doc_id, {case} AS text FROM documents),
            l AS (
              SELECT doc_id, list_filter(
                list_transform(string_split(text, chr(10)),
                  _x -> regexp_replace(_x, '^\\s+|\\s+$', '', 'g')),
                _t -> _t <> '' AND regexp_matches(_t, '[.!?"”]$')
                  AND len(string_split_regex(_t, '\\s+')) >= 3
                  AND NOT regexp_matches(lower(_t), '\\bjavascript\\b')
              ) AS kept FROM src
            ),
            c AS (SELECT doc_id, array_to_string(kept, chr(10)) AS text FROM l)
            SELECT doc_id, text FROM c
            WHERE len(regexp_extract_all(text, '[.!?]+')) >= 5
              AND NOT contains(lower(text), 'lorem ipsum')
              AND NOT contains(text, '{{')
        """).fetchall()
        assert len(want) == len(got) > 100
        for doc_id, text in want:
            assert got[doc_id] == text, doc_id

    def test_recipe_c4_stage(self, spark, tmp_path):
        from sifts_spark.pipelines.curation import prepare_training_data

        good = " ".join(
            f"The number {i} sentence carries plenty of honest words."
            for i in range(6)
        )
        rows = [
            ("d0", good),
            ("d1", "word " * 30),  # no terminal punct: all lines drop
        ]
        docs = spark.createDataFrame(rows, "doc_id string, text string")
        manifest = prepare_training_data(
            docs, str(tmp_path / "out"), min_quality=0.0, c4_rules=True
        )
        assert manifest["stages"]["input"] == 2
        assert manifest["stages"]["c4_cleaned"] == 1
        out = spark.read.parquet(str(tmp_path / "out" / "docs"))
        assert [r["id"] for r in out.select("id").collect()] == ["d0"]


class TestTopNgrams:
    def test_unit_census_semantics(self, spark):
        from sifts_spark.operators.textanalysis import top_ngrams

        rows = [
            ("a", "the cat sat on the cat mat"),
            ("b", "the cat sat"),
            ("c", "solo"),  # shorter than n=2: contributes nothing
            ("d", ""),
        ]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        got = [(r["gram"], r["n"]) for r in top_ngrams(df, n=2, k=3).collect()]
        # 'the cat' x3, 'cat sat' x2, then alphabetical among count-1
        assert got == [("the cat", 3), ("cat sat", 2), ("cat mat", 1)]

    def test_catalog_duckdb_twin(self, spark):
        # top_ngrams ceded its catalog row in r16 (fts_substr_scan
        # rotation) — the function + SQL twin stay importable
        import duckdb

        from sifts_spark.plans.catalog import _TOP_NGRAMS_SQL, top_ngrams_q

        got = [
            (r["gram"], r["n"])
            for r in top_ngrams_q(spark, SF_DIR).collect()
        ]
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
        )
        want = [tuple(t) for t in con.execute(_TOP_NGRAMS_SQL).fetchall()]
        assert got == want and len(got) == 20


class TestGopherQuality:
    """Gopher/MassiveWeb document-shape rules (Rae et al. 2021 A1.1):
    per-rule unit corners, an independent Python reference over real
    corpus docs, and the recipe gate."""

    def test_rule_corners(self, spark):
        from sifts_spark.operators.textanalysis import gopher_quality

        good = " ".join(
            "the quick brown fox and that dog have run with joy to be "
            "here of late".split() * 5
        )
        rows = [
            ("good", good),
            ("short", "the and of to be"),                      # <50 words
            ("symbols", " ".join(["word #tag"] * 40)),          # hash ratio
            ("bullets", "\n".join(["• item one here"] * 10)),   # bullet lines
            ("ellipsis", "\n".join(
                [f"{good} so it trails off..."] * 10)),         # ellipsis ends
            ("numeric", " ".join(["1234 5678"] * 40)),          # no alpha words
            ("nostop", " ".join(["lorem ipsum dolor sit"] * 20)),  # <2 stopwords
            ("null", None),
        ]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        got = {r["id"]: r for r in gopher_quality(df).collect()}
        assert got["good"]["gopher_pass"]
        for bad in ("short", "symbols", "bullets", "ellipsis",
                    "numeric", "nostop", "null"):
            assert not got[bad]["gopher_pass"], bad
        assert got["good"]["n_stopwords_present"] >= 5
        assert got["bullets"]["bullet_line_frac"] == 1.0
        assert got["ellipsis"]["ellipsis_line_frac"] == 1.0
        assert got["numeric"]["alpha_word_frac"] == 0.0

    def test_python_reference_on_corpus(self, spark):
        import re

        from sifts_spark.operators.textanalysis import (
            GOPHER_STOPWORDS,
            gopher_quality,
        )

        docs = load_table(spark, SF_DIR, "documents").limit(80)
        got = {r["id"]: r for r in gopher_quality(docs).collect()}
        for row in docs.collect():
            t = row["text"] or ""
            words = [w for w in re.split(r"\s+", t) if w]
            nw = max(len(words), 1)
            lines = [ln.strip() for ln in t.split("\n") if ln.strip()]
            nl = max(len(lines), 1)
            toks = set(re.findall("[a-z0-9]+", t.lower()))
            g = got[row["doc_id"]]
            assert g["n_words"] == len(words)
            assert g["mean_word_len"] == round(
                sum(len(w) for w in words) / nw, 6
            )
            assert g["symbol_word_ratio"] == round(
                (t.count("#") + len(re.findall(r"\.\.\.|…", t))) / nw, 6
            )
            assert g["bullet_line_frac"] == round(
                sum(1 for ln in lines if re.match(r"^[•\-\*‣◦]", ln)) / nl, 6
            )
            assert g["ellipsis_line_frac"] == round(
                sum(1 for ln in lines if re.search(r"(\.\.\.|…)$", ln)) / nl,
                6,
            )
            assert g["alpha_word_frac"] == round(
                sum(1 for w in words if re.search("[a-zA-Z]", w)) / nw, 6
            )
            assert g["n_stopwords_present"] == len(
                toks & set(GOPHER_STOPWORDS)
            )

    def test_recipe_gopher_stage(self, spark, tmp_path):
        from sifts_spark.pipelines.curation import prepare_training_data

        good = " ".join(
            "the quick brown fox and that dog have run with joy to be "
            "here of late".split() * 5
        )
        rows = [("g", good), ("b", "the and of")]
        docs = spark.createDataFrame(rows, "doc_id string, text string")
        m = prepare_training_data(
            docs, str(tmp_path / "out"), min_quality=0.0, ppl_band=None,
            gopher_rules=True,
        )
        assert m["stages"]["input"] == 2
        assert m["stages"]["gopher_filtered"] == 1
        out = spark.read.parquet(str(tmp_path / "out" / "docs"))
        assert [r["id"] for r in out.collect()] == ["g"]


class TestGopherRepetition:
    """Gopher's full repetition-removal signal set (Rae et al. 2021
    A1.1): per-signal corners, an independent Python reference over
    real corpus docs, threshold-override validation, and the recipe
    gate."""

    def test_signal_corners(self, spark):
        from sifts_spark.operators.textanalysis import gopher_repetition

        clean = (
            "The quick brown fox jumps over one lazy dog today.\n"
            "Seven violet parrots argue about jazz near the old pier.\n"
            "Every morning brings different words and nothing repeats here."
        )
        dup_lines = "\n".join(["same line again"] * 9 + ["unique closer"])
        dup_paras = "\n\n".join(["para one is here", "para one is here",
                                 "a different paragraph"])
        loop5 = " ".join(["alpha beta gamma delta epsilon"] * 12)
        top2 = " ".join(["very good"] * 20 + ["other words exist too"])
        rows = [
            ("clean", clean),
            ("dup_lines", dup_lines),
            ("dup_paras", dup_paras),
            ("loop5", loop5),
            ("top2", top2),
            ("null", None),
            ("empty", ""),
        ]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        got = {r["id"]: r for r in gopher_repetition(df).collect()}

        assert got["clean"]["gopher_rep_pass"]
        assert got["clean"]["dup_line_frac"] == 0.0

        assert got["dup_lines"]["dup_line_frac"] == 0.8  # 8 of 10 repeat
        assert got["dup_lines"]["dup_line_char_frac"] > 0.2
        assert not got["dup_lines"]["gopher_rep_pass"]

        assert got["dup_paras"]["dup_para_frac"] == round(1 / 3, 6)
        assert got["dup_paras"]["dup_para_char_frac"] > 0.2
        assert not got["dup_paras"]["gopher_rep_pass"]

        # back-to-back phrase loop: the greedy scan matches repeats of
        # the 5-gram wall-to-wall after the first occurrence
        assert got["loop5"]["dup_5gram_char_frac"] > 0.15
        assert not got["loop5"]["gopher_rep_pass"]

        # "very good" occurs 20x: 20 * 8 chars / len(text)
        t = top2
        assert got["top2"]["top_2gram_char_frac"] == round(
            20 * len("verygood") / len(t), 6
        )
        assert not got["top2"]["gopher_rep_pass"]

        # empty/None: all-zero signals, pass (emptiness is
        # gopher_quality's min_words job)
        for k in ("null", "empty"):
            assert got[k]["gopher_rep_pass"], k
            assert got[k]["dup_5gram_char_frac"] == 0.0

    def test_python_reference_on_corpus(self, spark):
        import re
        from collections import Counter

        from sifts_spark.operators.textanalysis import gopher_repetition

        def ref(t):
            if t is None:
                t = ""
            denom = max(len(t), 1)
            out = {}
            for key, elems in (
                ("line", [x.strip() for x in t.split("\n") if x.strip()]),
                ("para", [x.strip()
                          for x in re.split(r"\n\s*\n", t) if x.strip()]),
            ):
                counts = Counter(elems)
                n_dup = sum(c - 1 for c in counts.values())
                c_dup = sum((c - 1) * len(e) for e, c in counts.items())
                out[f"dup_{key}_frac"] = (
                    n_dup / len(elems) if elems else 0.0
                )
                out[f"dup_{key}_char_frac"] = c_dup / denom
            words = re.findall(r"[a-z0-9]+", t.lower())
            for n in (2, 3, 4):
                grams = Counter(
                    tuple(words[i:i + n])
                    for i in range(len(words) - n + 1)
                )
                best = max(
                    ((c, sum(map(len, g))) for g, c in grams.items()),
                    default=(0, 0),
                )
                out[f"top_{n}gram_char_frac"] = best[0] * best[1] / denom
            for n in range(5, 11):
                seen, chars, i = set(), 0, 0
                while i <= len(words) - n:
                    g = tuple(words[i:i + n])
                    if g in seen:
                        chars += sum(map(len, g))
                        i += n
                    else:
                        seen.add(g)
                        i += 1
                out[f"dup_{n}gram_char_frac"] = chars / denom
            return {k: round(v, 6) for k, v in out.items()}

        # real corpus docs plus adversarial rows the corpus lacks
        docs = load_table(spark, SF_DIR, "documents").limit(60)
        extra = spark.createDataFrame(
            [("x1", "a b c d e f g h i j a b c d e f g h i j"),
             ("x2", "one\ntwo\n\none\ntwo\n\nthree"),
             ("x3", None)],
            "doc_id string, text string",
        )
        docs = docs.select(
            F.col("doc_id").cast("string").alias("doc_id"), "text"
        ).unionByName(extra)
        got = {r["id"]: r for r in gopher_repetition(docs).collect()}
        for row in docs.collect():
            want = ref(row["text"])
            g = got[row["doc_id"]]
            for k, v in want.items():
                assert g[k] == v, (row["doc_id"], k, g[k], v)

    def test_threshold_override_and_unknown_key(self, spark):
        from sifts_spark.operators.textanalysis import gopher_repetition

        text = "\n".join([
            "alpha bravo charlie",
            "alpha bravo charlie",
            "delta echo foxtrot golf hotel india juliet kilo",
            "lima mike november oscar papa quebec romeo sierra",
            "tango uniform victor whiskey xray yankee zulu item one",
            "extra words keep every gram fraction far below limits",
        ])
        df = spark.createDataFrame(
            [("d", text)], "doc_id string, text string"
        )
        # dup_line_frac = 0.2 passes the default 0.30 but fails 0.1
        assert gopher_repetition(df).collect()[0]["gopher_rep_pass"]
        tight = gopher_repetition(
            df, thresholds={"dup_line_frac": 0.1}
        ).collect()[0]
        assert not tight["gopher_rep_pass"]
        with pytest.raises(ValueError, match="unknown repetition"):
            gopher_repetition(df, thresholds={"nope": 0.5})

    def test_recipe_gopher_repetition_stage(self, spark, tmp_path):
        from sifts_spark.pipelines.curation import prepare_training_data

        good = (
            "the quick brown fox and that dog have run with joy to be "
            "here of late while seven violet parrots argue about jazz "
            "near the old pier and every morning brings different words "
            "plus nothing ever repeats anywhere in this single document"
        )
        loop = " ".join(["the same five word phrase"] * 30)
        docs = spark.createDataFrame(
            [("g", good), ("r", loop)], "doc_id string, text string"
        )
        m = prepare_training_data(
            docs, str(tmp_path / "out"), min_quality=0.0, ppl_band=None,
            gopher_repetition=True,
        )
        assert m["stages"]["input"] == 2
        assert m["stages"]["gopher_rep_filtered"] == 1
        out = spark.read.parquet(str(tmp_path / "out" / "docs"))
        assert [r["id"] for r in out.collect()] == ["g"]


class TestScriptStats:
    """Unicode-script composition (script_stats): main-script pins on
    multilingual rows, edge cases, and a DuckDB RE2 value twin over
    synthetic + real corpus docs."""

    ROWS = [
        ("en", "The quick brown fox jumps over the lazy dog"),
        ("ru", "Съешь же ещё этих мягких французских булок"),
        ("zh", "天地玄黄宇宙洪荒日月盈昃辰宿列张"),
        ("ja", "すもももももももものうち、漢字とカタカナも混ざる"),
        ("ko", "다람쥐 헌 쳇바퀴에 타고파"),
        ("ar", "نص حكيم له سر قاطع وذو شأن عظيم"),
        ("hi", "ऋषियों को सताने वाले दुष्ट राक्षसों के राजा"),
        ("mixed", "hello мир 世界 bonjour"),
        ("digits", "1234567890 !!! ???"),
        ("empty", ""),
        ("null", None),
        # U+3000 ideographic space + NBSP: whitespace, NOT content
        ("cjk_space", "天地　玄黄　宇宙"),
        ("nbsp", "hello world"),
    ]

    def test_main_script_and_edges(self, spark):
        from sifts_spark.operators.textanalysis import script_stats

        df = spark.createDataFrame(self.ROWS, "doc_id string, text string")
        got = {r["id"]: r for r in script_stats(df).collect()}
        want_main = {
            "en": "latin", "ru": "cyrillic", "zh": "han", "ko": "hangul",
            "ar": "arabic", "hi": "devanagari", "digits": "none",
            "empty": "none", "null": "none",
        }
        for k, v in want_main.items():
            assert got[k]["main_script"] == v, (k, got[k])
        # ja: kana outnumbers han in the sample
        assert got["ja"]["main_script"] == "kana"
        assert got["ja"]["han_frac"] > 0
        # mixed doc: every script present, fractions sum to ~1
        m = got["mixed"]
        assert m["latin_frac"] > 0 and m["cyrillic_frac"] > 0
        assert m["han_frac"] > 0
        total = sum(
            m[f"{s}_frac"] for s in
            ("latin", "cyrillic", "han", "kana", "hangul", "arabic",
             "devanagari")
        ) + m["other_frac"]
        assert abs(total - 1.0) < 1e-5
        # digits-only: all chars are "other"
        assert got["digits"]["other_frac"] == 1.0
        assert got["empty"]["n_chars"] == 0
        # Unicode space separators are whitespace, not "other" content
        assert got["cjk_space"]["n_chars"] == 6
        assert got["cjk_space"]["han_frac"] == 1.0
        assert got["nbsp"]["n_chars"] == 10
        assert got["nbsp"]["latin_frac"] == 1.0

    def test_duckdb_twin(self, spark):
        import duckdb

        from sifts_spark.operators.textanalysis import (
            SCRIPT_PATTERNS,
            WS_PATTERN_RE2,
            script_stats,
        )

        docs = (
            load_table(spark, SF_DIR, "documents")
            .select(F.col("doc_id").cast("string").alias("doc_id"), "text")
            .limit(40)
            .unionByName(
                spark.createDataFrame(
                    self.ROWS, "doc_id string, text string"
                )
            )
        )
        got = {r["id"]: r for r in script_stats(docs).collect()}

        pdf = docs.toPandas()
        con = duckdb.connect()
        con.register("docs", pdf)
        cnt = {
            name: (
                "length(t) - length(regexp_replace(t, '"
                + re2 + "', '', 'g'))"
            )
            for name, (_, re2) in SCRIPT_PATTERNS.items()
        }
        listed = " + ".join(cnt.values())
        frac_cols = ", ".join(
            f"round(({c})::DOUBLE / denom, 6) AS {name}_frac"
            for name, c in cnt.items()
        )
        case = "CASE "
        for name, c in cnt.items():
            case += f"WHEN ({c}) > 0 AND ({c}) = best THEN '{name}' "
        case += "ELSE 'none' END AS main_script"
        best = "greatest(" + ", ".join(cnt.values()) + ")"
        sql = f"""
            WITH base AS (
                SELECT doc_id, coalesce(text, '') AS t FROM docs
            ), d AS (
                SELECT doc_id, t,
                       length(regexp_replace(t, '{WS_PATTERN_RE2}', '', 'g')) AS n_chars,
                       greatest(length(regexp_replace(t, '{WS_PATTERN_RE2}', '', 'g')), 1)::DOUBLE AS denom,
                       {best} AS best
                FROM base
            )
            SELECT doc_id, n_chars, {frac_cols},
                   round((n_chars - ({listed}))::DOUBLE / denom, 6) AS other_frac,
                   {case}
            FROM d
        """
        for row in con.execute(sql).fetchall():
            cols = ["doc_id", "n_chars"] + [
                f"{n}_frac" for n in cnt
            ] + ["other_frac", "main_script"]
            want = dict(zip(cols, row))
            g = got[want["doc_id"]]
            assert g["n_chars"] == want["n_chars"], want["doc_id"]
            for c in cols[2:-1]:
                assert g[c] == want[c], (want["doc_id"], c, g[c], want[c])
            assert g["main_script"] == want["main_script"], want["doc_id"]


def test_text_scrub_matches_oracle(spark):
    # de-registered late in r10 (row ceded to script_stats); original
    # SQL twin kept here
    import duckdb

    from sifts_spark.plans.catalog import _scrub_sql, text_scrub

    got = {
        r["id"]: r["scrubbed_md5"]
        for r in text_scrub(spark, SF_DIR).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = {r[0]: r[1] for r in con.sql(_scrub_sql()).fetchall()}
    assert got == want and len(got) == 500


def test_bpe_ish_token_count_cjk_per_char_three_engines(spark):
    """r14 review fix: unsegmented CJK counts per CHARACTER (a run-level
    count under-counts ~20x vs any real subword tokenizer — chunk/pack
    budgets would overshoot by the same factor). Spark, DuckDB and the
    Python span form (chunking) must agree on mixed-script text,
    including the mixed-run edge ('abc中def' = 3, not 1)."""
    import re

    import duckdb

    from sifts_spark.operators.textanalysis import (
        TOKEN_COUNT_RE_PY,
        bpe_ish_token_count,
        token_count_sql,
    )

    texts = [
        "abc中def",
        "敏捷狐狸跳过懒狗",
        "こんにちは 世界",
        "한국어 문서 예시",
        "hello, world_x 123",
        "中、中。",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    got_spark = {
        r["i"]: r["n"]
        for r in df.select(
            "i", bpe_ish_token_count(F.col("t")).alias("n")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, txt VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    got_duck = {
        i: n
        for i, n in con.sql(
            f"SELECT i, {token_count_sql('txt')} FROM t"
        ).fetchall()
    }
    got_py = {
        i: len(re.findall(TOKEN_COUNT_RE_PY, t.lower()))
        for i, t in enumerate(texts)
    }
    assert got_spark == got_duck == got_py, (got_spark, got_duck, got_py)
    assert got_spark[0] == 3      # abc / 中 / def — the mixed-run edge
    assert got_spark[1] == 8      # one per Han char
    assert got_spark[2] == 7      # 5 kana + 2 Han
    assert got_spark[5] == 4      # 中 、 中 。
