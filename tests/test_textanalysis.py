"""Impl-equivalence pins for the text-analysis Arrow kernels.

Value parity with DuckDB is pinned by the catalog oracle entries
(text_langid etc.); these tests pin the Arrow kernel against the
pure-JVM expression twin on adversarial rows the sf corpus may not
contain: NULLs, empty strings, ties between languages, tokens shared
by several marker sets, and marker words embedded inside longer tokens.
"""

from __future__ import annotations

from sifts_spark.operators.textanalysis import language_id


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
