"""Fuzzy term match (`word~`, `word~2`) — r16 defined extension.

Lucene's fuzzy-query syntax over whole-token Levenshtein distance,
word families only. Three-way equality pins: postings term-dictionary
serving ≡ scan predicate ≡ DuckDB `levenshtein` twin (both engines
ship classic Levenshtein, so the twins agree by construction).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sifts_spark.collection import Collection
from sifts_spark.operators import search as S
from sifts_spark.queryparser import (
    And,
    AndNot,
    Fuzzy,
    ParseError,
    parse_query,
)

DOCS = [
    ("a", "merge sort runs fast"),
    ("b", "marge wrote the merg notes"),   # two distance-1 neighbors
    ("c", "emerge from the deep"),          # distance 2 (insert e... no:
    # emerge vs merge = 1 insertion at front -> distance 1
    ("d", "mergers and acquisitions"),      # mergers: distance 2
    ("e", "totally unrelated words"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "id string, content string")


class TestFuzzyParse:
    def test_goldens(self):
        assert parse_query("merge~") == Fuzzy("merge", 1)
        assert parse_query("merge~2") == Fuzzy("merge", 2)
        assert parse_query("merge~ table") == And(
            Fuzzy("merge", 1), parse_query("table")
        )
        assert parse_query("merge~ NOT sort") == AndNot(
            Fuzzy("merge", 1), parse_query("sort")
        )
        assert parse_query("MeRgE~") == Fuzzy("merge", 1)  # lowercased

    def test_rejections(self):
        for q, fam in (
            ("merge~", "trigram"),        # gram families store grams
            ("中文~", "cjk_bigram"),
            ("merge~3", None),            # Lucene's distance cap
            ("merge~0", None),
            ("*mer~", None),              # no star+fuzzy combos
            ("don't~", None),             # term-level only
            ("~", None),
            ("a~~", None),                # malformed trailing tildes —
            ("merge~~", None),            # rejected, not guessed (r17)
            ("merge~1~2", None),
        ):
            with pytest.raises(ParseError):
                parse_query(q, tokenizer=fam)

    def test_quoted_tilde_stays_inert(self):
        # inside quotes the tokenizer strips `~` (same rule as `*`)
        ast = parse_query('"merge~ sort"')
        from sifts_spark.queryparser import Phrase

        assert ast == Phrase(("merge", "sort"))

    def test_latin_under_cjk_bigram_allowed(self):
        # cjk_bigram stores non-CJK tokens whole — fuzzy over them is
        # well-defined and granted (r16 ADVICE; the same tokens the
        # family's Suffix/Substring path serves)
        assert parse_query("merge~", tokenizer="cjk_bigram") == Fuzzy(
            "merge", 1
        )
        assert parse_query("merge~2", tokenizer="cjk_bigram") == Fuzzy(
            "merge", 2
        )
        # disjoint-alphabet guard: dist >= len(core) would match every
        # stored CJK gram (levenshtein(core, gram) = max(len, 2))
        assert parse_query("ab~", tokenizer="cjk_bigram") == Fuzzy("ab", 1)
        for q in ("ab~2", "a~"):
            with pytest.raises(ParseError):
                parse_query(q, tokenizer="cjk_bigram")
        # multi-token latin core under cjk: the single-token error, not
        # the gram-family one
        with pytest.raises(ParseError, match="single"):
            parse_query("don't~", tokenizer="cjk_bigram")
        # CJK cores stay rejected: their stored form IS grams
        for q in ("中文~", "中~", "中文字~2"):
            with pytest.raises(ParseError):
                parse_query(q, tokenizer="cjk_bigram")


class TestFuzzyServing:
    def test_postings_scan_duckdb_three_way(self, spark):
        import duckdb

        from sifts_spark.functions.text import tokenize_sql

        docs = _docs(spark)
        postings = S.build_postings(docs)
        con = duckdb.connect()
        con.register("docs_arrow", docs.toPandas())
        toks = tokenize_sql("content")
        for q in ("merge~", "merge~2", "merge~ fast", "merge~2 NOT sort"):
            ast = parse_query(q)
            via_index = {
                r["id"] for r in S.search_postings(postings, ast).collect()
            }
            via_scan = {
                r["id"]
                for r in S.match_filter(docs, ast, "content").collect()
            }
            via_duck = {
                r[0]
                for r in con.sql(
                    f"SELECT id FROM docs_arrow WHERE {ast.to_sql(toks)}"
                ).fetchall()
            }
            assert via_index == via_scan == via_duck, q

    def test_distance_semantics(self, spark):
        postings = S.build_postings(_docs(spark))
        got1 = {
            r["id"]
            for r in S.search_postings(postings, Fuzzy("merge", 1)).collect()
        }
        # merge(a), marge/merg(b), emerge(c: 1 insertion)
        assert got1 == {"a", "b", "c"}
        got2 = {
            r["id"]
            for r in S.search_postings(postings, Fuzzy("merge", 2)).collect()
        }
        assert got2 == {"a", "b", "c", "d"}  # mergers: distance 2

    def test_bm25_counts_every_matching_term(self, spark):
        # doc b holds TWO distance-1 neighbors (marge, merg) — its tf
        # for the fuzzy tag is 2; rank present and positive everywhere
        postings = S.build_postings(_docs(spark))
        rows = {
            r["id"]: r["rank"]
            for r in S.search_postings(postings, Fuzzy("merge", 1)).collect()
        }
        assert all(v > 0 for v in rows.values())

    def test_latin_fuzzy_serving_under_cjk_bigram(self, spark):
        # three-way equality on a MIXED latin/CJK corpus: the term
        # dictionary holds grams + whole latin tokens; the dist<len
        # guard keeps grams out of reach, so all engines agree
        import duckdb

        from sifts_spark.functions.text import tokenize_sql

        rows = [
            ("a", "merge 中文字 sort"),
            ("b", "marge の merg 検索"),      # two distance-1 neighbors
            ("c", "數據庫 mergers 引擎"),      # distance 2 only
            ("d", "中文 データベース"),         # no latin neighbor at all
        ]
        docs = spark.createDataFrame(rows, "id string, content string")
        postings = S.build_postings(docs, tokenizer="cjk_bigram")
        con = duckdb.connect()
        con.register("docs_arrow", docs.toPandas())
        toks = tokenize_sql("content", "cjk_bigram")
        for q, want in (("merge~", {"a", "b"}), ("merge~2", {"a", "b", "c"})):
            ast = parse_query(q, tokenizer="cjk_bigram")
            via_index = {
                r["id"] for r in S.search_postings(postings, ast).collect()
            }
            via_scan = {
                r["id"]
                for r in S.match_filter(
                    docs, ast, "content", tokenizer="cjk_bigram"
                ).collect()
            }
            via_duck = {
                r[0]
                for r in con.sql(
                    f"SELECT id FROM docs_arrow WHERE {ast.to_sql(toks)}"
                ).fetchall()
            }
            assert via_index == via_scan == via_duck == want, q

    def test_collection_e2e_with_highlight(self, spark, tmp_path):
        c = Collection(str(tmp_path / "w"), "d", spark=spark)
        c.add(ids=[i for i, _ in DOCS], contents=[t for _, t in DOCS])
        r = c.query("merge~", highlight=True)
        assert sorted(x["id"] for x in r["results"]) == ["a", "b", "c"]
        snips = {x["id"]: x["snippet"] for x in r["results"]}
        assert "[marge]" in snips["b"] and "[merg]" in snips["b"]
        # positional-layout phrase beside a fuzzy leaf: 3-valued eval
        # carries the fuzzy tag
        r = c.query('merge~ "sort runs"')
        assert [x["id"] for x in r["results"]] == ["a"]