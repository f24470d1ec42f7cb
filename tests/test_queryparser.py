"""Parser golden tests — mirrors /root/reference/tests/sifts/test_queryparser.py
(input → expression-tree instead of input → backend SQL string)."""

import pytest

from sifts_spark.queryparser import (
    And,
    Or,
    ParseError,
    Prefix,
    Term,
    parse_query,
)


def test_trim_whitespace():
    # ref test_queryparser.py:4-6
    assert parse_query(" Lorem\t") == Term("lorem")


def test_single_word():
    assert parse_query("Lorem") == Term("lorem")


def test_and_keyword_lower():
    # ref test_queryparser.py:9-11
    assert parse_query("Lorem and ipsum") == And(Term("lorem"), Term("ipsum"))


def test_and_keyword_upper():
    # ref test_queryparser.py:34-41 (case-insensitive keyword)
    assert parse_query("Lorem AND ipsum") == And(Term("lorem"), Term("ipsum"))


def test_or_keyword():
    # ref test_queryparser.py:14-16, 44-46
    assert parse_query("Lorem or ipsum") == Or(Term("lorem"), Term("ipsum"))
    assert parse_query("Lorem OR ipsum") == Or(Term("lorem"), Term("ipsum"))


def test_implicit_and():
    # ref test_sqlite.py:56-63 ("Lorem sit" → both must match)
    assert parse_query("Lorem sit") == And(Term("lorem"), Term("sit"))


def test_implicit_and_multiword():
    assert parse_query("a b c") == And(And(Term("a"), Term("b")), Term("c"))


def test_prefix_wildcard():
    # ref test_queryparser.py:19-26, 49-56
    assert parse_query("Lor*") == Prefix("lor")


def test_prefix_in_conjunction():
    assert parse_query("Lor* and ips*") == And(Prefix("lor"), Prefix("ips"))


def test_and_binds_tighter_than_or():
    # FTS5 / to_tsquery precedence
    assert parse_query("a or b and c") == Or(Term("a"), And(Term("b"), Term("c")))
    assert parse_query("a b or c") == Or(And(Term("a"), Term("b")), Term("c"))


def test_mixed_case_normalized():
    assert parse_query("LoReM") == Term("lorem")


def test_empty_query_rejected():
    with pytest.raises(ParseError):
        parse_query("   ")


def test_dangling_operator_rejected():
    with pytest.raises(ParseError):
        parse_query("Lorem and")
    with pytest.raises(ParseError):
        parse_query("or Lorem")


def test_punctuation_stripped_like_tokenizer():
    assert parse_query("Lorem,") == Term("lorem")


def test_punctuated_word_splits_like_tokenizer():
    """'don't' must compile to don AND t — the tokenizer splits content
    on punctuation, so a stripped 'dont' term could never match
    (VERDICT r1 'What's wrong' #5)."""
    from sifts_spark.queryparser import And, Prefix, Term, parse_query

    assert parse_query("don't") == And(Term("don"), Term("t"))
    assert parse_query("e-mail") == And(Term("e"), Term("mail"))
    assert parse_query("e-mail*") == And(Term("e"), Prefix("mail"))
    assert parse_query("a.b or c") is not None


def test_punctuated_word_matches_document(store_root, spark):
    from sifts_spark.collection import Collection

    col = Collection(store_root, "test", spark=spark)
    col.add(["I don't know", "plain words"], ids=["a", "b"])
    assert col.query("don't")["total"] == 1
    assert col.query("DON'T")["results"][0]["id"] == "a"


def test_unsearchable_word_rejected():
    import pytest

    from sifts_spark.queryparser import ParseError, parse_query

    with pytest.raises(ParseError):
        parse_query("!!!")


# ---- property tests (hypothesis): parser totality + oracle parity ----

try:
    from hypothesis import given, settings, strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

if HAVE_HYPOTHESIS:
    # arbitrary printable junk: parser must either return a tree or
    # raise ParseError — never crash with anything else
    @given(st.text(min_size=0, max_size=60))
    @settings(max_examples=200, deadline=None)
    def test_parser_total_on_arbitrary_text(q):
        try:
            node = parse_query(q)
        except ParseError:
            return
        assert node is not None

    _word = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8
    )

    @st.composite
    def _queries(draw):
        n = draw(st.integers(1, 5))
        parts = []
        for _ in range(n):
            w = draw(_word)
            if draw(st.booleans()):
                w += "*"
            parts.append(w)
            parts.append(draw(st.sampled_from([" ", " and ", " or "])))
        return "".join(parts[:-1])

    @given(_queries())
    @settings(max_examples=100, deadline=None)
    def test_wellformed_queries_compile_to_sql(q):
        """Every well-formed query yields a tree whose to_sql is
        DuckDB-parseable (the oracle path can always replay it)."""
        import duckdb

        node = parse_query(q)
        sql = node.to_sql("list_value('lorem', 'ipsum')")
        duckdb.sql(f"SELECT {sql}")  # raises on malformed SQL


# ---- quoted phrases (extension past the reference surface) ----


def test_phrase_parses():
    from sifts_spark.queryparser import Phrase

    assert parse_query('"lorem ipsum"') == Phrase(("lorem", "ipsum"))
    assert parse_query('"Lorem IPSUM dolor"') == Phrase(
        ("lorem", "ipsum", "dolor")
    )


def test_phrase_composes_with_operators():
    from sifts_spark.queryparser import Phrase

    assert parse_query('"lorem ipsum" or sit') == Or(
        Phrase(("lorem", "ipsum")), Term("sit")
    )
    assert parse_query('dolor "lorem ipsum"') == And(
        Term("dolor"), Phrase(("lorem", "ipsum"))
    )


def test_quoted_operator_is_a_term():
    assert parse_query('"and"') == Term("and")
    assert parse_query('lorem "or" ipsum') == And(
        And(Term("lorem"), Term("or")), Term("ipsum")
    )


def test_single_word_phrase_is_a_term():
    assert parse_query('"lorem"') == Term("lorem")


def test_phrase_tokenizer_split():
    from sifts_spark.queryparser import Phrase

    # punctuation splits inside phrases exactly like document text
    assert parse_query('"don\'t stop"') == Phrase(("don", "t", "stop"))


def test_phrase_edge_rejections():
    with pytest.raises(ParseError, match="unterminated"):
        parse_query('"lorem ipsum')
    with pytest.raises(ParseError, match="no searchable"):
        parse_query('""')
    with pytest.raises(ParseError, match="no searchable"):
        parse_query('"!!!"')


def test_phrase_sql_twin_matches_semantics():
    """to_sql replays phrase adjacency in DuckDB, including the
    shorter-than-phrase and scattered-words negatives."""
    import duckdb

    from sifts_spark.queryparser import Phrase

    node = Phrase(("a", "b", "c"))
    cases = [
        ("list_value('a','b','c')", True),
        ("list_value('x','a','b','c','y')", True),
        ("list_value('a','b','x','c')", False),   # scattered
        ("list_value('c','b','a')", False),       # wrong order
        ("list_value('a','b')", False),           # shorter than phrase
        ("CAST(list_value() AS VARCHAR[])", False),
    ]
    for expr, want in cases:
        got = duckdb.sql(
            f"SELECT {node.to_sql(expr)}"
        ).fetchone()[0]
        assert got == want, expr


def test_phrase_column_matches_documents(store_root, spark):
    """End-to-end through the Collection FTS path: postings candidates
    + adjacency verify return exactly the adjacent-run docs."""
    from sifts_spark.collection import Collection

    col = Collection(store_root, "ph", spark=spark)
    col.add(
        [
            "the quick brown fox jumps",        # adjacent run
            "quick the brown and fox",          # words present, scattered
            "brown fox quick",                  # wrong order
            "entirely unrelated text here",
            "leading words then quick brown fox trailing",  # adjacent, offset
        ],
        ids=["hit1", "scatter", "order", "none", "hit2"],
    )
    res = col.query('"quick brown fox"')
    assert {r["id"] for r in res["results"]} == {"hit1", "hit2"}
    # phrase composes with boolean operators through the same path
    res2 = col.query('"quick brown fox" or unrelated')
    assert {r["id"] for r in res2["results"]} == {"hit1", "hit2", "none"}
    # and the plain-boolean semantics are unchanged by the extension
    res3 = col.query("quick brown fox")
    assert {r["id"] for r in res3["results"]} == {
        "hit1", "scatter", "order", "hit2"
    }


# ---- binary NOT (extension past the reference surface) ----


def test_not_parses_binary():
    from sifts_spark.queryparser import AndNot, Phrase

    assert parse_query("lorem NOT ipsum") == AndNot(
        Term("lorem"), Term("ipsum")
    )
    assert parse_query("a b NOT c") == AndNot(
        And(Term("a"), Term("b")), Term("c")
    )
    assert parse_query("a NOT b or c") == Or(
        AndNot(Term("a"), Term("b")), Term("c")
    )
    assert parse_query('a NOT "b c"') == AndNot(
        Term("a"), Phrase(("b", "c"))
    )


def test_lowercase_not_is_a_term():
    assert parse_query("do not disturb") == And(
        And(Term("do"), Term("not")), Term("disturb")
    )
    assert parse_query("Not now") == And(Term("not"), Term("now"))


def test_pure_negative_rejected():
    with pytest.raises(ParseError, match="pure-negative|binary"):
        parse_query("NOT lorem")
    with pytest.raises(ParseError, match="pure-negative|binary"):
        parse_query("a or NOT b")


def test_not_sql_twin():
    import duckdb

    from sifts_spark.queryparser import AndNot

    node = AndNot(Term("a"), Term("b"))
    cases = [
        ("list_value('a','x')", True),
        ("list_value('a','b')", False),
        ("list_value('b')", False),
        ("CAST(NULL AS VARCHAR[])", None),  # no positive match either
    ]
    for expr, want in cases:
        got = duckdb.sql(f"SELECT {node.to_sql(expr)}").fetchone()[0]
        assert got == want, expr


def test_not_matches_documents(store_root, spark):
    """Through the Collection postings path: exclusion over the tag
    set, and the phrase-under-negation superset rule."""
    from sifts_spark.collection import Collection

    col = Collection(store_root, "neg", spark=spark)
    col.add(
        [
            "apples and oranges on the table",
            "apples only here",
            "oranges alone",
            "apples with sliced green oranges nearby",
        ],
        ids=["both", "a_only", "o_only", "both2"],
    )
    res = col.query("apples NOT oranges")
    assert {r["id"] for r in res["results"]} == {"a_only"}
    # negated PHRASE: docs with the words scattered still match
    res2 = col.query('apples NOT "oranges on"')
    assert {r["id"] for r in res2["results"]} == {"a_only", "both2"}
    # plain positive semantics unchanged
    res3 = col.query("apples")
    assert len(res3["results"]) == 3
    # excluded words NEVER boost rank: the surviving docs score exactly
    # as the positive-only query scores them (both2 contains the
    # scattered word "oranges" — without the polarity split it would
    # outrank a_only on the user's own excluded term)
    plain = {r["id"]: r["rank"] for r in res3["results"]}
    for r in res2["results"]:
        assert r["rank"] == plain[r["id"]], r["id"]
