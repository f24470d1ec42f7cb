"""Unicode tokenizer equivalence suite (groundwork r13, DEFAULT since
the r14 flip).

`tokenize`'s default family is now the `\\p{L}\\p{N}` class; the flip
is only safe because Spark (Java regex + JVM lower), DuckDB (RE2 +
utf8proc lower) and the Python kernels (stdlib re + str.lower)
tokenize IDENTICALLY on the corpora the oracle gate runs over — this
module pins that over the 53-language corpus plus ASCII punctuation,
pins the two KNOWN case-mapping divergences as documented edges
(Turkish dotted İ, Greek capital final sigma — declared OUT of the
supported alphabet), and pins that the default family IS unicode so
an accidental revert fails loudly.
"""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from sifts_spark.functions.text import (
    TOKEN_SPLIT_RE_UNICODE,
    TOKEN_SPLIT_RE_UNICODE_PY,
    tokenize_unicode,
    tokenize_unicode_sql,
)

_PY = re.compile(TOKEN_SPLIT_RE_UNICODE_PY, re.UNICODE)


def _py_tokens(t: str) -> list[str]:
    return [x for x in _PY.split(t.lower()) if x]


def _spark_tokens(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    rows = df.select("i", tokenize_unicode(F.col("t")).alias("toks")).collect()
    return {r["i"]: r["toks"] for r in rows}


def _duck_tokens(texts):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, txt VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(enumerate(texts))
    )
    sql = f"SELECT i, {tokenize_unicode_sql('txt')} FROM t ORDER BY i"
    return {i: toks for i, toks in con.sql(sql).fetchall()}


def test_three_engine_equivalence_on_supported_alphabet(spark):
    from tools.langid50 import corpus_rows

    texts = [t for _, t, _ in corpus_rows(n_per_lang=6)] + [
        "Hello, WORLD! café Ünïcode 123",
        "under_score splits? maybe_not",
        "ｆｕｌｌｗｉｄｔｈ１２３ chars",
        "ß sharp s survives lowering",
        "tabs\tand\nnewlines   spaces",
        "mixed Русский and ENGLISH and 中文 one line",
        "emoji 😀 and — em-dashes – both delimit",
    ]
    sp = _spark_tokens(spark, texts)
    dk = _duck_tokens(texts)
    py = {i: _py_tokens(t) for i, t in enumerate(texts)}
    mismatches = [
        (texts[i], sp[i], dk[i], py[i])
        for i in range(len(texts))
        if not (sp[i] == dk[i] == py[i])
    ]
    assert not mismatches, mismatches[:3]
    # and it actually tokenizes the scripts the ASCII family cannot
    assert _py_tokens("и в не на") == ["и", "в", "не", "на"]
    assert sp[len(texts) - 2][1] == "русский"


def test_known_case_mapping_divergences_documented(spark):
    """The two edges the next-round flip must normalize away or declare
    out of the supported alphabet. If an engine upgrade makes these
    CONVERGE, this test fails so the docs get updated — that is the
    point."""
    texts = ["İstanbul KELVİN", "ΣΊΣΥΦΟΣ ς"]
    sp = _spark_tokens(spark, texts)
    dk = _duck_tokens(texts)
    py = {i: _py_tokens(t) for i, t in enumerate(texts)}
    # JVM and CPython agree with each other on both edges...
    assert sp[0] == py[0] and sp[1] == py[1]
    # ...Turkish dotted İ: JVM/CPython lower to i + combining dot
    # (U+0307, a mark → splits); DuckDB's utf8proc folds it away
    assert sp[0] != dk[0]
    # ...Greek capital sigma: JVM/CPython apply the contextual final
    # form (…ος), utf8proc maps Σ→σ position-blind (…οσ)
    assert sp[1][0].endswith("ος") and dk[1][0].endswith("οσ")


def test_default_family_is_unicode(spark):
    """The r14 flip pin: bare `tokenize`/`tokenize_sql`/`py_tokenize`
    (no tokenizer arg) ARE the unicode family, and the whole query
    path round-trips a non-Latin term."""
    from sifts_spark.functions.text import (
        DEFAULT_TOKENIZER,
        TOKEN_SPLIT_RE,
        TOKEN_SPLIT_RE_UNICODE,
        py_tokenize,
        tokenize,
        tokenize_sql,
    )
    from sifts_spark.operators.search import match_filter
    from sifts_spark.queryparser import parse_query

    assert DEFAULT_TOKENIZER == "unicode"
    assert TOKEN_SPLIT_RE == TOKEN_SPLIT_RE_UNICODE
    assert py_tokenize("Привет, 中文!") == ["привет", "中文"]
    con = duckdb.connect()
    assert con.sql(
        f"SELECT {tokenize_sql('?')}", params=["Привет, 中文!"]
    ).fetchone()[0] == ["привет", "中文"]
    df = spark.createDataFrame(
        [(1, "Привет мир"), (2, "hello world"), (3, "中文文档 例子")],
        "id long, content string",
    )
    got = df.select("id", tokenize(F.col("content")).alias("t")).collect()
    assert {r["id"]: r["t"] for r in got} == {
        1: ["привет", "мир"], 2: ["hello", "world"], 3: ["中文文档", "例子"],
    }
    hits = match_filter(df, parse_query("привет OR 例子")).collect()
    assert sorted(r["id"] for r in hits) == [1, 3]


@pytest.mark.parametrize(
    "text", ["", "   ", "!!! ---", None],
    ids=["empty", "spaces", "punct", "null"],
)
def test_degenerate_inputs(spark, text):
    df = spark.createDataFrame([(0, text)], "i long, t string")
    toks = df.select(tokenize_unicode(F.col("t")).alias("x")).first()["x"]
    assert toks in ([], None)
    if text is not None:
        assert _py_tokens(text) == []
