"""Text primitives: tokenizer, shingles, n-grams — JVM-side only.

Tokenizer parity target (/root/reference/src/sifts/core.py:555,655 —
``to_tsvector('simple', content)``, and FTS5's default unicode61 tokenizer,
core.py:460-462): lowercase whole words, split on non-alphanumerics,
NO stemming, NO stopword removal. Both reference tokenizers are
UNICODE-AWARE — ``unicode61`` classifies by Unicode category, and PG's
``simple`` config tokenizes any script — so since r14 the DEFAULT family
here is the ``\\p{L}\\p{N}`` class (any script), not ``[a-z0-9]``.

The ASCII family is retained under ``*_ASCII`` names: collections whose
postings sidecars were built pre-flip carry a sticky ``_tokenizer``
marker resolution of ``"ascii"`` (sources/store.py) so query-side
tokenization always matches the index that was actually built.

Three engines must tokenize IDENTICALLY (Spark=Java regex + JVM
``lower``, DuckDB oracle=RE2 + utf8proc ``lower``, Python kernels=stdlib
``re`` + ``str.lower``); tests/test_unicode_tokenize.py pins the
equivalence over a 53-language corpus and documents the two known
case-mapping edges (Turkish dotted İ, Greek capital final sigma) where
utf8proc's ``lower`` diverges from the JVM/CPython — those code points
are declared outside the supported alphabet rather than normalized
(normalizing would put a per-row NFKC pass in the hot tokenize path).

Everything here is built from ``pyspark.sql.functions`` higher-order
functions so the expressions stay inside whole-stage codegen — no Python
UDFs in the hot tokenize path. Each Spark expression has a ``*_sql``
twin producing the equivalent DuckDB SQL for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---- tokenizer families ---------------------------------------------
#
# SPLIT form (delimiter class) and MATCH form (token class) per family.
# Java regex (Spark) and RE2 (DuckDB) share the \p{L}\p{N} syntax; the
# Python stdlib `re` has no \p{..}, so each family carries a `_PY` twin:
# Python's unicode \w is exactly L* ∪ N* ∪ {_}, hence [\W_] ≡ [^\p{L}\p{N}]
# and [^\W_] ≡ [\p{L}\p{N}] on every code point (combining marks Mn are
# in none of them) — pinned by tests/test_unicode_tokenize.py.

TOKENIZER_ASCII = "ascii"
TOKENIZER_UNICODE = "unicode"
#: the family new collections and free-standing operators use
DEFAULT_TOKENIZER = TOKENIZER_UNICODE

TOKEN_SPLIT_RE_ASCII = "[^a-z0-9]+"
TOKEN_SPLIT_RE_ASCII_PY = "[^a-z0-9]+"
TOKEN_MATCH_RE_ASCII = "[a-z0-9]+"
TOKEN_MATCH_RE_ASCII_PY = "[a-z0-9]+"

TOKEN_SPLIT_RE_UNICODE = r"[^\p{L}\p{N}]+"
TOKEN_SPLIT_RE_UNICODE_PY = r"[\W_]+"
TOKEN_MATCH_RE_UNICODE = r"[\p{L}\p{N}]+"
TOKEN_MATCH_RE_UNICODE_PY = r"[^\W_]+"

# The default-family aliases most call sites import. TOKEN_SPLIT_RE /
# TOKEN_MATCH_RE are Java/RE2 syntax — NOT valid in Python `re`; Python
# kernels must use the `_PY` twins.
TOKEN_SPLIT_RE = TOKEN_SPLIT_RE_UNICODE
TOKEN_SPLIT_RE_PY = TOKEN_SPLIT_RE_UNICODE_PY
TOKEN_MATCH_RE = TOKEN_MATCH_RE_UNICODE
TOKEN_MATCH_RE_PY = TOKEN_MATCH_RE_UNICODE_PY

_SPLIT_RES = {
    TOKENIZER_ASCII: TOKEN_SPLIT_RE_ASCII,
    TOKENIZER_UNICODE: TOKEN_SPLIT_RE_UNICODE,
}
_SPLIT_RES_PY = {
    TOKENIZER_ASCII: TOKEN_SPLIT_RE_ASCII_PY,
    TOKENIZER_UNICODE: TOKEN_SPLIT_RE_UNICODE_PY,
}
_MATCH_RES_PY = {
    TOKENIZER_ASCII: TOKEN_MATCH_RE_ASCII_PY,
    TOKENIZER_UNICODE: TOKEN_MATCH_RE_UNICODE_PY,
}


def resolve_tokenizer(tokenizer: str | None) -> str:
    """None → the default family; validates the name (a typo'd
    tokenizer silently matching nothing is the failure mode the
    ``_tokenizer`` store marker exists to prevent — fail loud here)."""
    t = DEFAULT_TOKENIZER if tokenizer is None else tokenizer
    if t not in _SPLIT_RES:
        raise ValueError(
            f"unknown tokenizer {t!r} (expected one of {sorted(_SPLIT_RES)})"
        )
    return t


def token_split_re(tokenizer: str | None = None) -> str:
    """The family's split regex in Java/RE2 syntax (Spark + DuckDB)."""
    return _SPLIT_RES[resolve_tokenizer(tokenizer)]


def token_split_re_py(tokenizer: str | None = None) -> str:
    """The family's split regex in Python ``re`` syntax."""
    return _SPLIT_RES_PY[resolve_tokenizer(tokenizer)]


def token_match_re_py(tokenizer: str | None = None) -> str:
    """The family's token-extraction regex in Python ``re`` syntax."""
    return _MATCH_RES_PY[resolve_tokenizer(tokenizer)]


def tokenize(text: Column | str, tokenizer: str | None = None) -> Column:
    """content STRING → tokens ARRAY<STRING> (lowercased, no empties).

    ``tokenizer`` selects the family (default ``"unicode"``); index-
    coupled callers pass the collection's ``_tokenizer`` marker value so
    query-side tokenization matches the persisted postings."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.split(F.lower(col), token_split_re(tokenizer)),
        lambda t: t != F.lit(""),
    )


def tokenize_sql(text_expr: str, tokenizer: str | None = None) -> str:
    """DuckDB SQL twin of :func:`tokenize`."""
    return (
        f"list_filter(string_split_regex(lower({text_expr}),"
        f" '{token_split_re(tokenizer)}'), _t -> _t <> '')"
    )


def py_tokenize(text: str | None, tokenizer: str | None = None) -> list[str]:
    """Python twin of :func:`tokenize` — same family, same lowercasing,
    empties dropped. The canonical kernel for Arrow/driver-side code."""
    import re as _re

    if not text:
        return []
    return [
        t
        for t in _re.split(token_split_re_py(tokenizer), text.lower())
        if t
    ]


# Back-compat aliases for the r13 opt-in twins (now the default family).
def tokenize_unicode(text: Column | str) -> Column:
    """content STRING → tokens ARRAY<STRING>, any script (alias of the
    default :func:`tokenize` since the r14 flip)."""
    return tokenize(text, TOKENIZER_UNICODE)


def tokenize_unicode_sql(text_expr: str) -> str:
    """DuckDB SQL twin of :func:`tokenize_unicode`."""
    return tokenize_sql(text_expr, TOKENIZER_UNICODE)


def shingles(tokens: Column, n: int = 3) -> Column:
    """tokens ARRAY<STRING> → word n-gram shingles ARRAY<STRING>.

    A document with 1..n-1 tokens yields its whole token string as the
    single shingle (so every TOKENIZABLE doc has ≥1 shingle — required
    by MinHash, mirroring the convention in classic near-dup pipelines).
    A document with ZERO tokens yields NO shingles (changed r13): the
    tokenizer extracts nothing from punctuation-only content (pre-r14,
    also from any non-Latin script), and the old single-``""``-shingle
    fallback gave every such doc an IDENTICAL shingle set — Jaccard 1.0
    between, say, any two Russian documents, which near-dup dedup then
    collapsed to one survivor per corpus (observed: a 3-language
    curation run silently deduplicating two entire languages down to
    one doc each). "Nothing extracted" must mean "cannot participate
    in token-shingle dedup", never "identical"."""
    empty = F.array().cast("array<string>")
    joined_all = F.array(F.array_join(tokens, " "))
    grams = F.transform(
        F.sequence(F.lit(0), F.size(tokens) - n),
        lambda i: F.array_join(F.slice(tokens, i + 1, n), " "),
    )
    return (
        F.when(F.size(tokens) >= n, grams)
        .when(F.size(tokens) > 0, joined_all)
        .otherwise(empty)
    )


def shingles_sql(tokens_expr: str, n: int = 3) -> str:
    """DuckDB SQL twin of :func:`shingles` (1-based inclusive list
    slices; same zero-token → zero-shingles convention)."""
    t = tokens_expr
    grams = (
        f"list_transform(generate_series(1, len({t}) - {n} + 1),"
        f" _i -> array_to_string({t}[_i:_i+{n - 1}], ' '))"
    )
    return (
        f"CASE WHEN len({t}) >= {n} THEN {grams}"
        f" WHEN len({t}) > 0 THEN [array_to_string({t}, ' ')]"
        f" ELSE CAST([] AS VARCHAR[]) END"
    )


def char_ngrams(text: Column | str, n: int = 5) -> Column:
    """content STRING → character n-grams ARRAY<STRING> over the
    whitespace-normalized lowercased text (classic near-dup shingling)."""
    col = F.col(text) if isinstance(text, str) else text
    norm = F.regexp_replace(F.lower(col), r"\s+", " ")
    return F.when(
        F.length(norm) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(norm) - n + 1),
            lambda i: F.substring(norm, i, n),
        ),
    ).otherwise(F.array(norm))


def char_ngrams_sql(text_expr: str, n: int = 5) -> str:
    norm = f"regexp_replace(lower({text_expr}), '\\s+', ' ', 'g')"
    grams = (
        f"list_transform(generate_series(1, length({norm}) - {n} + 1),"
        f" _i -> {norm}[_i:_i+{n - 1}])"
    )
    return (
        f"CASE WHEN length({norm}) >= {n} THEN {grams} ELSE [{norm}] END"
    )
