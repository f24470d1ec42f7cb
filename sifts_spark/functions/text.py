"""Text primitives: tokenizer, shingles, n-grams — JVM-side only.

Tokenizer parity target (/root/reference/src/sifts/core.py:555,655 —
``to_tsvector('simple', content)``, and FTS5's default unicode61 tokenizer,
core.py:460-462): lowercase whole words, split on non-alphanumerics,
NO stemming, NO stopword removal.

Everything here is built from ``pyspark.sql.functions`` higher-order
functions so the expressions stay inside whole-stage codegen — no Python
UDFs in the hot tokenize path. Each Spark expression has a ``*_sql`` twin
producing the equivalent DuckDB SQL for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Split pattern shared by Spark and the oracle. [^a-z0-9]+ after lower():
# 'simple'-config parity — punctuation and whitespace both delimit.
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokenize(text: Column | str) -> Column:
    """content STRING → tokens ARRAY<STRING> (lowercased, no empties)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.split(F.lower(col), TOKEN_SPLIT_RE),
        lambda t: t != F.lit(""),
    )


def tokenize_sql(text_expr: str) -> str:
    """DuckDB SQL twin of :func:`tokenize`."""
    return (
        f"list_filter(string_split_regex(lower({text_expr}), '{TOKEN_SPLIT_RE}'),"
        " _t -> _t <> '')"
    )


# ---- unicode tokenizer (OPT-IN groundwork, r13 — see SURVEY §7
# "Known limitation") -------------------------------------------------
#
# The ASCII family above is Latin-script-only; the reference's FTS5
# unicode61 / PG to_tsvector are unicode-aware. Flipping the default
# must land in ONE round across all three engines, so these twins
# exist FIRST, equivalence-tested (tests/test_unicode_tokenize.py):
# over the 53-language corpus + ASCII punctuation the three engines
# tokenize byte-identically; the two known case-mapping divergences
# (Turkish dotted İ, Greek capital final-sigma position — DuckDB's
# utf8proc lower() differs from the JVM's and CPython's) are pinned
# as documented edges the flip must either normalize away or declare
# out of the supported alphabet. NOTHING routes through these yet.

# Java regex (Spark), RE2 (DuckDB): letters + numbers of any script.
TOKEN_SPLIT_RE_UNICODE = r"[^\p{L}\p{N}]+"
# Python stdlib re has no \p{L}: [\W_]+ splits on non-word + underscore,
# and Python's \w is the unicode alphanumeric set + underscore — the
# [\W_] complement equals \p{L}\p{N} on every code point the
# equivalence test covers (combining marks are excluded by all three).
TOKEN_SPLIT_RE_UNICODE_PY = r"[\W_]+"


def tokenize_unicode(text: Column | str) -> Column:
    """content STRING → tokens ARRAY<STRING>, any script (opt-in)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.split(F.lower(col), TOKEN_SPLIT_RE_UNICODE),
        lambda t: t != F.lit(""),
    )


def tokenize_unicode_sql(text_expr: str) -> str:
    """DuckDB SQL twin of :func:`tokenize_unicode`."""
    return (
        "list_filter(string_split_regex(lower("
        f"{text_expr}), '{TOKEN_SPLIT_RE_UNICODE}'), _t -> _t <> '')"
    )


def shingles(tokens: Column, n: int = 3) -> Column:
    """tokens ARRAY<STRING> → word n-gram shingles ARRAY<STRING>.

    A document with 1..n-1 tokens yields its whole token string as the
    single shingle (so every TOKENIZABLE doc has ≥1 shingle — required
    by MinHash, mirroring the convention in classic near-dup pipelines).
    A document with ZERO tokens yields NO shingles (changed r13): the
    ``[^a-z0-9]+`` tokenizer extracts nothing from non-Latin-script or
    punctuation-only content, and the old single-``""``-shingle
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
