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
TOKENIZER_CJK = "cjk_bigram"
TOKENIZER_TRIGRAM = "trigram"
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

# ---- "cjk_bigram" family (r14): unicode61-style tokenization leaves an
# unspaced CJK sentence as ONE token per run, so a two-character query
# word never matches inside a longer run — the same weakness FTS5 ships
# its `trigram` tokenizer to fix (the reference's unicode61/'simple'
# configs share it, core.py:460-462/555). This family splits exactly
# like "unicode", then expands each token that is a pure CJK run of ≥2
# chars into its character BIGRAMS (the classic CJK-IR unit — Lucene's
# CJKAnalyzer posture). Bigram positions are consecutive, so with the
# positional postings default a multi-bigram query verifies adjacency
# index-side, giving substring match semantics over CJK runs — up to
# the classic CJK-bigram over-match: a query run ALSO matches its
# exact gram chain split across adjacent written runs ("中文字"
# matches the doc "中文 文字" — gram positions are consecutive across
# token boundaries). Lucene's CJKAnalyzer phrase queries behave the
# same way; FTS5's trigram avoids it only by including the separator
# chars in its grams. Precision trade, pinned in tests.
#
# The run class is an EXPLICIT codepoint-range literal, not \p{script},
# so the Java (Spark), RE2 (DuckDB) and CPython engines agree on every
# code point regardless of each engine's Unicode table version: Han
# (unified U+4E00–9FFF, ext A U+3400–4DBF, compat U+F900–FAFF),
# Hiragana (U+3041–3096 + iteration marks U+309D–309F), Katakana
# (U+30A1–30FA, U+30FC–30FF incl. the script-Common prolonged sound
# mark ー, phonetic ext U+31F0–31FF), and the ideographic iteration
# marks 々 U+3005 / 〇 U+3007. Hangul is EXCLUDED by design: Korean is
# space-delimited, so whole words are the right unit (ES's CJK analyzer
# makes the same call). Supplementary-plane Han (ext B+) is excluded;
# a run containing one stays a whole token — degraded, never wrong.
CJK_RUN_CHARS = (
    "々〇"
    "ぁ-ゖゝ-ゟ"
    "ァ-ヺー-ヿㇰ-ㇿ"
    "㐀-䶿一-鿿豈-﫿"
)
#: anchored full-match: a pure CJK run of ≥2 chars (the bigram unit).
#: Literal codepoints → valid in Java, RE2 and Python `re` verbatim.
CJK_RUN_RE = f"^[{CJK_RUN_CHARS}]{{2,}}$"
#: alternation extracting a token's maximal CJK / non-CJK segments in
#: order (regexp_extract_all / re.findall full matches): real CJK text
#: embeds ASCII digits and latin INSIDE runs ("中文2024年",
#: "spark中文" — digits are \p{N}, so the unicode split keeps them in
#: one token); expanding per-SEGMENT instead of per-pure-token keeps
#: such text substring-searchable instead of silently whole-token.
CJK_SEGMENT_RE = f"[{CJK_RUN_CHARS}]+|[^{CJK_RUN_CHARS}]+"

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
    TOKENIZER_CJK: TOKEN_SPLIT_RE_UNICODE,  # split like unicode, then expand
    TOKENIZER_TRIGRAM: TOKEN_SPLIT_RE_UNICODE,  # ditto
}
_SPLIT_RES_PY = {
    TOKENIZER_ASCII: TOKEN_SPLIT_RE_ASCII_PY,
    TOKENIZER_UNICODE: TOKEN_SPLIT_RE_UNICODE_PY,
    TOKENIZER_CJK: TOKEN_SPLIT_RE_UNICODE_PY,
    TOKENIZER_TRIGRAM: TOKEN_SPLIT_RE_UNICODE_PY,
}
_MATCH_RES_PY = {
    TOKENIZER_ASCII: TOKEN_MATCH_RE_ASCII_PY,
    TOKENIZER_UNICODE: TOKEN_MATCH_RE_UNICODE_PY,
    TOKENIZER_CJK: TOKEN_MATCH_RE_UNICODE_PY,
    TOKENIZER_TRIGRAM: TOKEN_MATCH_RE_UNICODE_PY,
}


#: the families whose tokens are character n-grams, → gram width. The
#: single registry every consumer branches on (match_filter's
#: forced-once binding, snippets' run-granular highlighter): adding an
#: expanding family here wires all of them at once instead of leaving
#: a string-literal copy to drift (r14 review finding).
EXPANDING_FAMILIES = {TOKENIZER_CJK: 2, TOKENIZER_TRIGRAM: 3}


def gram_width(tokenizer: str | None = None) -> int | None:
    """The family's n-gram width, or None for word families."""
    return EXPANDING_FAMILIES.get(resolve_tokenizer(tokenizer))


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
    base = F.filter(
        F.split(F.lower(col), token_split_re(tokenizer)),
        lambda t: t != F.lit(""),
    )
    fam = resolve_tokenizer(tokenizer)
    if fam == TOKENIZER_CJK:
        base = _cjk_bigram_expand(base)
    elif fam == TOKENIZER_TRIGRAM:
        base = _trigram_expand(base)
    return base


def _cjk_bigram_expand(tokens: Column) -> Column:
    """tokens ARRAY<STRING> → the cjk_bigram expansion: each token is
    segmented into maximal CJK / non-CJK runs (CJK_SEGMENT_RE — mixed
    tokens like "中文2024年" segment instead of passing through
    opaque), then each CJK segment of ≥2 chars becomes its character
    bigrams IN ORDER, so positions stay consecutive for the positional
    phrase verify. Latin words, digit islands, and single CJK chars
    pass through whole. Codegen'd higher-order functions — no UDF,
    map-side only."""
    # contains-CJK gate: a token with no CJK char IS its only segment,
    # so the (comparatively pricey) regexp_extract_all runs only on
    # tokens that can actually segment — on a mostly-Latin corpus that
    # short-circuits ~99% of tokens (measured ~0.78s → ~0.6s on the
    # fts_cjk_substr sf0.1 scan)
    has_cjk = f"[{CJK_RUN_CHARS}]"
    segs = F.flatten(
        F.transform(
            tokens,
            lambda t: F.when(
                t.rlike(has_cjk),
                F.regexp_extract_all(t, F.lit(CJK_SEGMENT_RE), F.lit(0)),
            ).otherwise(F.array(t)),
        )
    )
    return F.flatten(
        F.transform(
            segs,
            lambda s: F.when(
                s.rlike(CJK_RUN_RE),
                F.transform(
                    F.sequence(F.lit(1), F.length(s) - 1),
                    lambda i: F.substring(s, i, 2),
                ),
            ).otherwise(F.array(s)),
        )
    )


def _trigram_expand(tokens: Column) -> Column:
    """tokens ARRAY<STRING> → the "trigram" family expansion: every
    token of ≥3 chars becomes its character trigrams IN ORDER (1-2 char
    tokens pass whole — nothing shorter can anchor inside a longer
    word). The universal-substring family (FTS5's ``trigram`` tokenizer
    posture, script-blind): a query word matches INSIDE any word of any
    script via consecutive-trigram phrases. Unlike FTS5's, trigrams
    never span token boundaries — the split runs first, so substring
    match is WITHIN-token ("ello" finds "hello"; "lo wo" cannot find
    "hello world") — the price of keeping one postings/query machinery
    across all families. Codegen'd HOFs, no UDF, map-side only."""
    return F.flatten(
        F.transform(
            tokens,
            lambda t: F.when(
                F.length(t) >= 3,
                F.transform(
                    F.sequence(F.lit(1), F.length(t) - 2),
                    lambda i: F.substring(t, i, 3),
                ),
            ).otherwise(F.array(t)),
        )
    )


def tokenize_sql(text_expr: str, tokenizer: str | None = None) -> str:
    """DuckDB SQL twin of :func:`tokenize`."""
    base = (
        f"list_filter(string_split_regex(lower({text_expr}),"
        f" '{token_split_re(tokenizer)}'), _t -> _t <> '')"
    )
    fam = resolve_tokenizer(tokenizer)
    if fam == TOKENIZER_TRIGRAM:
        return (
            f"flatten(list_transform({base}, _tk ->"
            f" CASE WHEN length(_tk) >= 3"
            f" THEN list_transform(generate_series(1, length(_tk) - 2),"
            f" _i -> substr(_tk, _i, 3))"
            f" ELSE [_tk] END))"
        )
    if fam != TOKENIZER_CJK:
        return base
    segs = (
        f"flatten(list_transform({base}, _tk ->"
        f" regexp_extract_all(_tk, '{CJK_SEGMENT_RE}')))"
    )
    return (
        f"flatten(list_transform({segs}, _sg ->"
        f" CASE WHEN regexp_matches(_sg, '{CJK_RUN_RE}')"
        f" THEN list_transform(generate_series(1, length(_sg) - 1),"
        f" _i -> substr(_sg, _i, 2))"
        f" ELSE [_sg] END))"
    )


def py_tokenize(text: str | None, tokenizer: str | None = None) -> list[str]:
    """Python twin of :func:`tokenize` — same family, same lowercasing,
    empties dropped. The canonical kernel for Arrow/driver-side code."""
    if resolve_tokenizer(tokenizer) in (TOKENIZER_CJK, TOKENIZER_TRIGRAM):
        return [t for g in py_tokenize_groups(text, tokenizer) for t in g]
    import re as _re

    if not text:
        return []
    return [
        t
        for t in _re.split(token_split_re_py(tokenizer), text.lower())
        if t
    ]


def py_tokenize_parts_groups(
    text: str | None, tokenizer: str | None = None
) -> list[tuple[str, list[str]]]:
    """:func:`py_tokenize_groups` plus provenance: ``[(part, group)]``
    where ``part`` is the written (lowercased) split part the group
    expanded from. The query parser stamps ``part`` as
    ``Phrase.source`` on synthesized gram-chain phrases so the opt-in
    ``exact_runs`` verify can substring-check the written word."""
    return [
        (p, g)
        for p, g in zip(
            _py_parts(text, tokenizer), py_tokenize_groups(text, tokenizer)
        )
    ]


def _py_parts(text: str | None, tokenizer: str | None = None) -> list[str]:
    import re as _re

    if not text:
        return []
    return [
        t for t in _re.split(token_split_re_py(tokenizer), text.lower()) if t
    ]


def py_tokenize_groups(
    text: str | None, tokenizer: str | None = None
) -> list[list[str]]:
    """Python tokenize preserving EXPANSION GROUPS: the outer list is
    the family's split parts in order; each inner list is the tokens
    one part expanded to. For ascii/unicode every group is a singleton;
    for cjk_bigram a CJK run's group is its bigrams IN ORDER. The query
    parser consumes the grouping — a multi-token group means "these
    came from one contiguous written run", so a query word compiles to
    a consecutive Phrase over the group rather than a bag-of-words AND
    (bigram conjunction alone would also match the run reversed).

    Documented edge: a 1-char CJK segment inside a larger query word
    ("2024年" → [2024, 年]) only matches docs where that char is a
    standalone segment too — segments never bigram ACROSS a boundary,
    so it cannot anchor to a doc's 年X bigram. Appending the next
    written char restores exact anchoring ("2024年の" → [2024, 年の])
    — the bigram-family analog of FTS5 trigram's 3-char minimum."""
    import re as _re

    if not text:
        return []
    fam = resolve_tokenizer(tokenizer)
    parts = [
        t for t in _re.split(token_split_re_py(tokenizer), text.lower()) if t
    ]
    if fam == TOKENIZER_TRIGRAM:
        return [
            (
                [p[i : i + 3] for i in range(len(p) - 2)]
                if len(p) >= 3
                else [p]
            )
            for p in parts
        ]
    if fam != TOKENIZER_CJK:
        return [[p] for p in parts]
    run = _re.compile(f"[{CJK_RUN_CHARS}]{{2,}}")
    seg_re = _re.compile(CJK_SEGMENT_RE)
    any_cjk = _re.compile(f"[{CJK_RUN_CHARS}]")
    out: list[list[str]] = []
    for p in parts:
        if not any_cjk.search(p):  # same gate as the Spark expression
            out.append([p])
            continue
        group: list[str] = []
        for s in seg_re.findall(p):
            if run.fullmatch(s):
                group.extend(s[i : i + 2] for i in range(len(s) - 1))
            else:
                group.append(s)
        out.append(group)
    return out


def prefix_degrades(token: str, tokenizer: str | None = None) -> bool:
    """True when an exact ``Term`` over this single-token query leaf
    could never hit the family's EXPANDED index — the parser compiles
    such leaves to ``Prefix`` instead (documented partial recall):
    cjk_bigram's lone CJK char (runs ≥2 store no single-char tokens),
    and trigram's 1-2 char tokens (words ≥3 store only trigrams —
    FTS5's trigram tokenizer hard-rejects sub-length queries, we
    degrade instead)."""
    fam = resolve_tokenizer(tokenizer)
    if fam == TOKENIZER_CJK:
        return is_cjk_char(token)
    if fam == TOKENIZER_TRIGRAM:
        return len(token) < 3
    return False


def prefix_tail_needed(token: str, tokenizer: str | None = None) -> bool:
    """For a query word with a trailing ``*`` whose expansion group is
    multi-token: does the ``*`` still carry information when ``token``
    is the group's LAST element? A tail that IS a complete n-gram of
    the family means the star is implied (any longer written word
    still contains the query's gram chain — substring semantics); a
    NON-expanded tail (the latin/digit segment of a mixed word under
    cjk_bigram, e.g. "中文spark*") would otherwise compile to an exact
    Term and silently drop the prefix intent (r14 review finding #4)."""
    fam = resolve_tokenizer(tokenizer)
    if fam == TOKENIZER_CJK:
        import re as _re

        return not _re.fullmatch(f"[{CJK_RUN_CHARS}]{{2}}", token)
    if fam == TOKENIZER_TRIGRAM:
        return len(token) != 3
    return True  # non-expanding families: groups are singletons


def is_cjk_char(token: str) -> bool:
    """True for a single code point in the cjk_bigram run class — the
    query parser compiles such a lone query term to a Prefix match
    (a bigrammed index stores no single-char tokens for runs ≥2, so an
    exact Term would silently never match; prefix-over-bigrams finds
    the char at every non-final run position plus standalone
    occurrences — FTS5's trigram tokenizer hard-rejects sub-length
    queries, we degrade to documented partial recall instead)."""
    import re as _re

    return bool(_re.fullmatch(f"[{CJK_RUN_CHARS}]", token))


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
