"""Result highlighting: FTS5-``snippet()``-style extracts.

Given a page of search hits and the parsed query AST, produce a short
window of each document around the densest cluster of matched tokens,
with the matches marked — what a search UI renders under each result.
The reference exposes no snippet API (its FTS5 backend has one, its PG
backend's would differ — ``ts_headline`` — so it defines none); this is
a defined extension with one engine-independent semantics.

Deliberately DRIVER-SIDE: snippets decorate a ``limit``-sized page (the
``mmr_select`` precedent — k-sized work stays out of the cluster), so
the cost is O(page x doc length), never corpus-anything. The bulk path
(``query_df``) is unaffected.
"""

from __future__ import annotations

import re

from sifts_spark.queryparser import And, AndNot, Node, Or, Phrase, Prefix, Term

from sifts_spark.functions.text import CJK_RUN_CHARS, token_match_re_py

_TOKEN_RE = re.compile(token_match_re_py())  # default family
_HAS_CJK_RE = re.compile(f"[{CJK_RUN_CHARS}]")


def _reconstruct_cjk_chains(words: tuple, n: int = 2, require_cjk: bool = True) -> list:
    """Collapse a phrase's consecutive OVERLAPPING n-grams back to the
    written run: bigrams ('中文','文字','spark') → ['中文字', 'spark'];
    trigrams ('hel','ell','llo') → ['hello']. Two adjacent words chain
    when the second is an n-gram overlapping the first by n-1 chars —
    exactly how the expanding families produced them, so the
    reconstruction is lossless for chains the tokenizer emitted
    (``require_cjk`` keeps the bigram family from chaining accidental
    2-char latin neighbours; the trigram family chains any script, and
    an accidental cross-word overlap merely widens a highlight)."""
    segs: list = []
    cur = words[0]
    for w in words[1:]:
        if (
            len(w) == n
            and cur[-(n - 1) :] == w[: n - 1]
            and (not require_cjk or (_HAS_CJK_RE.search(w) and _HAS_CJK_RE.search(cur[-1])))
        ):
            cur += w[n - 1]
        else:
            segs.append(cur)
            cur = w
    segs.append(cur)
    return segs


def _lev_le(a: str, b: str, cap: int) -> bool:
    """Banded Levenshtein ``distance(a, b) <= cap`` — the snippet
    marker's twin of the engines' ``levenshtein`` (classic, no
    transposition), with the standard row-minimum early exit."""
    if abs(len(a) - len(b)) > cap:
        return False
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        row_min = i
        for j, cb in enumerate(b, 1):
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            cur.append(v)
            row_min = min(row_min, v)
        if row_min > cap:
            return False
        prev = cur
    return prev[-1] <= cap


def positive_leaves(ast: Node) -> tuple[set, set, list, set]:
    """(terms, prefixes, phrases, scans) occurring in POSITIVE
    positions — the right side of ``AndNot`` is excluded (a term the
    user excluded must never be highlighted as a match). ``scans``
    holds the scan-only leaves of ``substring_scan`` queries as
    ``("suffix" | "contains", needle)`` pairs."""
    from sifts_spark.queryparser import Fuzzy, Substring, Suffix

    terms: set = set()
    prefixes: set = set()
    phrases: list = []
    scans: set = set()

    def walk(node: Node) -> None:
        if isinstance(node, Term):
            terms.add(node.word)
        elif isinstance(node, Prefix):
            prefixes.add(node.prefix)
        elif isinstance(node, Suffix):
            scans.add(("suffix", node.suffix))
        elif isinstance(node, Substring):
            scans.add(("contains", node.sub))
        elif isinstance(node, Fuzzy):
            scans.add(("fuzzy", (node.word, node.dist)))
        elif isinstance(node, Phrase):
            phrases.append(tuple(node.words))
        elif isinstance(node, (And, Or)):
            walk(node.left)
            walk(node.right)
        elif isinstance(node, AndNot):
            walk(node.left)  # never node.right
        else:  # pragma: no cover - parser produces no other nodes
            raise TypeError(f"unknown AST node {node!r}")

    walk(ast)
    return terms, prefixes, phrases, scans


def make_snippet(
    text: str | None,
    ast: Node,
    window: int = 16,
    mark: tuple = ("[", "]"),
    ellipsis: str = "…",
    tokenizer: str | None = None,
) -> str:
    """The ``window``-token extract of ``text`` containing the MOST
    positive-match tokens (earliest window on ties), matched tokens
    wrapped in ``mark``, clipped edges flagged with ``ellipsis``.
    Tokenization mirrors the index (the ``tokenizer`` family's
    lowercase token runs — pass the collection's ``_tokenizer`` marker
    so highlights agree with matches), and marks wrap the ORIGINAL
    text spans, so casing/punctuation render as written. Phrase
    matches highlight only true consecutive runs. Matchless or empty
    text returns its plain leading window."""
    if not text:
        return ""
    tok_re = (
        _TOKEN_RE if tokenizer is None else re.compile(token_match_re_py(tokenizer))
    )
    spans = [
        (m.group(), m.start(), m.end())
        for m in tok_re.finditer(text.lower())
    ]
    if not spans:
        return text
    terms, prefixes, phrases, scans = positive_leaves(ast)
    matched: set = set()

    def _scan_hit(tok: str) -> bool:
        for kind, nd in scans:
            if kind == "suffix":
                if tok.endswith(nd):
                    return True
            elif kind == "fuzzy":
                if _lev_le(tok, nd[0], nd[1]):
                    return True
            elif nd in tok:  # contains
                return True
        return False
    from sifts_spark.functions.text import TOKENIZER_CJK, gram_width

    n_gram = gram_width(tokenizer)
    if n_gram:
        # Run-granular highlighting for the EXPANDING families: the
        # AST's leaves are n-grams whose content spans OVERLAP by n-1
        # chars — wrapping each would duplicate text. Spans here are
        # whole unicode runs (the match regex is the unicode family's);
        # a run is marked when it CONTAINS a positive needle: an n-gram
        # term as a substring, a phrase's overlapping chain
        # reconstructed back to the written string, or an in-word
        # prefix (the sub-length query degradation) at any position.
        # Word-granular remnants mark word-level (cross-run adjacency
        # is not re-verified here — the MATCH already verified it; a
        # snippet is a decoration).
        cjk = tokenizer == TOKENIZER_CJK
        n = n_gram
        sub_ok = _HAS_CJK_RE.search if cjk else (lambda s: True)
        needles = {t for t in terms if sub_ok(t)}
        plain_words: set = set()
        for words in phrases:
            for seg in _reconstruct_cjk_chains(words, n, require_cjk=cjk):
                if sub_ok(seg):
                    needles.add(seg)
                else:
                    plain_words.add(seg)
        sub_prefixes = {p for p in prefixes if sub_ok(p)}

        def _pref_hit(tok: str) -> bool:
            """In-word prefix marking, index-faithful: under trigram a
            prefix only matches where a STORED gram starts with it, so
            it must sit at a position with ≥ n chars remaining —
            plain containment would mark 'sushi' for query 'hi*'
            (the 'hi' sits in the final two chars; no trigram starts
            with it — r14 advice #3). cjk keeps containment: its
            sub-length Prefix is a single run char, and mixed-run
            latin prefixes are checked separately below."""
            if cjk:
                return any(p in tok for p in sub_prefixes)
            return any(
                0 <= tok.find(p) <= len(tok) - n for p in sub_prefixes
            )

        for i, (tok, _, _) in enumerate(spans):
            # a MIXED run (contains CJK) holds its latin terms AND
            # prefixes as segments, not whole tokens ("Spark中文入門"
            # matched Term('spark'); "中文spark…" matches
            # Prefix('spark')) — substring-check both against such runs
            # so matched docs never render unmarked; pure-latin spans
            # keep exact equality (r14 review findings #6 + follow-up)
            mixed = cjk and _HAS_CJK_RE.search(tok)
            if (
                tok in terms
                or tok in plain_words
                or any(tok.startswith(p) for p in prefixes)
                or any(nd in tok for nd in needles)
                or _pref_hit(tok)
                or _scan_hit(tok)
                or (
                    mixed
                    and (
                        any(t in tok for t in terms)
                        or any(p in tok for p in prefixes)
                    )
                )
            ):
                matched.add(i)
    else:
        # per-leaf-kind short-circuits (r16 snippet_bulk audit): the
        # bulk path runs this kernel over EVERY corpus row, most of
        # which match nothing — empty leaf kinds must not pay a
        # per-token Python genexp, and a phrase whose words aren't all
        # present must not pay the O(tokens × len) window walk
        if terms and not prefixes and not scans:
            matched.update(i for i, s in enumerate(spans) if s[0] in terms)
        elif terms or prefixes or scans:
            for i, (tok, _, _) in enumerate(spans):
                if (
                    tok in terms
                    or any(tok.startswith(p) for p in prefixes)
                    or _scan_hit(tok)
                ):
                    matched.add(i)
        if phrases:
            token_set = {s[0] for s in spans}
            for words in phrases:
                if not all(w in token_set for w in words):
                    continue
                n = len(words)
                for i in range(len(spans) - n + 1):
                    if all(spans[i + j][0] == words[j] for j in range(n)):
                        matched.update(range(i, i + n))

    if matched:
        flags = [1 if i in matched else 0 for i in range(len(spans))]
        pre = [0]
        for f in flags:
            pre.append(pre[-1] + f)
        best_start, best_count = 0, -1
        for start in range(0, max(len(spans) - window, 0) + 1):
            stop = min(start + window, len(spans))
            c = pre[stop] - pre[start]
            if c > best_count:
                best_start, best_count = start, c
    else:
        # matchless rows keep the plain leading window — identical
        # output to the scan above (all window counts zero → earliest
        # wins), without paying it (the bulk path's common row)
        best_start = 0
    stop = min(best_start + window, len(spans))
    lo = spans[best_start][1]
    hi = spans[stop - 1][2]

    out = []
    cur = lo
    for i in range(best_start, stop):
        _, s, e = spans[i]
        out.append(text[cur:s])
        if i in matched:
            out.append(mark[0] + text[s:e] + mark[1])
        else:
            out.append(text[s:e])
        cur = e
    snippet = "".join(out)
    if lo > 0:
        snippet = ellipsis + snippet
    if hi < len(text):
        snippet = snippet + ellipsis
    return snippet


def snippet_column(
    ast: Node,
    content_col,
    window: int = 16,
    mark: tuple = ("[", "]"),
    ellipsis: str = "…",
    tokenizer: str | None = None,
):
    """:func:`make_snippet` as a distributed column — ONE Arrow pass
    with the AST closure-shipped, for the bulk path
    (``query_df(highlight=True)``: building a search-results DATASET
    rather than reading a page). Same kernel as the driver-side page
    decoration, so the two paths can never disagree."""
    # pandas imported HERE, not at module top: the driver-side page
    # path (query(highlight=True) -> make_snippet) must not require
    # pandas (an optional pyspark extra — the multimodal import-guard
    # posture). NO type annotations on the kernel: `from __future__
    # import annotations` strings would resolve against module globals
    # where pd doesn't exist (the add_dataframe _embed idiom).
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _snip(texts):
        return pd.Series(
            [make_snippet(t, ast, window, mark, ellipsis, tokenizer) for t in texts]
        )

    return _snip(content_col)
