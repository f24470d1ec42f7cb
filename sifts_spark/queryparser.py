"""The unified search-query language: parser → AST → Spark Column / SQL.

Reference semantics (/root/reference/src/sifts/core.py:27-67 ``QueryParser``,
golden tests tests/sifts/test_queryparser.py:1-56):

* leading/trailing whitespace stripped (core.py:32)
* bare word → term match, case-insensitive (core.py:35-39)
* multiple words → implicit AND (tests/sifts/test_sqlite.py:56-63)
* ``and`` / ``AND`` keyword → conjunction (core.py:37, :58)
* ``or`` / ``OR`` keyword → disjunction (core.py:38, :59)
* trailing ``*`` → prefix match (core.py:60; README.md:69)

AND binds tighter than OR (FTS5 / to_tsquery operator precedence — the
reference delegates precedence to those engines; we make it explicit).

Instead of rewriting to a backend SQL string, we compile to an expression
tree and fold it into a Spark ``Column`` over a ``tokens ARRAY<STRING>``
column (produced by :func:`sifts_spark.functions.text.tokenize` — the
'simple'-text-search-config-parity tokenizer: lowercase, split on
non-alphanumeric, no stemming, no stopwords). ``array_contains`` /
``exists`` stay inside whole-stage codegen — no UDFs, no join needed for
the boolean-match path, so the filter is a plain scan predicate Catalyst
can push.

For the DuckDB correctness oracle the same AST compiles to ANSI SQL via
:meth:`Node.to_sql` (``list_contains`` over the identically-tokenized list).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F


class ParseError(ValueError):
    pass


@dataclass(frozen=True)
class Node:
    def to_column(self, tokens: Column) -> Column:
        raise NotImplementedError

    def to_sql(self, tokens_sql: str) -> str:
        """ANSI/DuckDB SQL predicate over a list-of-tokens expression."""
        raise NotImplementedError


@dataclass(frozen=True)
class Term(Node):
    word: str

    def to_column(self, tokens: Column) -> Column:
        return F.array_contains(tokens, self.word)

    def to_sql(self, tokens_sql: str) -> str:
        return f"list_contains({tokens_sql}, '{_sql_quote(self.word)}')"


@dataclass(frozen=True)
class Prefix(Node):
    prefix: str

    def to_column(self, tokens: Column) -> Column:
        return F.exists(tokens, lambda t: t.startswith(self.prefix))

    def to_sql(self, tokens_sql: str) -> str:
        p = _sql_quote(self.prefix)
        return (
            f"len(list_filter({tokens_sql}, _t -> _t LIKE '{p}%')) > 0"
        )


@dataclass(frozen=True)
class Suffix(Node):
    """Token-suffix match (``*ello`` → tokens ending in "ello") —
    produced by ``parse_query(substring_scan=True)`` when a leading
    ``*`` lands on a token the family stores WHOLE (word families
    always; a latin segment under cjk_bigram); README.md:69 documents
    ``*`` anywhere-in-term on the reference's SQLite backend. Served
    two ways with identical token-granular semantics: the scan
    predicate (``exists`` over on-the-fly tokens, behind the
    raw-Contains prefilter) and the postings index (r16: the term
    DICTIONARY answers a substring ask — ``endswith`` over the sorted
    term column; not range-prunable, so that disjunct's probe is a
    term-column scan — index bytes, never corpus bytes — and BM25
    scores like a Prefix leaf, tf/df aggregated over every matching
    term). ``Collection.query`` therefore serves these like any other
    text query: ranked, candidate-proportional downstream."""

    suffix: str

    def to_column(self, tokens: Column) -> Column:
        return F.exists(tokens, lambda t: t.endswith(self.suffix))

    def to_sql(self, tokens_sql: str) -> str:
        s = _sql_quote(self.suffix)
        return (
            f"len(list_filter({tokens_sql}, _t -> ends_with(_t, '{s}'))) > 0"
        )


@dataclass(frozen=True)
class Substring(Node):
    """Token-substring match (``*ello*`` → tokens containing "ello";
    also ``*中`` under cjk_bigram, where run-granular substring is the
    family's own posture and grams make contains-in-token ⟺
    contains-in-run). Same dual serving as :class:`Suffix`
    (``contains`` over the term dictionary / the token array)."""

    sub: str

    def to_column(self, tokens: Column) -> Column:
        return F.exists(tokens, lambda t: t.contains(self.sub))

    def to_sql(self, tokens_sql: str) -> str:
        s = _sql_quote(self.sub)
        return (
            f"len(list_filter({tokens_sql}, _t -> contains(_t, '{s}'))) > 0"
        )


@dataclass(frozen=True)
class Fuzzy(Node):
    """Fuzzy term match (``word~`` → Levenshtein distance ≤ 1,
    ``word~2`` → ≤ 2; Lucene's fuzzy-query syntax) — a defined
    EXTENSION (the reference has no ``~``; SURVEY §2.4). Word-granular
    families only: under an expanding family the stored tokens are
    grams, and edit distance over gram fragments is not a meaningful
    ask (the parser rejects with the remedy). Served like
    :class:`Suffix`: the scan predicate computes ``levenshtein`` over
    on-the-fly tokens; the postings path scans the term dictionary
    (``levenshtein(term, w) <= d`` — not range-prunable, index bytes
    only) and BM25 aggregates tf/df over every matching term. Both
    engines use classic Levenshtein (Spark ``levenshtein`` / DuckDB
    ``levenshtein``), so the twins agree by construction."""

    word: str
    dist: int = 1

    def to_column(self, tokens: Column) -> Column:
        return F.exists(
            tokens,
            lambda t: F.levenshtein(t, F.lit(self.word)) <= F.lit(self.dist),
        )

    def to_sql(self, tokens_sql: str) -> str:
        w = _sql_quote(self.word)
        return (
            f"len(list_filter({tokens_sql}, _t -> "
            f"levenshtein(_t, '{w}') <= {self.dist})) > 0"
        )


@dataclass(frozen=True)
class Phrase(Node):
    """Quoted-phrase match: the words occur CONSECUTIVELY in token
    order — an EXTENSION past the reference's documented surface
    (SURVEY §2.4: the reference passes quotes through raw, where they
    work on the FTS5 backend but break the PG rewriter — backend-
    divergent, so the reference effectively has no phrase semantics;
    we define them properly instead). Words are tokenizer-split, so
    ``"don't stop"`` matches the token run [don, t, stop].

    ``source`` (metadata, excluded from equality/hash): the original
    written query word this phrase was SYNTHESIZED from when an
    expanding family compiled one word to its consecutive gram chain
    (e.g. cjk_bigram "中文字" → Phrase(中文, 文字, source="中文字")).
    Gram positions are consecutive across written token boundaries, so
    such a phrase can over-match a doc where the chain spans adjacent
    runs (CJK_FP_EVAL.json measures the rate) — ``source`` is what the
    opt-in ``exact_runs`` verify substring-checks against raw lowered
    content to remove those. None for user-quoted phrases, whose
    cross-word adjacency is intended semantics."""

    words: tuple
    source: "str | None" = field(default=None, compare=False)

    def to_column(self, tokens: Column) -> Column:
        # Adjacency as a SUBSTRING match on the space-joined tokens:
        # no token of either tokenizer family can contain a space
        # (space is a delimiter in both), so "the words occur
        # consecutively in token order" ⟺ ' '+join(tokens,' ')+' '
        # contains ' w1 … wn ' — the padding spaces pin whole-token
        # boundaries ('ab' can't match inside 'abc'). Fully codegen'd
        # (Contains string search) vs the previous exists()-over-
        # sequence() HOF, which Spark evaluates in an interpreted
        # per-position loop — measured 6.0s → 0.3s for one quoted
        # phrase over the sf0.1 corpus (r14 fts_multiscript row).
        # NULL tokens (null content) coalesce to False, the previous
        # behavior.
        needle = " " + " ".join(self.words) + " "
        hay = F.concat(F.lit(" "), F.array_join(tokens, " "), F.lit(" "))
        return F.coalesce(hay.contains(needle), F.lit(False))

    def to_sql(self, tokens_sql: str) -> str:
        n = len(self.words)
        conds = " AND ".join(
            f"({tokens_sql})[_i + {j}] = '{_sql_quote(w)}'"
            for j, w in enumerate(self.words)
        )
        return (
            f"len(list_filter(range(1, greatest(len({tokens_sql}) - "
            f"{n - 1}, 0) + 1), _i -> {conds})) > 0"
        )


@dataclass(frozen=True)
class And(Node):
    left: Node
    right: Node

    def to_column(self, tokens: Column) -> Column:
        return self.left.to_column(tokens) & self.right.to_column(tokens)

    def to_sql(self, tokens_sql: str) -> str:
        return f"({self.left.to_sql(tokens_sql)} AND {self.right.to_sql(tokens_sql)})"


@dataclass(frozen=True)
class Or(Node):
    left: Node
    right: Node

    def to_column(self, tokens: Column) -> Column:
        return self.left.to_column(tokens) | self.right.to_column(tokens)

    def to_sql(self, tokens_sql: str) -> str:
        return f"({self.left.to_sql(tokens_sql)} OR {self.right.to_sql(tokens_sql)})"


@dataclass(frozen=True)
class AndNot(Node):
    """FTS5-style binary set difference: ``a NOT b`` = matches of
    ``a`` minus matches of ``b`` — an EXTENSION (the reference has no
    negation; SURVEY §2.4). NOT is deliberately UPPERCASE-ONLY and
    binary: lowercase "not" stays an ordinary content term ("do not
    disturb" keeps meaning three words), and a pure-negative query
    (``NOT a``, ``x or NOT a``) is rejected — complement-of-corpus
    cannot be answered from a postings index (the Lucene/FTS5
    restriction)."""

    left: Node
    right: Node

    def to_column(self, tokens: Column) -> Column:
        # coalesce: a NULL right side (NULL tokens) must read "does
        # not match", not poison the conjunction to NULL
        return self.left.to_column(tokens) & ~F.coalesce(
            self.right.to_column(tokens), F.lit(False)
        )

    def to_sql(self, tokens_sql: str) -> str:
        return (
            f"({self.left.to_sql(tokens_sql)} AND NOT "
            f"coalesce({self.right.to_sql(tokens_sql)}, false))"
        )


def _sql_quote(s: str) -> str:
    return s.replace("'", "''")


# a quoted span is ONE lexeme (phrase); otherwise whitespace-split
_TOKEN_RE = re.compile(r'"[^"]*"|\S+')


class QueryParser:
    """Recursive-descent parser for the documented query surface.

    Grammar::

        query   := or_expr
        or_expr := and_expr (("or") and_expr)*
        and_expr:= atom (("and")? atom | "NOT" atom)*   -- bare adjacency = AND
        atom    := WORD | WORD"*" | '"' WORD+ '"'       -- quoted = phrase

    Quoted phrases and binary ``NOT`` are extensions (see
    :class:`Phrase` / :class:`AndNot`); a quoted ``"and"``/``"or"`` is
    a term, never an operator, ``*`` inside a phrase is
    tokenizer-stripped (no prefix matching inside phrases), and NOT is
    uppercase-only (lowercase "not" stays a content term).

    Anything outside the documented surface (stray operators at the edges,
    empty query) raises :class:`ParseError` — the reference passes such
    input through to FTS5/to_tsquery where behavior is undefined
    (SURVEY.md §2.4); we reject instead.
    """

    def __init__(
        self,
        query: str,
        tokenizer: str | None = None,
        substring_scan: bool = False,
    ):
        self._words = _TOKEN_RE.findall(query.strip())
        self._pos = 0
        self._tokenizer = tokenizer
        self._substring_scan = substring_scan

    def parse(self) -> Node:
        if not self._words:
            raise ParseError("empty query")
        node = self._or_expr()
        if self._pos != len(self._words):
            raise ParseError(f"unexpected token {self._words[self._pos]!r}")
        return node

    def _peek(self) -> str | None:
        return self._words[self._pos] if self._pos < len(self._words) else None

    def _or_expr(self) -> Node:
        node = self._and_expr()
        while self._peek() is not None and self._peek().lower() == "or":
            self._pos += 1
            node = Or(node, self._and_expr())
        return node

    def _and_expr(self) -> Node:
        node = self._atom()
        while True:
            nxt = self._peek()
            if nxt is None or nxt.lower() == "or":
                return node
            if nxt == "NOT":  # case-sensitive: lowercase not = a term
                self._pos += 1
                node = AndNot(node, self._atom())
            elif nxt.lower() == "and":
                self._pos += 1
                node = And(node, self._atom())
            else:
                node = And(node, self._atom())

    def _atom(self) -> Node:
        word = self._peek()
        if word is None:
            raise ParseError("query ends with an operator")
        if word.lower() in ("and", "or"):
            raise ParseError(f"operator {word!r} in term position")
        if word == "NOT":
            raise ParseError(
                "NOT is binary (a NOT b) — a pure-negative query has "
                "no positive clause to search from"
            )
        self._pos += 1
        if word.startswith('"'):
            if len(word) < 2 or not word.endswith('"'):
                raise ParseError(f"unterminated quote in {word!r}")
            parts = _split_like_tokenizer(word[1:-1], self._tokenizer)
            if not parts:
                raise ParseError(f"no searchable characters in {word!r}")
            if len(parts) == 1:
                # one-word "phrase" is a term (or the lone-CJK-char
                # prefix degradation — same rule as the bare word)
                return self._leaf(parts[0], is_prefix=False)
            return Phrase(tuple(parts))
        # Leading wildcard (r15, reworked r16): a SUBSTRING ask. The
        # expanding families grant it by construction WHEN the head
        # segment gram-expands — every plain word already compiles to
        # its consecutive gram chain, which is in-word substring
        # match, so `*ello*`/`*ello` ≡ `ello` there (FTS5's trigram
        # tokenizer exists for exactly this) — strip and continue,
        # then validate the HEAD after the family split (below): a
        # head the family stores whole (any word-family token, a
        # latin segment under cjk_bigram) or sub-gram-length (lone
        # CJK char, 1-2 char trigram token — whose Prefix degradation
        # would miss word-final positions, ADVICE r16) is NOT
        # index-servable. Such asks raise with the remedy, or — with
        # ``substring_scan=True`` — compile to the scan-only
        # :class:`Suffix`/:class:`Substring` leaves.
        # Fuzzy match (r16): trailing `~` / `~2` — Lucene's fuzzy-query
        # syntax, a defined extension (the reference has no `~`).
        # Word-granular EDIT DISTANCE is only meaningful over a
        # whole-token index: under the expanding families the stored
        # terms are grams, and levenshtein against gram fragments
        # cross-matches unrelated text (a 2-char gram is within
        # distance 2 of ANY 2-char word) — reject with the remedy.
        if (m := re.fullmatch(r"(.+)~(\d+)?", word)) is not None:
            core, d = m.group(1), m.group(2)
            dist = 1 if d is None else int(d)
            if "*" in core:
                raise ParseError(
                    f"cannot combine '*' and '~' in {word!r}: a fuzzy "
                    "match is whole-token edit distance"
                )
            if "~" in core:
                # `a~~` / `a~1~2`: the inner tilde would be silently
                # tokenizer-stripped, turning a typo into a different
                # query (r16 stretch item — reject, don't guess)
                raise ParseError(
                    f"malformed fuzzy suffix in {word!r}: use word~ "
                    "or word~2"
                )
            if not 1 <= dist <= 2:
                raise ParseError(
                    f"fuzzy distance in {word!r} must be 1 or 2 "
                    "(Lucene's cap; ~0 is just the bare word)"
                )
            return self._fuzzy_leaf(word, core, dist)
        leading = word.startswith("*") and len(word) > 1
        orig_word = word
        if leading:
            word = word.lstrip("*")
        is_prefix = word.endswith("*") and len(word) > 1
        if is_prefix:
            word = word[:-1]
        # Split the query word EXACTLY like the content tokenizer splits
        # documents ("don't" indexes as [don, t] — functions/text.py), so
        # a punctuated query word becomes the conjunction of its token
        # parts and can actually match. Stripping punctuation instead
        # (round-1 behavior) produced the unmatchable term "dont".
        #
        # Groups preserve the family's expansion structure: in the
        # cjk_bigram family a CJK run expands to a multi-token group of
        # consecutive bigrams, which MUST compile to a Phrase — a bag-
        # of-words AND over the bigrams would also match the run
        # written backwards ("文中" vs "中文"). Bigram-phrase matching
        # is substring matching over runs, so a trailing `*` on a
        # multi-bigram run is already implied and drops out.
        from sifts_spark.functions.text import py_tokenize_parts_groups

        groups = py_tokenize_parts_groups(word, self._tokenizer)
        if not groups:
            raise ParseError(f"no searchable characters in {word!r}")
        from sifts_spark.functions.text import prefix_tail_needed

        leaves: list[Node] = []
        for gi, (part, group) in enumerate(groups):
            last = gi == len(groups) - 1
            if len(group) > 1:
                # synthesized gram-chain phrases carry their written
                # part as ``source`` — the exact_runs verify anchor
                if (
                    is_prefix
                    and last
                    and prefix_tail_needed(group[-1], self._tokenizer)
                ):
                    # "中文spark*": the group's tail is a NON-expanded
                    # segment, so the star still matters — compile the
                    # chain plus Prefix(tail). Adjacency between chain
                    # and tail is relaxed to AND (no phrase-prefix
                    # node) — recall-correct, documented over-match.
                    head = group[:-1]
                    leaves.append(
                        Phrase(tuple(head), source=part)
                        if len(head) > 1
                        else self._leaf(head[0], False)
                    )
                    leaves.append(Prefix(group[-1]))
                else:
                    leaves.append(Phrase(tuple(group), source=part))
            else:
                leaves.append(self._leaf(group[0], is_prefix and last))
        if leading:
            head_part, head_group = groups[0]
            from sifts_spark.functions.text import (
                prefix_degrades,
                prefix_tail_needed,
                resolve_tokenizer,
            )

            # A multi-token head group is a gram chain — substring
            # semantics by construction, the star is implied. A
            # single-token head that IS a complete family gram
            # (prefix_tail_needed False) likewise. Anything else —
            # word-family tokens, latin segments under cjk_bigram,
            # sub-gram needles ('*中', trigram '*ab') — the index
            # cannot serve: scan leaf under substring_scan, loud
            # rejection otherwise (never the silent Prefix
            # degradation, which misses word-final positions).
            if len(head_group) == 1 and prefix_tail_needed(
                head_group[0], self._tokenizer
            ):
                fam = resolve_tokenizer(self._tokenizer)
                if not self._substring_scan:
                    raise ParseError(
                        f"leading '*' in {orig_word!r}: substring match "
                        f"for this term is not index-servable under "
                        f"tokenizer={fam!r} — pass substring_scan=True "
                        "(query/query_df/parse_query) to serve it as a "
                        "scan predicate, or pin the collection to "
                        "tokenizer='trigram' (substring-indexes any "
                        "script; cjk_bigram covers CJK runs of >=2 "
                        "chars only); word families match whole stored "
                        "tokens"
                    )
                head = head_group[0]
                if prefix_degrades(head, self._tokenizer) or (
                    len(groups) == 1 and is_prefix
                ):
                    # sub-gram needles take run-granular containment
                    # (the expanding families' own posture: `*x` ≡
                    # `*x*` there); a lone whole-token part with both
                    # stars is containment by request
                    leaves[0] = Substring(head)
                else:
                    leaves[0] = Suffix(head)
        node = leaves[0]
        for leaf in leaves[1:]:
            node = And(node, leaf)
        return node

    def _fuzzy_leaf(self, word: str, core: str, dist: int) -> Node:
        """Compile ``core~dist``. Word families, plus cjk_bigram's
        NON-expanded tokens (see below); the core must be ONE token of
        the family (fuzzy is term-level, as in Lucene — "don't~" has no
        single-token edit distance).

        cjk_bigram stores non-CJK tokens WHOLE (only CJK runs expand,
        functions/text.py:_cjk_bigram_expand), so a whole-token
        edit-distance ask over such a token is well-defined there and
        serves exactly like the word families — the same tokens its
        Suffix/Substring path already serves (r16 ADVICE). Guard: the
        index also holds CJK grams and lone CJK chars, whose alphabets
        are DISJOINT from a non-CJK core, so ``levenshtein`` against
        them reads ``max(len(core), len(gram))`` — false-positive-free
        iff ``dist < len(core)`` (a 2-char core at distance 2 would
        match EVERY stored bigram); shorter asks reject with the
        remedy. CJK cores stay rejected: their stored form IS grams,
        and edit distance over gram fragments is not a meaningful ask.
        trigram expands every ≥3-char token, so no whole-token store
        exists to serve from — rejected with the remedy."""
        from sifts_spark.functions.text import (
            TOKENIZER_CJK,
            gram_width,
            resolve_tokenizer,
        )

        fam = resolve_tokenizer(self._tokenizer)
        if gram_width(fam):
            if fam == TOKENIZER_CJK:
                import re as _re

                from sifts_spark.functions.text import CJK_RUN_CHARS
                from sifts_spark.functions.text import _py_parts

                parts = _py_parts(core, self._tokenizer)
                if len(parts) > 1 and not any(
                    _re.search(f"[{CJK_RUN_CHARS}]", p) for p in parts
                ):
                    raise ParseError(
                        f"'~' in {word!r}: fuzzy match applies to a "
                        f"single token, but {core!r} splits into "
                        f"{parts} — fuzzy one of them"
                    )
                if len(parts) == 1 and not _re.search(
                    f"[{CJK_RUN_CHARS}]", parts[0]
                ):
                    if dist >= len(parts[0]):
                        raise ParseError(
                            f"'~' in {word!r}: under tokenizer={fam!r} "
                            f"fuzzy distance must be < the token length "
                            f"(a {len(parts[0])}-char token at distance "
                            f"{dist} would collide with the family's "
                            "stored CJK grams) — lengthen the token or "
                            "lower the distance"
                        )
                    return Fuzzy(parts[0], dist)
            raise ParseError(
                f"'~' in {word!r}: fuzzy match is whole-token edit "
                f"distance, but tokenizer={fam!r} stores this core as "
                "n-grams — use a word family (unicode/ascii) for fuzzy "
                "matching"
                + (
                    " (under cjk_bigram a single NON-CJK token is "
                    "stored whole and may be fuzzied)"
                    if fam == TOKENIZER_CJK
                    else ""
                )
            )
        parts = _split_like_tokenizer(core, self._tokenizer)
        if not parts:
            raise ParseError(f"no searchable characters in {word!r}")
        if len(parts) > 1:
            raise ParseError(
                f"'~' in {word!r}: fuzzy match applies to a single "
                f"token, but {core!r} splits into {parts} — fuzzy one "
                "of them"
            )
        return Fuzzy(parts[0], dist)

    def _leaf(self, token: str, is_prefix: bool) -> Node:
        """One single-token leaf. In the expanding families a query
        token SHORTER than the expansion unit compiles to a Prefix (an
        exact Term can never hit the expanded index: cjk_bigram's
        lone CJK char, trigram's 1-2 char tokens); prefix-over-grams
        finds it at every non-final in-word position plus standalone
        occurrences — a documented partial-recall degradation where
        FTS5's trigram tokenizer rejects the query outright."""
        if is_prefix:
            return Prefix(token)
        from sifts_spark.functions.text import prefix_degrades

        if prefix_degrades(token, self._tokenizer):
            return Prefix(token)
        return Term(token)


def _split_like_tokenizer(word: str, tokenizer: str | None = None) -> list[str]:
    """Query-side twin of functions.text.tokenize: lowercase, split on
    non-alphanumerics, drop empties ('simple'-config parity). The
    ``tokenizer`` family must match the INDEX the query runs against
    (a unicode query word against an ascii-built postings index would
    silently never match) — Collection passes its ``_tokenizer``
    marker; free-standing callers get the default family."""
    from sifts_spark.functions.text import py_tokenize

    return py_tokenize(word, tokenizer)


def parse_query(
    query: str,
    tokenizer: str | None = None,
    substring_scan: bool = False,
) -> Node:
    """Parse the documented query surface under ``tokenizer``'s family.

    ``substring_scan=True`` (extension knob): leading-``*`` terms the
    family's index cannot SEEK — word-family tokens, latin segments
    under cjk_bigram, sub-gram-width needles — compile to the
    :class:`Suffix`/:class:`Substring` leaves instead of raising.
    Both serving strategies answer them with identical token-granular
    semantics: the scan predicate, and the postings index via a
    term-dictionary scan (r16)."""
    return QueryParser(query, tokenizer, substring_scan).parse()


def has_scan_only(ast: Node) -> bool:
    """True when the AST contains a :class:`Suffix`/:class:`Substring`
    leaf — ``match_filter`` uses this to put the raw-Contains
    prefilter in front of word-family scan predicates (the postings
    path serves these leaves too, via the term dictionary)."""
    if isinstance(ast, (Suffix, Substring)):
        return True
    if isinstance(ast, (And, Or, AndNot)):
        return has_scan_only(ast.left) or has_scan_only(ast.right)
    return False


def has_run_phrase(ast: Node) -> bool:
    """True when the AST contains a SYNTHESIZED gram-chain
    :class:`Phrase` (``source`` set) — the only node shape the opt-in
    ``exact_runs`` verify applies to; queries without one make the
    flag a no-op (plans stay byte-identical)."""
    if isinstance(ast, Phrase):
        return ast.source is not None
    if isinstance(ast, (And, Or, AndNot)):
        return has_run_phrase(ast.left) or has_run_phrase(ast.right)
    return False


def conjunctive_sources(ast: Node) -> "list[str] | None":
    """The sourced-phrase written words when the POSITIVE spine is
    purely conjunctive — the cheap ``exact_runs`` residual: an index
    candidate already passed the FULL AST (boolean + gram-chain
    adjacency), so in a conjunction the only residual between index
    truth and exact-run truth is one raw Contains per sourced phrase
    (no content re-tokenize). Returns None when an ``Or`` subtree
    CONTAINS a sourced phrase (we can't know which disjunct admitted
    the candidate — the caller falls back to the full structural
    re-eval); an Or subtree without one contributes no residual. An
    ``AndNot`` right side keeps index semantics (see
    :func:`~sifts_spark.operators.search.exact_runs_column`)."""
    if isinstance(ast, Or):
        return None if has_run_phrase(ast) else []
    if isinstance(ast, AndNot):
        return conjunctive_sources(ast.left)
    if isinstance(ast, And):
        left = conjunctive_sources(ast.left)
        right = conjunctive_sources(ast.right)
        if left is None or right is None:
            return None
        return left + right
    if isinstance(ast, Phrase) and ast.source is not None:
        return [ast.source]
    return []


def exact_runs_sql(ast: Node, tokens_sql: str, raw_sql: str) -> str:
    """ANSI/DuckDB twin of
    :func:`~sifts_spark.operators.search.exact_runs_column` — the
    exact run-boundary verify folded into the AST's SQL predicate:
    every SOURCED gram-chain phrase additionally requires its written
    word as a raw substring of ``raw_sql`` (the lowered content
    expression); user-quoted phrases and ``AndNot`` right sides keep
    index semantics, OR branches verify independently. The oracle-gate
    expression for ``exact_runs=True`` rows (r16)."""
    if isinstance(ast, Phrase) and ast.source is not None:
        return (
            f"({ast.to_sql(tokens_sql)} AND coalesce(contains("
            f"{raw_sql}, '{_sql_quote(ast.source)}'), false))"
        )
    if isinstance(ast, And):
        return (
            f"({exact_runs_sql(ast.left, tokens_sql, raw_sql)} AND "
            f"{exact_runs_sql(ast.right, tokens_sql, raw_sql)})"
        )
    if isinstance(ast, Or):
        return (
            f"({exact_runs_sql(ast.left, tokens_sql, raw_sql)} OR "
            f"{exact_runs_sql(ast.right, tokens_sql, raw_sql)})"
        )
    if isinstance(ast, AndNot):
        return (
            f"({exact_runs_sql(ast.left, tokens_sql, raw_sql)} AND NOT "
            f"coalesce({ast.right.to_sql(tokens_sql)}, false))"
        )
    return ast.to_sql(tokens_sql)


def has_phrase(ast: Node) -> bool:
    """True when the AST contains a :class:`Phrase` — callers on the
    postings path use this to add the adjacency verify only when one
    exists (phrase-free plans stay byte-identical)."""
    if isinstance(ast, Phrase):
        return True
    if isinstance(ast, (And, Or, AndNot)):
        return has_phrase(ast.left) or has_phrase(ast.right)
    return False


def has_unverified_phrase(ast: Node) -> bool:
    """True when a POSITIONS-FREE all-words-present candidate set plus
    the conjunctive Contains residual would NOT prove the AST exactly:

    * an UNSOURCED (user-quoted) :class:`Phrase` anywhere — its
      cross-word adjacency was never index-verified and
      :func:`conjunctive_sources` gives it no residual;
    * ANY phrase on an ``AndNot`` right side — the positions-free
      prefilter (:func:`~sifts_spark.operators.search._retag`) DROPPED
      the negation (excluding an over-approximation would drop real
      matches), so candidates still include docs matching it.

    ``exact_runs_verify`` uses this to gate its Contains-only fast
    path: on a ``_pending``-free frame (positions-free index or
    pre-positions batches read without the 3-valued path) such an AST
    must take the full structural re-eval — a sourced gram-chain
    phrase alone is fine (its Contains residual is STRONGER than
    gram-chain adjacency)."""
    if isinstance(ast, Phrase):
        return ast.source is None
    if isinstance(ast, (And, Or)):
        return has_unverified_phrase(ast.left) or has_unverified_phrase(
            ast.right
        )
    if isinstance(ast, AndNot):
        return has_unverified_phrase(ast.left) or has_phrase(ast.right)
    return False
