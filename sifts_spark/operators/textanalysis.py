"""Text-analysis operators: language id, quality scoring, token stats,
fingerprinting. Training-data-pipeline extensions (SURVEY.md §7 phase 5).

All pure ``pyspark.sql.functions`` expressions — map-side, codegen'd,
shuffle-free — and each has an exact DuckDB-SQL twin for the oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sifts_spark.functions.text import (
    TOKEN_MATCH_RE,
    TOKEN_MATCH_RE_PY,
    tokenize,
    shingles,
)

# Tiny per-language marker lexicons (top function words). Real pipelines
# plug in fastText/CLD3 via mapInPandas (see operators/multimodal.py for
# the UDF plumbing pattern); the heuristic keeps this engine dependency-
# free and exactly reproducible in SQL.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "was"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr": ("le", "la", "les", "et", "des", "est", "un", "une", "du", "que"),
    "es": ("el", "la", "los", "las", "que", "de", "un", "una", "es", "por"),
    "it": ("il", "la", "che", "di", "un", "una", "per", "con", "del", "non"),
}

# BPE-ish surface tokenization: word pieces OR single non-space symbols.
# Java/RE2 syntax (Spark regexp_extract_all + the DuckDB oracle twin);
# \p{L}\p{N} since the r14 unicode flip — the complement class makes
# every non-space, non-alphanumeric char (any script's punctuation)
# its own surface token, same as the old ASCII form did.
#
# CJK is counted PER CHARACTER (r14 review fix): these scripts have no
# word separators, so a run-level count under-counts a Chinese doc
# ~20x against what any real subword tokenizer produces — chunk/pack
# budgets sized on it would overshoot by the same factor. Identical
# literal ranges in all three engines (Han + CJK-ext-A, Hiragana,
# Katakana, Hangul syllables); kana per-char is the conservative
# choice, documented. The Spark/DuckDB forms pre-separate CJK chars
# with spaces (regexp_replace) before the run-form count — alternation
# alone cannot stop `[\p{L}\p{N}]+` from swallowing a mixed "abc中"
# run, and RE2 has no class subtraction; the Python span form (used
# where char OFFSETS matter, so no pre-separation: chunking) instead
# excludes the ranges from the run class, which plain `re` supports.
CJK_CHAR_CLASS = (
    "一-鿿㐀-䶿぀-ヿ가-힯"
)
CJK_SEP_RE = f"([{CJK_CHAR_CLASS}])"
TOKEN_COUNT_RE = rf"{TOKEN_MATCH_RE}|[^\p{{L}}\p{{N}}\s]"
# Python twin (stdlib re has no \p{..}): [^\w\s] misses "_" (underscore
# is in \w), so it is appended as an explicit alternative.
TOKEN_COUNT_RE_PY = (
    rf"[{CJK_CHAR_CLASS}]|[^\W_{CJK_CHAR_CLASS}]+|[^\w\s]|_"
)


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc token statistics → (id, n_tokens, n_distinct_tokens,
    n_chars, avg_token_len, type_token_ratio)."""
    # r17: tokenize bound once through a staged Project (same rationale
    # as quality_score — the single Project inlined it into four
    # consumers, HOF projections are codegen-fallback), and the token-
    # length sum as length(array_join(toks, '')) — one concat instead
    # of an interpreted per-element aggregate fold (equal by
    # construction: tokens are non-null, the separator empty).
    # Value-identical (exact-equality A/B at sf1; text_stats oracle row
    # pins the semantics); measured 1.78 -> 1.27s at sf1 quiet-epoch.
    staged = docs.select(
        F.col(id_col).alias("id"),
        F.length(F.col(text_col)).alias("n_chars"),
        tokenize(F.col(text_col)).alias("_toks"),
    )
    toks = F.col("_toks")
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    total_len = F.length(F.array_join(toks, ""))
    return staged.select(
        "id",
        n.alias("n_tokens"),
        nd.alias("n_distinct_tokens"),
        "n_chars",
        F.round(total_len.cast("double") / n, 6).alias("avg_token_len"),
        F.round(nd.cast("double") / n, 6).alias("type_token_ratio"),
    )


def bpe_ish_token_count(text: Column) -> Column:
    """Surface token count with a BPE-ish regex (words + symbols;
    CJK per character — see TOKEN_COUNT_RE's rationale)."""
    seped = F.regexp_replace(F.lower(text), CJK_SEP_RE, " $1 ")
    return F.size(F.regexp_extract_all(seped, F.lit(TOKEN_COUNT_RE), 0))


def token_count_sql(text_expr: str) -> str:
    """DuckDB twin of :func:`bpe_ish_token_count` (shared constants —
    the two engines cannot diverge)."""
    seped = (
        f"regexp_replace(lower({text_expr}), '{CJK_SEP_RE}', ' \\1 ', 'g')"
    )
    return f"len(regexp_extract_all({seped}, '{TOKEN_COUNT_RE}'))"


def quality_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    impl: str = "hof",
) -> DataFrame:
    """Heuristic quality score in [0,1] → (id, punct_ratio,
    stopword_ratio, quality).

    Components (each a clamped linear feature, Gopher/C4-style):
      * length in tokens (saturating at 50)
      * type-token ratio (repetition penalty)
      * stopword ratio (too few stopwords = listy/non-prose)
      * punctuation density (too much = markup/noise)

    ``impl="hof"`` (default) is pure JVM expression. Unlike language_id
    (5 filter lambdas — Arrow kernel 20× at sf1), the single stopword
    HOF here is NOT the dominant cost: measured head-to-head, swapping
    it for the Arrow count kernel (``impl="arrow"``, zero float-parity
    surface — the kernel returns an INTEGER and every ratio/round stays
    JVM-side) is ~17% faster at sf1 but 40% slower at sf0.1 from the
    Python worker constant. The expression path wins on plan purity;
    the kernel stays available for corpora where the crossover flips.
    """
    text = F.col(text_col)
    # r17: bind the tokenize subtree ONCE through a staged Project
    # (guide §1.2 "per-task work"): the single-Project shape inlined
    # the split+filter tokens expression into five consumers (n,
    # n_stop, ttr's distinct, len_feat) — visible five-fold in
    # explain("formatted") — and the HOF-bearing Project is
    # codegen-fallback, so codegen subexpression elimination never
    # applies. CollapseProject keeps the stage boundary because the
    # `_toks` alias is multiply referenced and non-cheap. Punctuation
    # count as a length delta (the class matches single chars, so
    # chars-removed == matches) instead of materializing an array of
    # every punct char. Value-identical (exact-equality A/B over sf1 +
    # sf0.1; test_quality_python_reference pins the values, the
    # text_quality oracle row the semantics); measured ~8% at sf1
    # interleaved A/B.
    n_punct = F.length(text) - F.length(
        F.regexp_replace(text, "[^a-zA-Z0-9\\s]", "")
    )
    if impl == "arrow":
        from sifts_spark.functions.hashing import (
            ensure_min_parallelism,
            stopword_count_arrow,
        )

        docs = ensure_min_parallelism(docs)
        staged = docs.select(
            F.col(id_col).alias("id"),
            text.alias("_text"),
            tokenize(text).alias("_toks"),
            n_punct.alias("_npunct"),
            stopword_count_arrow(text, LANG_MARKERS["en"]).alias("_nstop"),
        )
        n_stop = F.col("_nstop")
    else:
        stop = F.array([F.lit(w) for w in LANG_MARKERS["en"]])
        staged = docs.select(
            F.col(id_col).alias("id"),
            text.alias("_text"),
            tokenize(text).alias("_toks"),
            n_punct.alias("_npunct"),
        )
        n_stop = F.size(
            F.filter(F.col("_toks"), lambda t: F.array_contains(stop, t))
        )
    n = F.size(F.col("_toks"))
    punct_ratio = F.round(
        F.col("_npunct").cast("double")
        / F.greatest(F.length("_text"), F.lit(1)),
        6,
    )
    stop_ratio = F.round(n_stop.cast("double") / F.greatest(n, F.lit(1)), 6)
    ttr = F.size(F.array_distinct(F.col("_toks"))).cast(
        "double"
    ) / F.greatest(n, F.lit(1))
    len_feat = F.least(n.cast("double") / 50.0, F.lit(1.0))
    mid = staged.select(
        "id",
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        ttr.alias("_ttr"),
        len_feat.alias("_lenf"),
    )
    return mid.select(
        "id",
        "punct_ratio",
        "stopword_ratio",
        F.round(
            0.35 * F.col("_lenf")
            + 0.25 * F.col("_ttr")
            + 0.25 * F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0))
            + 0.15
            * (1.0 - F.least(F.col("punct_ratio") * 10.0, F.lit(1.0))),
            6,
        ).alias("quality"),
    )


def language_id(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    impl: str = "arrow",
) -> DataFrame:
    """Marker-word language id → (id, pred_lang, lang_hits).

    Scores each language by marker hits over the token array; argmax with
    deterministic alphabetical tiebreak; 0 hits → 'und'. Map-side only.

    ``impl="arrow"`` (default) runs the whole score-and-argmax in one
    Arrow batch per partition (functions/hashing.langid_arrow) — the
    expression path pays five interpreted HOF filter-lambdas per doc
    and was the top sf1 profile entry; ``impl="hof"`` keeps the
    pure-JVM expression (zero Python in the plan). Value-identical,
    pinned by the impl-equivalence test and the shared DuckDB oracle.
    """
    if impl == "arrow":
        from sifts_spark.functions.hashing import ensure_min_parallelism, langid_arrow

        # r17: bytes-sized spread (guide §2.2) — the marker-probe kernel
        # is ~0.1 ms/doc, so core-count splits of a sub-MB corpus pay
        # more per-task Arrow overhead than compute; width sweep at
        # sf0.1 read med 0.63s (32-way) vs 0.51-0.52s (8-16-way).
        out = ensure_min_parallelism(docs, 64 << 10).select(
            F.col(id_col).alias("id"),
            langid_arrow(F.col(text_col), LANG_MARKERS).alias("_lid"),
        )
        return out.select(
            "id",
            F.col("_lid.pred_lang").alias("pred_lang"),
            F.col("_lid.lang_hits").alias("lang_hits"),
        )
    toks = tokenize(F.col(text_col))
    scores = []
    for lang in sorted(LANG_MARKERS):
        markers = F.array([F.lit(w) for w in LANG_MARKERS[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    # array_max on (hits, lang) structs: max hits, then max lang — to get
    # alphabetical-first tiebreak we compare on (hits, negated rank) via
    # sorting: take struct with greatest hits, smallest lang.
    best = F.array_max(
        F.transform(
            F.array(*scores),
            lambda s: F.struct(
                s["hits"].alias("hits"),
                # invert lang for tiebreak: greatest struct = alphabetically
                # first lang among equal hits (chr(255-ord) trick avoided:
                # use negative index into sorted list)
                (-F.array_position(
                    F.array(*[F.lit(l) for l in sorted(LANG_MARKERS)]), s["lang"]
                )).alias("nrank"),
                s["lang"].alias("lang"),
            ),
        )
    )
    return docs.select(
        F.col(id_col).alias("id"),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
        best["hits"].alias("lang_hits"),
    )


# Whitespace for the script denominator: ASCII \s is not enough — CJK
# text separates with U+3000 (ideographic space) and web text is full
# of NBSP; counting those as "content" would deflate every script
# fraction. \p{Zs} adds all Unicode space separators; Zl/Zp/NEL added
# explicitly (Java spells code points \uXXXX, RE2 \x{XXXX} — hence the
# engine pair, same convention as SCRIPT_PATTERNS).
WS_PATTERN_JAVA = "[\\s\\p{Zs}\\u2028\\u2029\\u0085]"
WS_PATTERN_RE2 = "[\\s\\p{Zs}\\x{2028}\\x{2029}\\x{0085}]"

# script name -> (Java regex char class, RE2/DuckDB char class).
# Java prefixes script names with "Is"; RE2 uses the bare name — same
# Unicode Script property underneath, so counts agree engine-to-engine.
SCRIPT_PATTERNS: dict[str, tuple[str, str]] = {
    "latin": (r"\p{IsLatin}", r"\p{Latin}"),
    "cyrillic": (r"\p{IsCyrillic}", r"\p{Cyrillic}"),
    "han": (r"\p{IsHan}", r"\p{Han}"),
    "kana": (
        r"[\p{IsHiragana}\p{IsKatakana}]",
        r"[\p{Hiragana}\p{Katakana}]",
    ),
    "hangul": (r"\p{IsHangul}", r"\p{Hangul}"),
    "arabic": (r"\p{IsArabic}", r"\p{Arabic}"),
    "devanagari": (r"\p{IsDevanagari}", r"\p{Devanagari}"),
}


def script_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc Unicode-SCRIPT composition → (id, n_chars,
    ``{script}_frac`` x 7, other_frac, main_script) — the multilingual
    curation signal the marker-lexicon :func:`language_id` can't give
    (it only knows five Latin-script languages): script fractions
    catch mislabeled-language docs (claimed ``en`` but 80% Han),
    mixed-script spam, and transliteration artifacts, and they're the
    standard routing key for script-specific tokenizer/filter stages
    in multilingual pipelines.

    Scripts: latin, cyrillic, han, kana (hiragana+katakana), hangul,
    arabic, devanagari — each a Unicode Script property class, counted
    by length-difference after ``regexp_replace`` (7 codegen'd regex
    passes, map-side, no shuffle, no UDF). ``n_chars`` counts
    non-whitespace chars — whitespace per :data:`WS_PATTERN_JAVA`,
    which includes the Unicode space separators (U+3000 ideographic
    space, NBSP, …) ASCII ``\\s`` misses (the denominator, floored at
    1);
    ``other_frac`` is the remainder (digits, punctuation, unlisted
    scripts). ``main_script`` = the highest-count script in
    declaration order on ties, or ``"none"`` when no listed script
    occurs (empty/NULL/digits-only text). Fractions rounded to 6 dp;
    every pattern has an RE2 twin in :data:`SCRIPT_PATTERNS` so the
    whole frame is DuckDB-replayable.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(F.regexp_replace(t, WS_PATTERN_JAVA, ""))
    denom = F.greatest(n_chars, F.lit(1)).cast("double")
    counts = {
        name: F.length(t) - F.length(F.regexp_replace(t, java_pat, ""))
        for name, (java_pat, _) in SCRIPT_PATTERNS.items()
    }
    listed = None
    for c in counts.values():
        listed = c if listed is None else listed + c
    cols = [F.col(id_col).alias("id"), n_chars.alias("n_chars")]
    cols += [
        F.round(c.cast("double") / denom, 6).alias(f"{name}_frac")
        for name, c in counts.items()
    ]
    cols.append(
        F.round(
            (n_chars - listed).cast("double") / denom, 6
        ).alias("other_frac")
    )
    best = F.greatest(*counts.values())
    main = F.lit("none")
    for name in reversed(list(counts)):
        main = F.when(
            (counts[name] == best) & (best > 0), F.lit(name)
        ).otherwise(main)
    cols.append(main.alias("main_script"))
    return docs.select(*cols)


def fingerprint(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    shingle_size: int = 3,
) -> DataFrame:
    """Document fingerprint → (id, exact_md5, winnow_fp).

    ``exact_md5``: md5 of whitespace-normalized lowercase text (exact-dup
    key). ``winnow_fp``: md5 over the k smallest shingle hashes — a
    winnowing-style locality-sensitive sketch: docs differing by a few
    words usually share it. Zero-shingle docs (nothing tokenizable,
    see ``shingles()``) get a NULL ``winnow_fp`` (r13): a constant
    sketch would declare every non-Latin-script doc a near-dup of
    every other — ``exact_md5`` still keys them, and THAT compares
    real content. Matches the DuckDB twin, where the empty list
    aggregates to NULL.
    """
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    toks = tokenize(F.col(text_col))
    hashes = F.array_sort(
        F.transform(F.array_distinct(shingles(toks, shingle_size)), lambda s: F.md5(s))
    )
    winnow = F.when(
        F.size(hashes) > 0, F.md5(F.array_join(F.slice(hashes, 1, k), "|"))
    )
    return docs.select(
        F.col(id_col).alias("id"),
        F.md5(norm).alias("exact_md5"),
        winnow.alias("winnow_fp"),
    )


def keywords_tfidf(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Per-doc top-``k`` terms by tf-idf → ``(id, term, tf, score,
    rank)`` — the classic corpus-statistics keyword extractor (salient
    terms for tagging, faceting, weak labels).

    Formula (pinned, DuckDB-replicable): ``idf = ln((N+1)/(df+1)) + 1``
    (smoothed, sklearn's convention), ``score = round(tf * idf, 6)``;
    ``N`` = docs with ≥1 token; ties broken by ``term`` ascending so
    the top-k is total-ordered and oracle-exact.

    Distributed shape: one explode + (id, term) groupBy for tf (the
    token-sized shuffle every postings build pays); df via a window
    count over ``term`` — NOT a vocabulary-sized broadcast join, which
    would stop fitting exactly when the corpus gets interesting (web
    vocab with typos is ~10^8 terms); ``N`` as a broadcast 1-row cross
    join; per-doc window for top-k — partitioned by doc id, so sorts
    are per-group tiny; no global sort, no driver state. (On a live
    Collection the postings sidecar + corpus_stats already hold tf/df/N
    — this operator is the standalone-frame path.)"""
    from pyspark.sql import Window

    toks_exploded = docs.select(
        F.col(id_col).cast("string").alias("id"),
        F.explode(tokenize(F.col(text_col))).alias("term"),
    )
    tf = toks_exploded.groupBy("id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    # r17: N as a map-side sum over the DOCS table, not
    # countDistinct(id) over tf — the tf branch re-ran the whole
    # tokenize→explode→(id,term) shuffle→agg pipeline a second time
    # just to count docs with ≥1 token (no exchange reuse: the two
    # aggregation pipelines differ, runtime-checked). The docs-side
    # count is one scan + tokenize with a 1-row partial sum — no
    # explode, no shuffle (guide §2.3/§2.4). Equal by construction:
    # ids are unique, so distinct ids in tf == docs whose token array
    # is non-empty. Value-pinned by the keywords_tfidf oracle row and
    # the exact-equality A/B in the r17 notes; persisting tf instead
    # was A/B-measured SLOWER (cache materialization cost exceeds the
    # second tokenize pass at sf1).
    n_docs = docs.select(
        F.sum(
            (F.size(tokenize(F.col(text_col))) > 0).cast("long")
        ).alias("n_docs")
    )
    idf = F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.round(F.col("tf") * idf, 6))
    )
    w = Window.partitionBy("id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", "term", "tf", "score", "rank")
    )


# PII-ish patterns kept RE2/Java-regex-portable (no lookarounds): the
# same source string compiles identically in Spark (Java regex) and
# DuckDB (RE2), so redaction is oracle-checkable.
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "phone": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
    "ipv4": r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def scrub_pii(text: Column, kinds: tuple[str, ...] = ("email", "phone", "ipv4")) -> Column:
    """Redact PII-shaped spans with ``[KIND]`` markers — map-side
    regexp_replace chain, shuffle-free. A filter stage in every
    training-data pipeline; patterns deliberately simple/portable —
    production swaps in a vetted PII model via mapInPandas."""
    out = text
    for kind in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"[{kind.upper()}]")
    return out


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopwords_present: int = 2,
) -> DataFrame:
    """Gopher's MassiveWeb quality rules (Rae et al. 2021, app. A1.1 —
    with C4 the most-replicated named web filter set) as one map-side
    pass → per-doc signal columns plus a combined ``gopher_pass``:

    - ``n_words`` in [``min_words``, ``max_words``] (whitespace words);
    - ``mean_word_len`` in [3, 10];
    - ``symbol_word_ratio`` (``#`` or ellipsis per word) ≤ 0.1;
    - ``bullet_line_frac`` (lines starting with a bullet) ≤ 0.9;
    - ``ellipsis_line_frac`` (lines ending with an ellipsis) ≤ 0.3;
    - ``alpha_word_frac`` (words containing ≥1 alphabetic char) ≥ 0.8;
    - ``n_stopwords_present`` ≥ 2 of Gopher's 8-word list (the, be,
      to, of, and, that, have, with).

    Repetition rules from the same appendix live in
    :func:`gopher_repetition` (the full 13-signal set; see also the
    lighter :func:`repetition_stats` sketch) — this operator carries
    the document-shape half. Pure higher-order
    expressions, codegen'd, zero shuffle; every threshold a keyword so
    corpora can retune without forking.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(t, r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    total_len = F.aggregate(
        words, F.lit(0), lambda a, w: a + F.length(w)
    ).cast("double")
    mean_len = F.round(total_len / nw, 6)
    n_symbols = (
        F.length(t)
        - F.length(F.regexp_replace(t, r"#", ""))
        + F.size(F.regexp_extract_all(t, F.lit(r"\.\.\.|…"), 0))
    )
    sym_ratio = F.round(n_symbols.cast("double") / nw, 6)
    lines = F.filter(
        F.transform(
            F.split(t, "\n"), lambda x: F.regexp_replace(x, r"^\s+|\s+$", "")
        ),
        lambda x: x != "",
    )
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_frac = F.round(
        F.size(
            F.filter(lines, lambda x: x.rlike(r"^[•\-\*•‣◦]"))
        ).cast("double")
        / n_lines,
        6,
    )
    ellipsis_frac = F.round(
        F.size(F.filter(lines, lambda x: x.rlike(r"(\.\.\.|…)$"))).cast(
            "double"
        )
        / n_lines,
        6,
    )
    alpha_frac = F.round(
        F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]"))).cast("double")
        / nw,
        6,
    )
    toks = tokenize(t)
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    d = docs.select(
        F.col(id_col).alias("id"),
        n_words.alias("n_words"),
        mean_len.alias("mean_word_len"),
        sym_ratio.alias("symbol_word_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        ellipsis_frac.alias("ellipsis_line_frac"),
        alpha_frac.alias("alpha_word_frac"),
        n_stop.alias("n_stopwords_present"),
    )
    return d.withColumn(
        "gopher_pass",
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(
            min_mean_word_len, max_mean_word_len
        )
        & (F.col("symbol_word_ratio") <= max_symbol_word_ratio)
        & (F.col("bullet_line_frac") <= max_bullet_line_frac)
        & (F.col("ellipsis_line_frac") <= max_ellipsis_line_frac)
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
        & (F.col("n_stopwords_present") >= min_stopwords_present),
    )


def top_ngrams(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 2,
    k: int = 20,
) -> DataFrame:
    """Corpus n-gram census → top-``k`` ``(gram, n)`` by occurrence
    count (count desc, gram asc — a total order, so the cut is
    deterministic). The corpus-statistics staple behind boilerplate
    inspection, stopword discovery and tokenizer sanity reports.

    Scale shape: n-gram generation is a map-side higher-order
    expression over the tokenized text (no shingle materialization
    beyond the explode); the count is ONE hash aggregate with map-side
    partial combine keyed by gram (vocabulary-bounded, not
    corpus-bounded); the top-k cut is TakeOrdered (per-partition heap
    + driver merge of k rows), never a global sort. Docs shorter than
    ``n`` tokens contribute nothing (census semantics — unlike
    ``shingles()``'s whole-doc fallback, which exists for MinHash
    coverage).
    """
    toks = tokenize(F.col(text_col))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.expr("CAST(array() AS ARRAY<STRING>)"))
    return (
        docs.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("gram").asc())
        .limit(k)
    )


def c4_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 3,
    min_sentences: int = 5,
    bad_words: tuple[str, ...] = (),
    keep_stats: bool = False,
) -> DataFrame:
    """C4's cleaning heuristics (Raffel et al. 2020 §2.2 — the filter
    stack behind the C4 corpus), as one map-side pass:

    line level (text is rewritten to the surviving lines, each
    whitespace-trimmed):

    - keep only lines ending in a terminal punctuation mark
      (``.`` ``!`` ``?`` or an end quote);
    - keep only lines with ≥ ``min_words_per_line`` whitespace words;
    - drop lines containing the word "javascript" (cookie/JS warnings);

    page level (evaluated on the CLEANED text; failing docs drop):

    - ≥ ``min_sentences`` sentences, counted as terminal-punctuation
      runs — the paper's "at least 5 sentences" gate under a
      deterministic sentence proxy;
    - no "lorem ipsum" (placeholder text);
    - no ``{`` (source code);
    - no token from ``bad_words`` (the paper uses the public
      "List of Dirty, Naughty …" blocklist — supply it here; empty
      default keeps the engine list-free).

    The paper's remaining stage — three-sentence span dedup — is
    corpus-level, not per-doc: compose with
    :func:`~sifts_spark.operators.substring.remove_duplicate_spans`
    or :func:`~sifts_spark.operators.dedup.dedup_paragraphs`.

    Pure higher-order expressions (split → transform → filter →
    array_join), codegen'd, zero shuffle, exactly reproducible in SQL.
    ``keep_stats=True`` adds ``c4_lines_kept`` / ``c4_lines_dropped``
    audit columns. At 100 TB this is a free rider on whatever scan
    feeds it — no exchange, no Python.
    """
    lines = F.split(F.col(text_col), "\n")
    trimmed = F.transform(
        lines, lambda x: F.regexp_replace(x, r"^\s+|\s+$", "")
    )
    kept = F.filter(
        trimmed,
        lambda t: (t != "")
        & t.rlike('[.!?"”]$')
        & (F.size(F.split(t, r"\s+")) >= min_words_per_line)
        & ~F.lower(t).rlike(r"\bjavascript\b"),
    )
    d = docs.withColumn("_c4_nlines", F.size(lines)).withColumn(
        "_c4_kept", kept
    )
    d = d.withColumn(text_col, F.array_join("_c4_kept", "\n"))
    cond = (
        (
            F.regexp_count(F.col(text_col), F.lit(r"[.!?]+"))
            >= min_sentences
        )
        & ~F.lower(F.col(text_col)).contains("lorem ipsum")
        & ~F.col(text_col).contains("{")
    )
    if bad_words:
        cond &= ~F.arrays_overlap(
            tokenize(F.col(text_col)),
            F.array(*[F.lit(w.lower()) for w in bad_words]),
        )
    d = d.filter(cond)
    if keep_stats:
        d = d.withColumn(
            "c4_lines_kept", F.size("_c4_kept")
        ).withColumn(
            "c4_lines_dropped", F.col("_c4_nlines") - F.size("_c4_kept")
        )
    return d.drop("_c4_nlines", "_c4_kept")


def boilerplate_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 3,
    min_df: int = 5,
) -> DataFrame:
    """Corpus-level boilerplate detection → (id, n_shingles, n_common,
    boiler_ratio): the fraction of a doc's distinct word-``shingle_size``-
    grams that appear in ≥ ``min_df`` distinct documents. High ratio =
    templated/boilerplate content — a standard pre-training filter
    signal (shingle-df is the corpus-statistics twin of the per-doc
    quality heuristics above).

    Scale shape: explode (map-side) → shingle-keyed count (shuffle 1,
    uniform md5-free keys) → hot-shingle semi-join (same key → shuffle
    reuse under AQE) → per-doc count (shuffle 2, keyed by id). Nothing
    quadratic; the hot-shingle set is df-filtered so its size is
    corpus-vocabulary-bounded, not corpus-bounded.
    """
    sh = F.array_distinct(shingles(tokenize(F.col(text_col)), shingle_size))
    from sifts_spark.caching import track

    base = track(docs.select(F.col(id_col).alias("id"), sh.alias("sh")))
    frag = base.select("id", F.explode("sh").alias("s"))
    common = (
        frag.groupBy("s")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= min_df)
        .select("s")
    )
    n_common = (
        frag.join(common, "s").groupBy("id").agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        base.select("id", F.size("sh").alias("n_shingles"))
        .join(n_common, "id", "left")
        .select(
            "id",
            "n_shingles",
            F.coalesce("n_common", F.lit(0)).alias("n_common"),
            F.round(
                F.coalesce("n_common", F.lit(0))
                / F.greatest(F.col("n_shingles"), F.lit(1)),
                6,
            ).alias("boiler_ratio"),
        )
    )


REPETITION_SCHEMA = (
    "dup_line_frac double, dup_word_frac double, "
    "top_bigram_frac double, dup_trigram_frac double"
)


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc REPETITION signals → (id, dup_line_frac, dup_word_frac,
    top_bigram_frac, dup_trigram_frac), the standard curation filters
    for degenerate/templated/looping text (the Gopher rules family:
    Rae et al. 2021 appendix A; RefinedWeb, Penedo et al. 2023):

    * ``dup_line_frac``   — 1 − distinct(non-empty stripped lines)/lines
      (boilerplate, navigation chrome, copy-paste);
    * ``dup_word_frac``   — 1 − distinct(words)/words;
    * ``top_bigram_frac`` — occurrences of the most frequent word
      bigram / total bigrams (stuck-phrase loops);
    * ``dup_trigram_frac``— 1 − distinct(word trigrams)/trigrams
      (longer-range looping).

    Empty/degenerate inputs yield 0.0 (one word → no bigrams → 0).
    An Arrow kernel by this module's measured crossover rule (counting
    n-gram multiplicities needs a hash map per doc — a JVM HOF twin
    would be an interpreted O(n²) mode computation); one pass per doc,
    map-side, no shuffle. Rounded to 6 dp. Words = the default
    token family's runs on the lowercased text (functions/text.py)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(REPETITION_SCHEMA)
    def _rep(texts: pd.Series) -> pd.DataFrame:
        import re
        from collections import Counter

        rows = []
        word_re = re.compile(TOKEN_MATCH_RE_PY)
        for t in texts:
            if t is None:
                rows.append((0.0, 0.0, 0.0, 0.0))
                continue
            lines = [ln.strip() for ln in t.split("\n") if ln.strip()]
            dl = 1.0 - len(set(lines)) / len(lines) if lines else 0.0
            words = word_re.findall(t.lower())
            dw = 1.0 - len(set(words)) / len(words) if words else 0.0
            bigrams = list(zip(words, words[1:]))
            tb = (
                max(Counter(bigrams).values()) / len(bigrams)
                if bigrams
                else 0.0
            )
            trigrams = list(zip(words, words[1:], words[2:]))
            dt = (
                1.0 - len(set(trigrams)) / len(trigrams) if trigrams else 0.0
            )
            rows.append(
                (round(dl, 6), round(dw, 6), round(tb, 6), round(dt, 6))
            )
        return pd.DataFrame(
            rows,
            columns=[
                "dup_line_frac", "dup_word_frac",
                "top_bigram_frac", "dup_trigram_frac",
            ],
        )

    from sifts_spark.functions.hashing import ensure_min_parallelism

    out = ensure_min_parallelism(
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    )
    return out.select("id", _rep(F.col("_t")).alias("_r")).select(
        "id", "_r.dup_line_frac", "_r.dup_word_frac",
        "_r.top_bigram_frac", "_r.dup_trigram_frac",
    )


# Gopher's full repetition-removal thresholds (Rae et al. 2021,
# app. A1.1 table A1, "repetition removal" rows). A doc passes when
# every signal is <= its threshold.
GOPHER_REPETITION_THRESHOLDS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}

GOPHER_REPETITION_SCHEMA = ", ".join(
    f"{k} double" for k in GOPHER_REPETITION_THRESHOLDS
)


def gopher_repetition(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """Gopher's FULL repetition-removal signal set (Rae et al. 2021
    app. A1.1 — the half of MassiveWeb's filter that
    :func:`gopher_quality` doesn't carry) → per-doc columns for all 13
    signals plus a combined ``gopher_rep_pass``:

    - ``dup_line_frac`` / ``dup_para_frac`` — fraction of lines /
      paragraphs that are repeats of an earlier one (occurrences
      beyond the first, over stripped non-empty elements; paragraphs
      split on blank lines);
    - ``dup_line_char_frac`` / ``dup_para_char_frac`` — characters
      inside those repeated occurrences / document length;
    - ``top_{2,3,4}gram_char_frac`` — characters covered by the most
      frequent word n-gram (count x gram chars) / document length;
      among equally-frequent grams the one covering MOST characters
      wins (the filter-tightest choice; further ties share the same
      count x chars product, so the signal is deterministic);
    - ``dup_{5..10}gram_char_frac`` — characters inside repeated word
      n-grams / document length, counted by one greedy left-to-right
      scan per n that skips over a matched repeat (so overlapping
      repeats never double-count a character).

    ``thresholds`` overrides any subset of
    :data:`GOPHER_REPETITION_THRESHOLDS` (unknown keys raise). Word =
    the default token family's runs on the lowercased text and gram chars = sum of word
    lengths (separators excluded) — the tokenizer family used across
    this module; the char denominator is the RAW text length, floored
    at 1. Empty/None docs score 0 everywhere and PASS — emptiness is
    ``gopher_quality``'s ``min_words`` job, not a repetition signal.

    One Arrow kernel pass per doc (per-doc hash maps put this on the
    Pandas-UDF side of this module's measured crossover rule), map
    side, no shuffle; the 6 dup-n-gram scans are each O(words).
    Recipe stage 0f via ``prepare_training_data(
    gopher_repetition=True)``.
    """
    from pyspark.sql.functions import pandas_udf

    limits = dict(GOPHER_REPETITION_THRESHOLDS)
    if thresholds:
        unknown = set(thresholds) - set(limits)
        if unknown:
            raise ValueError(
                f"unknown repetition thresholds: {sorted(unknown)}"
            )
        limits.update(thresholds)
    keys = list(GOPHER_REPETITION_THRESHOLDS)

    @pandas_udf(GOPHER_REPETITION_SCHEMA)
    def _rep(texts: pd.Series) -> pd.DataFrame:
        import re
        from collections import Counter

        word_re = re.compile(TOKEN_MATCH_RE_PY)
        para_re = re.compile(r"\n\s*\n")

        def dup_fracs(elems: list[str], denom: float):
            seen: set[str] = set()
            n_dup = chars_dup = 0
            for e in elems:
                if e in seen:
                    n_dup += 1
                    chars_dup += len(e)
                else:
                    seen.add(e)
            if not elems:
                return 0.0, 0.0
            return n_dup / len(elems), chars_dup / denom

        def top_gram_chars(words: list[str], n: int) -> int:
            grams = Counter(zip(*(words[i:] for i in range(n))))
            if not grams:
                return 0
            count, chars = max(
                (c, sum(len(w) for w in g)) for g, c in grams.items()
            )
            return count * chars

        def dup_gram_chars(words: list[str], n: int) -> int:
            seen: set[tuple] = set()
            chars = i = 0
            while i <= len(words) - n:
                g = tuple(words[i : i + n])
                if g in seen:
                    chars += sum(len(w) for w in g)
                    i += n
                else:
                    seen.add(g)
                    i += 1
            return chars

        rows = []
        for t in texts:
            if t is None:
                t = ""
            denom = max(len(t), 1)
            lines = [ln.strip() for ln in t.split("\n") if ln.strip()]
            paras = [p.strip() for p in para_re.split(t) if p.strip()]
            dl, dlc = dup_fracs(lines, denom)
            dp, dpc = dup_fracs(paras, denom)
            words = word_re.findall(t.lower())
            sig = [dl, dp, dlc, dpc]
            sig += [top_gram_chars(words, n) / denom for n in (2, 3, 4)]
            sig += [
                dup_gram_chars(words, n) / denom for n in range(5, 11)
            ]
            rows.append([round(s, 6) for s in sig])
        return pd.DataFrame(rows, columns=keys)

    from sifts_spark.functions.hashing import ensure_min_parallelism

    out = ensure_min_parallelism(
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    )
    out = out.select("id", _rep(F.col("_t")).alias("_r")).select(
        "id", *[F.col(f"_r.{k}").alias(k) for k in keys]
    )
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(k) <= F.lit(float(limits[k])))
    return out.withColumn("gopher_rep_pass", cond)


def train_unigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 50_000,
) -> dict:
    """Corpus-level unigram language model → ``{"logprob": {token:
    lp}, "oov_logprob": lp, "total_tokens": n}`` — the model behind
    :func:`perplexity_score`.

    The perplexity-filter idea is CCNet's (Wenzek et al. 2020: score
    web text with a LM trained on a clean reference corpus; keep the
    low-perplexity band). CCNet uses a 5-gram KenLM; a unigram model
    is the Spark-native in-container stand-in — same pipeline shape,
    same filtering semantics, weaker signal (documented, not hidden).

    Distributed shape: ONE explode+groupBy token count (map-side
    combined), TakeOrdered(vocab_size) by frequency — never a global
    sort; the model itself is vocab-sized (~50k floats), collected to
    the driver and closure-broadcast into the scoring kernel.
    Probabilities: p(tok) = count/total over ALL tokens (in- and
    out-of-vocab); the OOV bucket gets the tail mass spread as a
    single pseudo-token: p_oov = max(tail_total, 1)/total — every
    probability is well-defined even for a fully-in-vocab corpus."""
    import math

    toks = docs.select(
        F.explode(tokenize(F.col(text_col))).alias("tok")
    )
    # one corpus scan: the token count persists distinct-token-sized,
    # serving both the vocab cut and the total (a separate
    # toks.count() would tokenize + explode the whole corpus again)
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).persist()
    try:
        top = (
            counts.orderBy(F.col("n").desc(), F.col("tok"))
            .limit(vocab_size)
            .collect()
        )
        total_row = counts.agg(F.sum("n").alias("t")).collect()[0]
    finally:
        counts.unpersist()
    total = total_row["t"] or 0
    if total == 0:
        raise ValueError("cannot train a LM on an empty corpus")
    in_vocab = sum(r["n"] for r in top)
    tail = max(total - in_vocab, 1)
    return {
        "logprob": {r["tok"]: math.log(r["n"] / total) for r in top},
        "oov_logprob": math.log(tail / total),
        "total_tokens": total,
    }


PERPLEXITY_SCHEMA = (
    "n_tokens long, logprob_mean double, perplexity double"
)


def perplexity_score(
    docs: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc unigram LM scoring → (id, n_tokens, logprob_mean,
    perplexity) with perplexity = exp(−mean logprob); empty docs score
    (0, 0.0, inf is avoided: perplexity NULL).

    Curation usage (CCNet): bucket the corpus by perplexity terciles;
    the middle band is typically the keep set — the low tail is
    degenerate/repetitive (the LM's own training mass), the high tail
    is noise/code/other-language. Map-side Arrow kernel; the model
    ships as a ``SparkContext.broadcast`` (sent to each executor ONCE,
    torrent-distributed) instead of riding the UDF closure, which
    would re-serialize the vocab-sized dict into every task binary —
    measured: the default 50k-entry LM pickles to ~1.3 MB, so closure
    shipping inflates every task of every stage using the UDF by that
    much, while the broadcast pays it once per executor. Scoring is
    one scan, no shuffle, no join."""
    from pyspark.sql.functions import pandas_udf

    bc_model = docs.sparkSession.sparkContext.broadcast(
        {"lp": model["logprob"], "oov": model["oov_logprob"]}
    )

    @pandas_udf(PERPLEXITY_SCHEMA)
    def _ppl(texts: pd.Series) -> pd.DataFrame:
        import math
        import re

        lp = bc_model.value["lp"]
        oov = bc_model.value["oov"]
        word_re = re.compile(TOKEN_MATCH_RE_PY)
        rows = []
        for t in texts:
            words = word_re.findall(t.lower()) if t else []
            if not words:
                rows.append((0, 0.0, None))
                continue
            s = sum(lp.get(w, oov) for w in words)
            mean = s / len(words)
            rows.append((len(words), round(mean, 6), round(math.exp(-mean), 6)))
        return pd.DataFrame(rows, columns=["n_tokens", "logprob_mean", "perplexity"])

    from sifts_spark.functions.hashing import ensure_min_parallelism

    out = ensure_min_parallelism(
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    )
    return out.select("id", _ppl(F.col("_t")).alias("_p")).select(
        "id", "_p.n_tokens", "_p.logprob_mean", "_p.perplexity"
    )


def _gram_hash64(gram: str) -> int:
    """Stable 64-bit gram hash (blake2b-8, signed) — shared by the
    driver-side eval grams and the Arrow corpus kernel, so the join
    key is identical by construction on both sides."""
    import hashlib

    return int.from_bytes(
        hashlib.blake2b(gram.encode(), digest_size=8).digest(),
        "big", signed=True,
    )


def find_contaminated(
    docs: DataFrame,
    eval_texts: list[str] | DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    impl: str = "arrow",
) -> DataFrame:
    """Benchmark decontamination: training docs sharing ANY word
    ``n``-gram with an eval set → (id, n_hits, sample_ngram).

    The n-gram-overlap test is the published method (GPT-3, Brown et
    al. 2020 appendix C uses 13-grams; PaLM, Chowdhery et al. 2022
    §7). Eval items SHORTER than ``n`` tokens are matched by their
    full token string (a contained QA answer still flags its host
    doc): the eval set is collected driver-side — benchmark-sized by
    definition — its grams computed per-item at ``min(n, item_len)``.
    Tokenization is the default lowercase token family on
    BOTH sides (contamination checks must share one normalization or
    they silently under-detect).

    ``impl="arrow"`` (default): one Arrow kernel emits 64-bit gram
    HASHES per doc (blake2b-8 — same function hashes the eval grams
    driver-side), explode + broadcast semi-join on longs; 15×
    faster than the HOF path at the 10× corpus (46.6s → 3.0s,
    measured, identical (id, n_hits)) because the JVM path pays an
    interpreted slice + array_join per gram position and shuffles
    gram STRINGS. ``sample_ngram`` is recovered from
    the driver-side hash→gram dict — the matching gram is an eval
    gram by definition. Collision risk: |corpus grams| × |eval grams|
    / 2^64 (~1e-9 at 4M × 10k) — a collision could false-flag one
    doc; rerun suspects with ``impl="hof"`` (string-equality grams)
    to confirm if that matters.

    Returns one row per contaminated doc; docs with zero overlap are
    absent (decontaminate with a left_anti on the result)."""
    import re as _re

    if isinstance(eval_texts, DataFrame):
        eval_texts = [r[eval_text_col] for r in eval_texts.collect()]
    word_re = _re.compile(TOKEN_MATCH_RE_PY)
    by_len: dict[int, set[str]] = {}
    for t in eval_texts:
        toks = word_re.findall((t or "").lower())
        if not toks:
            continue
        m = min(n, len(toks))
        grams = by_len.setdefault(m, set())
        for i in range(len(toks) - m + 1):
            grams.add(" ".join(toks[i : i + m]))
    if not by_len:
        raise ValueError("eval set has no tokens")
    spark = docs.sparkSession

    if impl == "arrow":
        from pyspark.sql.functions import pandas_udf

        sizes = sorted(by_len)
        # hash_to_gram stays DRIVER-side (map literal below / broadcast
        # lut): the UDF closure captures only `sizes` (a handful of
        # ints), so task binaries stay small no matter the eval set.
        hash_to_gram = {
            _gram_hash64(g): g for grams in by_len.values() for g in grams
        }

        @pandas_udf("array<long>")
        def _gram_hashes(texts: pd.Series) -> pd.Series:
            import hashlib
            import re

            wre = re.compile(TOKEN_MATCH_RE_PY)
            out = []
            for t in texts:
                toks = wre.findall(t.lower()) if t else []
                hs = []
                for m in sizes:
                    if len(toks) >= m:
                        hs.extend(
                            int.from_bytes(
                                hashlib.blake2b(
                                    " ".join(toks[i : i + m]).encode(),
                                    digest_size=8,
                                ).digest(), "big", signed=True)
                            for i in range(len(toks) - m + 1)
                        )
                    elif toks:
                        hs.append(
                            int.from_bytes(
                                hashlib.blake2b(
                                    " ".join(toks).encode(), digest_size=8
                                ).digest(), "big", signed=True))
                out.append(hs)
            return pd.Series(out)

        from sifts_spark.functions.hashing import ensure_min_parallelism

        doc_grams = ensure_min_parallelism(
            docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
        ).select(
            "id", F.explode(_gram_hashes(F.col("_t"))).alias("gh")
        )
        ev = spark.createDataFrame(
            [(h,) for h in hash_to_gram], "gh long"
        )
        hits = doc_grams.join(F.broadcast(ev), "gh")
        agg = hits.groupBy("id").agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.min("gh").alias("_gh"),
        )
        to_gram = F.create_map(
            *[x for h, g in sorted(hash_to_gram.items())
              for x in (F.lit(h), F.lit(g))]
        ) if len(hash_to_gram) <= 2000 else None
        if to_gram is not None:
            return agg.select(
                "id", "n_hits", to_gram[F.col("_gh")].alias("sample_ngram")
            )
        # huge eval sets: map literal would bloat the plan — resolve
        # the sample gram with a second broadcast join instead
        lut = spark.createDataFrame(
            list(hash_to_gram.items()), "_gh long, sample_ngram string"
        )
        return agg.join(F.broadcast(lut), "_gh").select(
            "id", "n_hits", "sample_ngram"
        )

    toks = tokenize(F.col(text_col))
    doc_grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.flatten(F.array(*[shingles(toks, m) for m in sorted(by_len)]))
        ).alias("gram"),
    )
    ev = spark.createDataFrame(
        [(g,) for grams in by_len.values() for g in grams], "gram string"
    )
    hits = doc_grams.join(F.broadcast(ev), "gram")
    return hits.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min("gram").alias("sample_ngram"),
    )


def train_hashed_ngram_lm(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 2,
    num_buckets: int = 1 << 20,
    alpha: float = 1.0,
) -> dict:
    """Hashed n-gram language model → ``{"kind": "hashed_ngram_lm",
    "n", "num_buckets", "logprob" (num_buckets float32 bytes),
    "total_ngrams"}`` — DSIR's ACTUAL feature space (Xie et al. 2023
    §2.2 use hashed bigrams; :func:`train_unigram_lm` is the weaker
    word-level stand-in). The hashing trick caps the model at
    ``num_buckets`` floats regardless of corpus vocabulary, which is
    what makes it broadcastable: the default 2^20 buckets is a 4 MiB
    float32 array, shipped once per executor.

    Probabilities are add-``alpha`` smoothed over buckets:
    ``p(b) = (count_b + alpha) / (total + alpha·num_buckets)`` — every
    bucket (hence every possible n-gram) has nonzero mass, so the
    importance log-ratio is always finite. Buckets are md5-derived
    (engine-independent, replayable).

    Distributed shape: ONE Arrow gram-bucket kernel (the
    find_contaminated lesson — per-gram md5 through interpreted JVM
    transform/conv expressions measured 8× slower at the 10× corpus)
    → explode → groupBy whose cardinality is bounded by
    ``num_buckets`` (map-side combine does the heavy lifting — the
    shuffle carries at most num_buckets rows per partition), then a
    bounded driver collect. The corpus is never collected; training
    cost is one scan regardless of scale."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def _buckets(texts: pd.Series) -> pd.Series:
        cache: dict = {}  # per-batch md5 memo (Zipf: most grams repeat)
        return pd.Series(
            [_py_gram_buckets(t, n, num_buckets, cache) for t in texts]
        )

    from sifts_spark.functions.hashing import ensure_min_parallelism

    counts = (
        ensure_min_parallelism(docs.select(F.col(text_col).alias("_t")))
        .select(F.explode(_buckets(F.col("_t"))).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    arr = np.zeros(num_buckets, dtype=np.int64)
    for r in counts:
        arr[r["b"]] = r["c"]
    total = int(arr.sum())
    if total == 0:
        raise ValueError(f"corpus has no {n}-grams to train on")
    lp = np.log((arr + alpha) / (total + alpha * num_buckets)).astype("<f4")
    return {
        "kind": "hashed_ngram_lm",
        "n": n,
        "num_buckets": num_buckets,
        "logprob": lp.tobytes(),
        "total_ngrams": total,
    }


def _py_gram_buckets(
    text: str, n: int, num_buckets: int, cache: dict | None = None
) -> "list[int]":
    """Bucket of each token n-gram: md5 first-8-hex (= first 4 digest
    bytes big-endian) of the space-joined gram, mod num_buckets —
    engine-replayable (DuckDB twin: ``('0x' || substr(md5(g),1,8))::
    UBIGINT % nb``, the dsir_weights catalog oracle).

    ``cache`` (gram → bucket) memoizes the md5 across calls: natural
    corpora are Zipfian, so a per-Arrow-batch dict turns the hot grams
    into dict hits — measured 2.8× on the sf1 corpus (kernel callers
    pass one dict per batch; growth is bounded by a batch's distinct
    grams)."""
    import hashlib
    import re

    toks = re.findall(TOKEN_MATCH_RE_PY, (text or "").lower())
    if len(toks) < n:
        return []
    if cache is None:
        cache = {}
    out = []
    for i in range(len(toks) - n + 1):
        g = " ".join(toks[i:i + n])
        b = cache.get(g)
        if b is None:
            b = (
                int.from_bytes(hashlib.md5(g.encode()).digest()[:4], "big")
                % num_buckets
            )
            cache[g] = b
        out.append(b)
    return out


def hashed_lm_score(
    docs: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc mean log-likelihood under a hashed n-gram LM →
    ``(id, n_ngrams, logprob_mean)`` (docs shorter than n tokens score
    NULL). The model array rides a broadcast; scoring is one Arrow
    scan, numpy fancy-indexing per batch — no shuffle, no join."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    n, nb = int(model["n"]), int(model["num_buckets"])
    bc = docs.sparkSession.sparkContext.broadcast(
        np.frombuffer(model["logprob"], dtype="<f4")
    )

    @pandas_udf("n_ngrams long, logprob_mean double")
    def _score(texts: pd.Series) -> pd.DataFrame:
        lp = bc.value
        rows = []
        cache: dict = {}
        for t in texts:
            bs = _py_gram_buckets(t, n, nb, cache)
            if not bs:
                rows.append((0, None))
                continue
            m = float(lp[np.asarray(bs, dtype=np.int64)].sum()) / len(bs)
            rows.append((len(bs), round(m, 6)))
        return pd.DataFrame(rows, columns=["n_ngrams", "logprob_mean"])

    from sifts_spark.functions.hashing import ensure_min_parallelism

    base = ensure_min_parallelism(
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    )
    return base.select("id", _score(F.col("_t")).alias("_o")).select(
        "id", "_o.n_ngrams", "_o.logprob_mean"
    )


# ------------------------------------------------------------------
# Trainable language ID (fastText-grade; r11 verdict item 3)
# ------------------------------------------------------------------
#
# The marker lexicon above (language_id) is the zero-setup default: 5
# Latin-script languages, function-word hits. Real curation pipelines
# (CCNet, RefinedWeb) run fastText lid.176-class models — a linear
# softmax over hashed character n-grams (Joulin et al. 2016; the
# langid.py / CLD2 family uses the same feature class). The pair below
# is that architecture on this engine's deterministic-hashing terms:
#
# * train_langid — per-language deterministic samples (md5-order, the
#   train_quality_classifier recipe) collected driver-side, softmax
#   regression on hashed char 1-3-gram features; model = (L, dim)
#   float32 matrix, broadcast-sized (L=20, dim=2^13 → 640 KiB).
# * langid_score — one Arrow scan, numpy batch matmul, no shuffle.
#
# Char n-grams (not word markers) carry orthography: accents, digraph
# statistics, and SCRIPT (any CJK/Cyrillic/Greek codepoint n-gram is
# language-evidence on its own), so coverage scales with training
# labels, not with curated lexicons. Feature hashing is a vectorized
# polynomial rolling hash over codepoints (uint64 wraparound —
# platform-independent, rerun-stable; documented deviation from the
# module's md5 contract: langid featurizes ~10^3 grams/doc, where
# per-gram md5 measured ~8x slower than the numpy path and the hash
# never needs a SQL oracle replay — accuracy tests pin behavior
# instead).

_LANGID_P = np.uint64(1099511628211)  # FNV-64 prime as the poly base
_LANGID_SALT = (np.uint64(0xA5A5A5A5A5A5A5A5), np.uint64(0x5A5A5A5A5A5A5A5A),
                np.uint64(0xC3C3C3C3C3C3C3C3))


def _langid_features(texts, dim: int, max_chars: int = 400) -> "np.ndarray":
    """(n_docs, dim) L1-normalized hashed char-{1,2,3}-gram counts.
    ``max_chars`` caps the scan — language identity saturates within a
    few hundred characters (fastText's own truncation posture), and the
    cap bounds per-doc cost on 100 MB outliers."""
    X = np.zeros((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        t = " ".join((t or "").lower().split())[:max_chars]
        if not t:
            continue
        cp = np.fromiter(map(ord, t), dtype=np.uint64, count=len(t))
        bufs = []
        for n in (1, 2, 3):
            if len(cp) < n:
                break
            h = cp[: len(cp) - n + 1].copy()
            for j in range(1, n):
                h = h * _LANGID_P + cp[j: len(cp) - n + 1 + j]
            bufs.append((h ^ _LANGID_SALT[n - 1]) % np.uint64(dim))
        if not bufs:
            continue
        idx = np.concatenate(bufs).astype(np.int64)
        np.add.at(X[i], idx, np.float32(1.0))
        X[i] /= np.float32(len(idx))
    return X


def train_langid(
    labeled: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    dim: int = 2**13,
    sample_per_lang: int = 1000,
    max_chars: int = 400,
    epochs: int = 80,
    lr: float = 8.0,
    l2: float = 1e-5,
) -> dict:
    """Train the hashed-char-n-gram softmax language classifier →
    ``{"kind": "langid_softmax", "dim", "max_chars", "langs",
    "weights", "bias"}`` — persistable via
    :mod:`sifts_spark.functions.artifacts` (bytes hex-encode).

    Distributed shape: one TakeOrdered(sample_per_lang) job per
    observed language (md5-of-text order — an unbiased, rerun-stable
    permutation, the train_quality_classifier recipe); the corpus is
    never collected. The fit is full-batch softmax regression in numpy
    on the (langs*sample, dim) sample matrix."""
    langs = sorted(
        r["_l"]
        for r in labeled.select(F.col(lang_col).alias("_l"))
        .filter(F.col(lang_col).isNotNull())
        .distinct()
        .collect()
    )
    if len(langs) < 2:
        raise ValueError(f"need >=2 labeled languages, got {langs}")
    texts: list[str] = []
    y: list[int] = []
    for k, lang in enumerate(langs):
        # substring BEFORE collect: only the first max_chars are ever
        # featurized, and shipping full 100 MB outlier docs to the
        # driver is exactly the hazard the cap exists for (md5 sample
        # order stays on the full text, so the draw is unchanged)
        rows = (
            labeled.filter(F.col(lang_col) == lang)
            .select(
                F.substring(F.col(text_col), 1, int(max_chars)).alias("_t"),
                F.md5(F.col(text_col)).alias("_h"),
            )
            .filter(F.col("_t").isNotNull() & (F.length("_t") > 0))
            .orderBy("_h", "_t")
            .limit(sample_per_lang)
            .collect()
        )
        texts.extend(r["_t"] for r in rows)
        y.extend([k] * len(rows))
        if not rows:
            raise ValueError(f"language {lang!r} has no non-empty docs")
    X = _langid_features(texts, dim, max_chars)
    Y = np.asarray(y, dtype=np.int64)
    L, n = len(langs), len(Y)
    W = np.zeros((L, dim), dtype=np.float32)
    b = np.zeros(L, dtype=np.float32)
    onehot = np.zeros((n, L), dtype=np.float32)
    onehot[np.arange(n), Y] = 1.0
    for _ in range(epochs):
        Z = X @ W.T + b
        Z -= Z.max(axis=1, keepdims=True)
        P = np.exp(Z)
        P /= P.sum(axis=1, keepdims=True)
        G = (P - onehot) / n  # (n, L)
        W -= lr * (G.T @ X + l2 * W)
        b -= lr * G.sum(axis=0)
    return {
        "kind": "langid_softmax",
        "dim": dim,
        "max_chars": max_chars,
        "langs": langs,
        "weights": W.astype("<f4").tobytes(),
        "bias": b.astype("<f4").tobytes(),
    }


# Weight-matrix broadcasts memoized per (application, model content) —
# the bpe.py _BC_CACHE posture: without it every langid_score call in a
# bench loop / long-lived pipeline ships a fresh broadcast that is
# never unpersisted. release_all() drains via the registered hook.
_LANGID_BC_CACHE: dict = {}


def _langid_broadcast(sess, model: dict):
    import hashlib

    key = (
        sess.sparkContext.applicationId,
        hashlib.md5(model["weights"] + model["bias"]).hexdigest(),
    )
    bc = _LANGID_BC_CACHE.get(key)
    if bc is None:
        L, dim = len(model["langs"]), int(model["dim"])
        bc = sess.sparkContext.broadcast(
            (
                np.frombuffer(model["weights"], dtype="<f4")
                .reshape(L, dim)
                .copy(),
                np.frombuffer(model["bias"], dtype="<f4").copy(),
            )
        )
        _LANGID_BC_CACHE[key] = bc
    return bc


def release_langid_broadcasts() -> int:
    """Unpersist every cached langid weight broadcast; returns the
    count (registered with :func:`sifts_spark.caching.release_all`)."""
    released = 0
    for bc in _LANGID_BC_CACHE.values():
        try:
            bc.unpersist(blocking=False)
            released += 1
        except Exception:
            pass
    _LANGID_BC_CACHE.clear()
    return released


from sifts_spark.caching import register_release_hook  # noqa: E402

register_release_hook(release_langid_broadcasts)


def langid_score(
    docs: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every doc with a :func:`train_langid` model →
    ``(id, pred_lang, lang_prob)`` (softmax argmax + its probability;
    empty/NULL text → 'und', prob NULL). Map-side Arrow kernel: the
    (L, dim) weight matrix rides ONE memoized SparkContext broadcast
    per (session, model) — repeated calls reuse it, ``release_all``
    frees it; scoring is a numpy batch matmul — one scan, no shuffle,
    the 1000-executor shape."""
    from pyspark.sql.functions import pandas_udf

    dim, max_chars = int(model["dim"]), int(model["max_chars"])
    langs = list(model["langs"])
    bc = _langid_broadcast(docs.sparkSession, model)

    @pandas_udf("pred_lang string, lang_prob double")
    def _score(texts: pd.Series) -> pd.DataFrame:
        W, bias = bc.value
        X = _langid_features(list(texts), dim, max_chars)
        Z = X @ W.T + bias
        Z -= Z.max(axis=1, keepdims=True)
        P = np.exp(Z)
        P /= P.sum(axis=1, keepdims=True)
        best = P.argmax(axis=1)
        out = []
        for i, t in enumerate(texts):
            if not (t or "").strip():
                out.append(("und", None))
            else:
                out.append((langs[int(best[i])], round(float(P[i, best[i]]), 6)))
        return pd.DataFrame(out, columns=["pred_lang", "lang_prob"])

    from sifts_spark.functions.hashing import ensure_min_parallelism

    base = ensure_min_parallelism(
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    )
    return base.select("id", _score(F.col("_t")).alias("_o")).select(
        "id", "_o.pred_lang", "_o.lang_prob"
    )
