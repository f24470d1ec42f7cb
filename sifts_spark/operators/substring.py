"""Exact-substring (duplicated-span) deduplication.

Extension beyond the reference surface (SURVEY.md §2.6): the
ExactSubstr family of Lee et al. 2021 ("Deduplicating Training Data
Makes Language Models Better") — find runs of >= ~50 tokens that occur
verbatim in more than one document and cut every copy but the first
out of the text. Doc-level dedup (operators/dedup.py) misses these:
two distinct articles quoting the same license header, terms-of-service
block, or wire-story paragraph are NOT near-duplicate documents, yet a
model trained on the corpus sees the shared run thousands of times.

Lee et al. build a monolithic suffix array — inherently single-machine
(their 100 GB+ RAM posture). The distributed re-expression here is
WINNOWING (Schleimer, Wilkerson & Aiken 2003, the MOSS fingerprinter):

* per doc, map-side: hash every k-token gram (rolling polynomial over
  per-token md5 hashes), then slide a w-gram window and select each
  window's minimal hash (rightmost on ties). Schleimer's guarantee:
  any shared run of >= t = w + k - 1 tokens contains a full window of
  w k-grams on identical content, whose minimum is selected in BOTH
  copies — so every sufficiently long duplicated span shares at least
  one fingerprint, with only ~n/w fingerprints emitted per doc.
  (That is the cheap DETECTION mode; span CUTTING uses mode="exact" —
  every gram, one per token — so merged intervals cover duplicated
  runs end-to-end at ExactSubstr resolution. See duplicate_spans /
  remove_duplicate_spans docstrings for the trade.)
* one fingerprint-keyed shuffle marks duplicated fingerprints
  (min(id) != max(id) over the fp partition — constant-size state, no
  collect_set blowup on boilerplate fingerprints shared by millions of
  docs) and picks the corpus-wide first occurrence (min struct(id,
  start)) that keep-first mode preserves.
* one id-keyed groupBy merges the surviving spans per doc (sorted
  interval union via F.aggregate — JVM-side, no second Python pass).

Scale shape at 100 TB: one corpus scan through an Arrow kernel, one
uniform 64-bit-keyed shuffle, one id-keyed groupBy. Nothing is
pairwise: a fingerprint shared by a million docs costs a million-row
partition aggregated with constant-size state, never a million² join.

Determinism: token hashes are md5-derived and the rolling hash uses a
fixed base, so reruns are bit-stable. Offsets index the ORIGINAL text:
tokens are ASCII-alphanumeric runs located with ``re.finditer`` on the
raw string (the Python twin of functions/text.tokenize lowercases
after splitting, which for ASCII yields identical tokens; exotic
case-folding characters that change length under lower() are treated
as delimiters either way).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from sifts_spark.functions.hashing import ensure_min_parallelism

from sifts_spark.functions.text import TOKEN_MATCH_RE_PY

# any-script token runs, original case kept (tokens are lowercased at
# hash time in _token_hash) — [^\W_]+ is case-insensitive by nature
_TOKEN_RE = re.compile(TOKEN_MATCH_RE_PY)
# Rolling-hash base: odd 64-bit constant (first 16 hex digits of the
# md5 of "sifts-spark-winnow"); arithmetic wraps mod 2^64 via uint64.
_ROLL_BASE = np.uint64(int(hashlib.md5(b"sifts-spark-winnow").hexdigest()[:16], 16) | 1)


def _token_hash(tok: str, cache: dict) -> np.uint64:
    h = cache.get(tok)
    if h is None:
        h = np.uint64(
            int.from_bytes(hashlib.md5(tok.lower().encode()).digest()[:8], "big")
        )
        cache[tok] = h
    return h


def winnow_fingerprints_arrow(
    text_col: Column, k: int = 50, w: int = 10, mode: str = "winnow"
) -> Column:
    """text -> STRUCT<fp ARRAY<BIGINT>, start ARRAY<INT>, end
    ARRAY<INT>> (parallel arrays — i-th fingerprint spans chars
    [start[i], end[i]) of the original text): k-token gram
    fingerprints. COLUMNAR on purpose: the exact mode emits one entry
    per token, and returning parallel numpy-built lists costs half of
    what a per-entry Python struct-dict build does (measured 8.7s →
    4.5s for the kernel+explode stage at the 10× corpus); callers
    re-assemble rows JVM-side with ``arrays_zip`` + ``explode``.

    ``mode="winnow"`` selects each w-window's minimal hash (~n/w
    fingerprints per doc — the cheap DETECTION mode); ``mode="exact"``
    emits EVERY gram (one per token — the SURGICAL mode: inside a
    shared run every window is duplicated, so the merged interval
    covers the run end-to-end, which is what a span CUT needs; winnowed
    anchors leave up to w+k-2 tokens of duplicated margin around each
    selected window).

    A doc with fewer than ``k`` tokens emits an empty array (it cannot
    contain a k-token duplicate); in winnow mode a doc with fewer than
    ``k + w - 1`` grams emits the single global-minimum gram
    (degenerate one-window winnowing). Rightmost-minimum tie-breaking
    per Schleimer §4 — selection depends only on window content, which
    is what makes the same fingerprint fire in both copies of a shared
    run.
    """
    if mode not in ("winnow", "exact"):
        raise ValueError(f"mode must be 'winnow' or 'exact', got {mode!r}")
    exact = mode == "exact"

    @pandas_udf("struct<fp: array<bigint>, start: array<int>, end: array<int>>")
    def _fps(texts: pd.Series) -> pd.DataFrame:
        out_fp, out_s, out_e = [], [], []
        cache: dict = {}
        # weights[j] = base^(k-1-j) mod 2^64 — the k-gram hash is then
        # one vectorized windowed dot product (wrap-mod-2^64 by uint64
        # arithmetic), no per-gram Python loop.
        weights = np.empty(k, dtype=np.uint64)
        acc, b = 1, int(_ROLL_BASE)  # python-int pow loop: wrap without
        for j in range(k - 1, -1, -1):  # numpy's scalar-overflow warning
            weights[j] = np.uint64(acc)
            acc = (acc * b) & 0xFFFFFFFFFFFFFFFF
        def _empty():
            out_fp.append([])
            out_s.append([])
            out_e.append([])

        for text in texts:
            if not text:
                _empty()
                continue
            starts, ends, hashes = [], [], []
            for m in _TOKEN_RE.finditer(text):
                starts.append(m.start())
                ends.append(m.end())
                hashes.append(_token_hash(m.group(), cache))
            n = len(hashes)
            if n < k:
                _empty()
                continue
            t = np.array(hashes, dtype=np.uint64)
            ng = n - k + 1
            win_t = np.lib.stride_tricks.sliding_window_view(t, k)
            # the view is free but (view * weights) materializes a
            # block×k temp — chunk it so a million-token doc costs
            # ~25 MB transient instead of ~n*k*8 bytes at once
            g = np.empty(ng, dtype=np.uint64)
            for lo in range(0, ng, 65536):
                hi = min(lo + 65536, ng)
                g[lo:hi] = (win_t[lo:hi] * weights).sum(axis=1, dtype=np.uint64)
            if exact:
                sel = np.arange(ng)
            elif ng <= w:
                sel = np.array([ng - 1 - int(np.argmin(g[::-1]))])
            else:
                win = np.lib.stride_tricks.sliding_window_view(g, w)
                # rightmost min per window: argmin over the reversed
                # window, mapped back
                rev = win[:, ::-1]
                idx = (w - 1 - rev.argmin(axis=1)) + np.arange(ng - w + 1)
                sel = np.unique(idx)
            out_fp.append(g[sel].view(np.int64).tolist())
            sa = np.asarray(starts, dtype=np.int64)
            ea = np.asarray(ends, dtype=np.int64)
            out_s.append(sa[sel].tolist())
            out_e.append(ea[sel + k - 1].tolist())
        return pd.DataFrame({"fp": out_fp, "start": out_s, "end": out_e})

    return _fps(text_col)


def duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    w: int = 10,
    keep_first: bool = True,
    within_doc: bool = False,
    mode: str = "winnow",
) -> DataFrame:
    """Merged duplicated char spans per doc: ``(id, spans
    ARRAY<STRUCT<start, end>>, n_spans, dup_chars)`` — only docs with
    >= 1 removable span appear.

    Detection guarantee: in ``mode="winnow"`` (default — the cheap
    reporting mode, ~n/w fingerprints per doc) every verbatim run of
    at least ``w + k - 1`` tokens shared across docs (or repeated
    within one doc, with ``within_doc=True``) is caught, but the
    reported span covers only the selected windows — up to w+k-2
    tokens of duplicated margin around them go unreported. In
    ``mode="exact"`` (one fingerprint per token — ExactSubstr
    resolution) every run of at least ``k`` tokens is caught AND the
    span covers it end-to-end. ``keep_first=True`` exempts the
    corpus-wide first occurrence (lowest ``(id, start)``) of each
    fingerprint, Lee et al.'s keep-one policy; ``False`` marks every
    copy (their strict cut-all mode).

    keep_first overlap exemption (r8 — previously documented-only):
    the per-fingerprint exemption alone is not enough when two
    duplicated runs OVERLAP inside one doc and their corpus-wide first
    occurrences live in different docs — removable grams of one run
    can land inside the other run's first-occurrence chars, so the
    merged interval would cut part of a "protected" first copy (in the
    worst case a run would lose every copy corpus-wide). Defense: any
    merged removable interval that overlaps a first-occurrence gram of
    the SAME doc is exempted from the result entirely, so protected
    chars are never cut and "first copy survives corpus-wide" is
    absolute. The trade is deliberate under-cutting: the exempted
    interval's non-protected duplicated chars also survive (a second
    pass could re-shrink them, but the interval and the exemption are
    mutually recursive — Lee et al.'s cut-all mode via
    ``keep_first=False`` remains the strict option). Both interval
    sets ride the SAME id-keyed groupBy, so the defense adds no
    shuffle.
    """
    fps = (
        ensure_min_parallelism(
            docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
        )
        .select("id", winnow_fingerprints_arrow(F.col("_t"), k, w, mode).alias("z"))
        .select(
            "id",
            F.explode(
                F.arrays_zip(
                    F.col("z.fp").alias("fp"),
                    F.col("z.start").alias("start"),
                    F.col("z.end").alias("end"),
                )
            ).alias("s"),
        )
        .select("id", F.col("s.fp").alias("fp"), F.col("s.start").alias("start"),
                F.col("s.end").alias("end"))
    )
    wfp = Window.partitionBy("fp")
    # duplicated-fp predicate with constant-size window state
    dup = (
        (F.min("id").over(wfp) != F.max("id").over(wfp))
        if not within_doc
        else (F.count(F.lit(1)).over(wfp) > 1)
    )
    marked = fps.withColumn("_dup", dup).withColumn(
        "_win", F.min(F.struct("id", "start")).over(wfp)
    )
    # Corpus-wide-first grams are PROTECTED (keep_first); every other
    # duplicated gram is removable. Both sets ride one groupBy(id).
    flagged = marked.filter(F.col("_dup")).withColumn(
        "_prot",
        F.lit(keep_first)
        & (F.col("id") == F.col("_win.id"))
        & (F.col("start") == F.col("_win.start")),
    )

    def _merge_fold(col: Column) -> Column:
        # sorted interval union: fold-merge overlaps (JVM HOF)
        return F.aggregate(
            F.array_sort(col),
            F.array().cast("array<struct<start: int, end: int>>"),
            lambda acc, x: F.when(
                (F.size(acc) == 0)
                | (x["start"] > F.element_at(acc, -1)["end"]),
                F.concat(acc, F.array(x)),
            ).otherwise(
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(
                        F.struct(
                            F.element_at(acc, -1)["start"].alias("start"),
                            F.greatest(
                                F.element_at(acc, -1)["end"], x["end"]
                            ).alias("end"),
                        )
                    ),
                )
            ),
        )

    per_doc = flagged.groupBy("id").agg(
        _merge_fold(
            F.collect_list(F.when(~F.col("_prot"), F.struct("start", "end")))
        ).alias("_rm"),
        _merge_fold(
            F.collect_list(F.when(F.col("_prot"), F.struct("start", "end")))
        ).alias("_pr"),
    )
    # keep_first overlap exemption (docstring): a merged removable
    # interval overlapping ANY protected first-occurrence chars of this
    # doc is not cut at all — protecting the first copy absolutely.
    spans = F.filter(
        F.col("_rm"),
        lambda s: ~F.exists(
            F.col("_pr"),
            lambda p: (p["start"] < s["end"]) & (p["end"] > s["start"]),
        ),
    )
    return (
        per_doc.select("id", spans.alias("spans"))
        .filter(F.size("spans") > 0)
        .select(
            "id",
            "spans",
            F.size("spans").cast("int").alias("n_spans"),
            F.aggregate(
                "spans", F.lit(0), lambda a, s: a + (s["end"] - s["start"])
            ).cast("long").alias("dup_chars"),
        )
    )


def remove_duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    w: int = 10,
    keep_first: bool = True,
    within_doc: bool = False,
    mode: str = "exact",
) -> DataFrame:
    """Cut every duplicated span (per :func:`duplicate_spans`) out of
    the text → one row per INPUT doc: ``(id, text, removed_chars,
    n_spans_removed)``. Docs without duplicated spans pass through
    verbatim. The cut is char-exact on the original string (token-
    aligned span boundaries), stitched with one JVM fold — no second
    Python pass over the corpus.

    Default ``mode="exact"`` (unlike :func:`duplicate_spans`): a CUT
    needs full-run coverage — winnowed anchors would leave duplicated
    margins in the surviving text. The exact mode emits one
    fingerprint per token; at the 100 TB scale that is a token-count-
    sized shuffle, the inherent cost of ExactSubstr (Lee et al.'s
    suffix array is likewise O(corpus tokens)) — run it as the batch
    compaction stage it is, and use winnow mode for cheap reporting.
    """
    spans = duplicate_spans(
        docs, id_col, text_col, k=k, w=w, keep_first=keep_first,
        within_doc=within_doc, mode=mode,
    )
    base = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    joined = base.join(spans, "id", "left")
    txt = F.coalesce(F.col("_t"), F.lit(""))
    stitched = F.aggregate(
        F.col("spans"),
        F.struct(F.lit(0).alias("cur"), F.lit("").alias("out")),
        lambda acc, s: F.struct(
            s["end"].alias("cur"),
            F.concat(
                acc["out"], txt.substr(acc["cur"] + 1, s["start"] - acc["cur"])
            ).alias("out"),
        ),
        lambda acc: F.concat(
            acc["out"], txt.substr(acc["cur"] + 1, F.length(txt) - acc["cur"])
        ),
    )
    return joined.select(
        "id",
        F.when(F.col("spans").isNull(), F.col("_t"))
        .otherwise(stitched)
        .alias("text"),
        F.coalesce(F.col("dup_chars"), F.lit(0)).cast("long").alias("removed_chars"),
        F.coalesce(F.col("n_spans"), F.lit(0)).cast("int").alias("n_spans_removed"),
    )
