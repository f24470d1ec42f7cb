"""Vectorized sketch kernels: Arrow-batched pandas_udf twins of the
higher-order-function MinHash / SimHash expressions in operators/dedup.

Why these exist (bench-driven): Spark evaluates higher-order functions
(``transform``/``aggregate`` lambdas) in an interpreted per-element loop
— correct and map-side, but md5-per-shingle x 16 hash functions burned
~1.4 ms/doc at sf0.1 (47% of the round-1 bench). The kernels below
compute THE SAME md5-derived values (bit-for-bit: the DuckDB correctness
oracle replays them unchanged) inside one Arrow batch per partition —
hashlib's C md5 plus numpy bit math, no per-element interpreter round
trips. Both paths stay available: ``impl="arrow"`` (default, fast) and
``impl="hof"`` (pure-JVM expression, zero Python in the plan).

Scale shape is unchanged: one narrow map-side pass per document, no
shuffle, Arrow transfer is one batch per partition — exactly the
"UDFs are the slow path; when you must, Arrow-batched pandas UDFs"
posture. The per-doc payload (token/shingle arrays) is already needed
by the sketch; nothing extra crosses the JVM<->Python boundary.
"""

from __future__ import annotations

import os
from hashlib import md5

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# THE canonical Python twin of functions.text.tokenize — re-exported
# here for the Arrow kernels (and bpe/classifier, which import it from
# this module); one implementation, not two to keep in sync (r14
# review). `re`'s internal pattern cache makes the per-call compile a
# dict hit, so the old module-level precompile bought nothing.
from sifts_spark.functions.text import py_tokenize as _py_tokenize


def _py_shingles(toks: list[str], n: int) -> list[str]:
    """Python twin of functions.text.shingles (distinct set; zero
    tokens → zero shingles, see shingles' docstring)."""
    if not toks:
        return []
    if len(toks) >= n:
        return list({" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)})
    return [" ".join(toks)]


def ensure_min_parallelism(df, bytes_per_split: int | None = None):
    """Repartition up to the session's default parallelism when the
    input has fewer partitions (a single local parquet file reads as ONE
    split — which would serialize any per-partition kernel). On a real
    cluster reading many files/splits this is a no-op: partitions >>
    cores, no shuffle is added.

    File-backed frames are judged by ``inputFiles()`` — a driver-side
    file-index lookup — instead of ``df.rdd.getNumPartitions()``, whose
    DataFrame→RDD conversion re-plans the query per call (measured as a
    visible constant in the sf0.1 ANN queries). A many-splits-per-file
    source can repartition needlessly under this test; that mild
    round-robin cost beats paying the RDD conversion on every hot call,
    and the many-small-files layout of real table storage makes the
    no-op branch the common one.

    ``bytes_per_split`` (r17, guide §2.2 "fewer, larger partitions"):
    when set and the input is file-backed, the spread target is derived
    from input SIZE — ``ceil(total_bytes / bytes_per_split)``, capped
    at default parallelism — instead of unconditionally core-count.
    For cheap vectorized kernels (ns/byte: the numpy cosine/matmul
    family) a tiny table blasted to 32 splits pays 32× the per-task
    Arrow-boundary overhead for microseconds of compute; measured at
    sf0.1 the 32-way spread was the WORST width for every vector row
    (ivf_knn 0.99→0.59s best at ~4-way, dedup_embedding_ivf
    0.94→0.49s). Compute-heavy text kernels (µs/byte: md5 sketches,
    tokenize) keep the default full-width spread. When the size-derived
    target does not exceed the file count, the frame passes through
    unchanged — no exchange at all."""
    target = df.sparkSession.sparkContext.defaultParallelism
    files = df.inputFiles()
    if files:
        if len(files) >= target:
            return df
        # r17: files under-count native parallelism — parquet scans
        # split per ROW GROUP, so one 73 MB file with 49 row groups
        # already feeds every core and a spread's exchange is pure
        # cost (measured: the sf1 lineitem agg read 1.32s unspread vs
        # 1.92s spread, while the single-row-group sf0.1 file wins
        # spread). Count row groups (cached footer read, local files
        # only; falls back to the file count elsewhere).
        splits = _native_splits(files)
        if splits >= target:
            return df
        if bytes_per_split:
            total = 0
            for f in files:
                try:
                    total += os.path.getsize(
                        f[5:] if f.startswith("file:") else f
                    )
                except OSError:
                    total = 0
                    break
            if total:
                sized = -(-total // bytes_per_split)  # ceil
                target = max(1, min(target, sized))
                if target <= splits:
                    return df
    elif df.rdd.getNumPartitions() >= target:
        # non-file source (in-memory test frames, cached plans): the RDD
        # view is the only partition-count oracle; cheap for those.
        return df
    return df.repartition(target)


_NATIVE_SPLITS_CACHE: dict = {}


def _native_splits(files) -> int:
    """Total parquet row groups across ``files`` — the real upper bound
    on scan parallelism for a small file set (Spark assigns each row
    group to the task whose byte range holds its start). Footer-read
    per distinct file list, memoized (the bench and any steady-state
    serving loop re-read the same tables); non-local or non-parquet
    inputs fall back to the file count, which only makes the caller
    spread more eagerly — the pre-r17 behavior."""
    key = tuple(files)
    hit = _NATIVE_SPLITS_CACHE.get(key)
    if hit is not None:
        return hit
    try:
        import pyarrow.parquet as pq

        n = 0
        for f in files:
            p = f[5:] if f.startswith("file:") else f
            n += pq.ParquetFile(p).metadata.num_row_groups
    except Exception:
        n = len(files)
    if len(_NATIVE_SPLITS_CACHE) < 256:
        _NATIVE_SPLITS_CACHE[key] = n
    return n


# r17: the md5 digests of a shingle/token are pure functions of the
# string, and corpora repeat them heavily (Zipf; measured 93% repeat
# rate over sf1 docs — 419k shingle occurrences, 29k distinct), so the
# sketch kernels memoize digest vectors in a PER-BATCH dict: ~4.3x on
# the minhash loop, ~2.5x on simhash (interleaved microbench, value-
# asserted). The cap bounds worst-case memory on high-entropy corpora
# (every miss past the cap just pays the md5 it always paid); the dict
# dies with the batch, so no cross-task or cross-run state.
_DIGEST_CACHE_CAP = 1 << 16


def minhash_signature_arrow(shingle_col: Column, num_hashes: int = 16) -> Column:
    """shingle array -> ARRAY<STRING> of ``num_hashes`` min-md5 hex values.

    Value-identical to :func:`sifts_spark.operators.dedup.minhash_signature`
    (hash family h_i(s) = md5(s || '#' || i), min over the doc's shingle
    set; min over raw digests == min over hex strings — hex encoding is
    order-preserving — so the inner loop compares bytes and hexes only
    the 16 winners).
    """
    suffixes = [f"#{i}".encode() for i in range(num_hashes)]

    @pandas_udf("array<string>")
    def _sig(shingles: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for sh in shingles:
            if sh is None:
                out.append(None)
                continue
            mins: list[bytes | None] = [None] * num_hashes
            for s in sh:
                digs = cache.get(s)
                if digs is None:
                    base = s.encode()
                    digs = [md5(base + suf).digest() for suf in suffixes]
                    if len(cache) < _DIGEST_CACHE_CAP:
                        cache[s] = digs
                for i, d in enumerate(digs):
                    m = mins[i]
                    if m is None or d < m:
                        mins[i] = d
            out.append([m.hex() if m is not None else None for m in mins])
        return pd.Series(out)

    return _sig(shingle_col)


def shingle_minhash_arrow(
    text_col: Column,
    num_hashes: int = 16,
    shingle_size: int = 3,
    tokenizer: str | None = None,
) -> Column:
    """text -> STRUCT<sh ARRAY<STRING>, sig ARRAY<STRING>>: distinct word
    shingles AND their MinHash signature in ONE Arrow pass.

    Bench-driven fusion: the interpreted HOF shingle construction
    (transform + slice + array_join per position) cost more than the md5
    signature itself at sf0.1 (5.3s of a 7.2s query). Tokenize, shingle,
    and hash are value-identical twins of functions/text.py +
    operators/dedup.minhash_signature, so the DuckDB oracle is unchanged.
    """
    suffixes = [f"#{i}".encode() for i in range(num_hashes)]

    @pandas_udf(
        "struct<sh: array<string>, sig: array<string>>"
    )
    def _sk(texts: pd.Series) -> pd.DataFrame:
        cache: dict = {}  # per-batch digest memo, see _DIGEST_CACHE_CAP
        shs, sigs = [], []
        for text in texts:
            if text is None:
                shs.append(None)
                sigs.append(None)
                continue
            sh = _py_shingles(_py_tokenize(text, tokenizer), shingle_size)
            mins: list[bytes | None] = [None] * num_hashes
            for s in sh:
                digs = cache.get(s)
                if digs is None:
                    base = s.encode()
                    digs = [md5(base + suf).digest() for suf in suffixes]
                    if len(cache) < _DIGEST_CACHE_CAP:
                        cache[s] = digs
                for i, d in enumerate(digs):
                    m = mins[i]
                    if m is None or d < m:
                        mins[i] = d
            shs.append(sh)
            sigs.append([m.hex() if m is not None else None for m in mins])
        return pd.DataFrame({"sh": shs, "sig": sigs})

    return _sk(text_col)


def shingle_minkey_arrow(
    text_col: Column, shingle_size: int = 3, tokenizer: str | None = None
) -> Column:
    """text -> STRUCT<sh ARRAY<STRING>, key STRING>: distinct shingles
    plus the rarest-shingle block key (min md5 hex over shingles) — the
    Arrow twin of the n-gram-Jaccard blocking sketch."""

    @pandas_udf("struct<sh: array<string>, key: string>")
    def _sk(texts: pd.Series) -> pd.DataFrame:
        cache: dict = {}  # per-batch digest memo, see _DIGEST_CACHE_CAP
        shs, keys = [], []

        def _d(s: str) -> bytes:
            d = cache.get(s)
            if d is None:
                d = md5(s.encode()).digest()
                if len(cache) < _DIGEST_CACHE_CAP:
                    cache[s] = d
            return d

        for text in texts:
            if text is None:
                shs.append(None)
                keys.append(None)
                continue
            sh = _py_shingles(_py_tokenize(text, tokenizer), shingle_size)
            keys.append(min(_d(s) for s in sh).hex() if sh else None)
            shs.append(sh)
        return pd.DataFrame({"sh": shs, "key": keys})

    return _sk(text_col)


# MSB-first bit expansion of a byte: _BYTE_BITS[b] = 8 bits of b.
_BYTE_BITS = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1
).astype(np.int64)
# Fold weights turning 32 MSB-first bits into a non-negative BIGINT.
_POW32 = (1 << np.arange(31, -1, -1, dtype=np.int64))


def simhash64_arrow(tokens_col: Column) -> Column:
    """tokens ARRAY<STRING> -> STRUCT<simhash_hi BIGINT, simhash_lo BIGINT>.

    Value-identical to :func:`sifts_spark.operators.dedup.simhash64` over
    per-token md5 digests: vote per bit b (0-63, MSB-first over the first
    8 digest bytes) is +-1 by the token's md5 bit; fingerprint bit = votes
    strictly > 0; packed as two 32-bit halves (always >= 0 in BIGINT).
    """

    @pandas_udf("struct<simhash_hi: bigint, simhash_lo: bigint>")
    def _fp(tokens: pd.Series) -> pd.DataFrame:
        cache: dict = {}  # per-batch digest memo, see _DIGEST_CACHE_CAP
        his = np.empty(len(tokens), dtype=object)
        los = np.empty(len(tokens), dtype=object)

        def _d8(t: str) -> bytes:
            d = cache.get(t)
            if d is None:
                d = md5(t.encode()).digest()[:8]
                if len(cache) < _DIGEST_CACHE_CAP:
                    cache[t] = d
            return d

        for row, toks in enumerate(tokens):
            if toks is None:
                his[row] = None
                los[row] = None
                continue
            if len(toks) == 0:
                his[row] = 0
                los[row] = 0
                continue
            # bytes matrix: one md5 prefix (8 bytes) per token
            raw = np.frombuffer(
                b"".join(_d8(t) for t in toks),
                dtype=np.uint8,
            ).reshape(len(toks), 8)
            bits = _BYTE_BITS[raw].reshape(len(toks), 64)  # 0/1 per bit
            votes = bits.sum(axis=0) * 2 - len(toks)  # sum of (+-1)
            fp = (votes > 0).astype(np.int64)
            his[row] = int((fp[:32] * _POW32).sum())
            los[row] = int((fp[32:] * _POW32).sum())
        return pd.DataFrame({"simhash_hi": his, "simhash_lo": los})

    return _fp(tokens_col)


def langid_arrow(text_col: Column, markers: dict) -> Column:
    """text -> STRUCT<pred_lang STRING, lang_hits INT>: marker-word
    language id in one Arrow pass — the batch twin of
    :func:`sifts_spark.operators.textanalysis.language_id`'s expression
    path, which pays 5 interpreted HOF filter-lambdas per doc (the top
    profile entry at sf1: 14.8s). Tokenization is the proven
    ``_py_tokenize`` twin; a token contributes one hit to EVERY language
    whose marker set contains it (multiplicity kept), argmax with
    alphabetical tiebreak, 0 hits -> 'und' — exactly the JVM semantics,
    pinned by an impl-equivalence test."""
    langs = sorted(markers)
    lookup: dict[str, list[int]] = {}
    for li, lang in enumerate(langs):
        for w in markers[lang]:
            lookup.setdefault(w, []).append(li)

    @pandas_udf("struct<pred_lang: string, lang_hits: int>")
    def _lid(texts: pd.Series) -> pd.DataFrame:
        preds = np.empty(len(texts), dtype=object)
        hits_out = np.empty(len(texts), dtype=object)
        for row, txt in enumerate(texts):
            if txt is None:
                # JVM-twin parity: null text -> hits stay NULL, and the
                # `WHEN hits > 0` guard falls to the 'und' branch.
                preds[row] = "und"
                hits_out[row] = None
                continue
            counts = [0] * len(langs)
            for t in _py_tokenize(txt):
                for li in lookup.get(t, ()):
                    counts[li] += 1
            best_li, best = 0, counts[0]
            for li in range(1, len(langs)):
                if counts[li] > best:
                    best_li, best = li, counts[li]
            preds[row] = langs[best_li] if best > 0 else "und"
            hits_out[row] = best
        return pd.DataFrame({"pred_lang": preds, "lang_hits": hits_out})

    return _lid(text_col)


def stopword_count_arrow(text_col: Column, stopwords) -> Column:
    """text -> INT count of tokens that are stopwords (multiplicity
    kept) — the batch twin of
    ``F.size(F.filter(tokenize(text), t -> array_contains(stop, t)))``,
    the one interpreted HOF inside quality_score. Returns an INTEGER,
    so the quality ratios and their F.round stay in the JVM expression:
    zero float-parity surface. NULL text -> NULL (size(filter(null))
    semantics in the twin return -1 for null arrays ONLY when size's
    legacy flag is set; modern Spark returns NULL — pinned by the
    equivalence test)."""
    stop = frozenset(stopwords)

    @pandas_udf("int")
    def _nstop(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=object)
        for row, txt in enumerate(texts):
            if txt is None:
                out[row] = None
            else:
                out[row] = sum(1 for t in _py_tokenize(txt) if t in stop)
        return pd.Series(out)

    return _nstop(text_col)
