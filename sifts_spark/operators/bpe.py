"""Byte-pair-encoding tokenizer: sampled training, distributed encode.

Extension beyond the reference surface (SURVEY.md §2.6): the
subword tokenizer every LLM-data pipeline ultimately measures in —
sequence packing (:func:`sifts_spark.operators.sampling.pack_sequences`)
and corpus mixing (:func:`~sifts_spark.operators.sampling.mix_corpus`)
budget in TOKENS, and a whitespace/regex count (``bpe_ish_token_count``
in operators/textanalysis.py) is only a proxy. This module supplies the
real thing: Sennrich, Haddow & Birch 2016 ("Neural Machine Translation
of Rare Words with Subword Units") BPE, re-expressed in the repo's
standard sampled-training / broadcast-scoring posture:

* **train** (:func:`train_bpe`) runs DRIVER-side on a deterministic
  md5-ordered sample (the same unbiased-permutation draw the quality
  classifier and the k-means centroid path use) — tokenizer training
  is corpus-statistics estimation, and a bounded sample estimates the
  merge table as well as the full corpus does; the corpus is never
  collected. Distributed shape: one TakeOrdered(sample) job.
* **encode** (:func:`bpe_encode` / :func:`bpe_token_count`) is a
  map-side Arrow kernel; the merge table ships once per executor as a
  ``SparkContext.broadcast`` (the perplexity-scorer treatment — a
  10k-merge table pickles to ~300 KB, too big to ride every task
  binary), and each batch memoizes segmentations per unique word. One
  scan, no shuffle, no join.

Determinism: the sample order is md5(text); merge selection breaks
frequency ties on the lexicographically smallest pair — retraining on
the same corpus yields an identical merge table, and the model dict
round-trips through :mod:`sifts_spark.functions.artifacts` (plain JSON
lists).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from sifts_spark.caching import register_release_hook
from sifts_spark.functions.hashing import ensure_min_parallelism, _py_tokenize

EOW = "</w>"  # end-of-word sentinel symbol (Sennrich §3.2)
UNK = "<unk>"  # id 0: symbols outside the training alphabet
SEP = "<sep>"  # id 1: document separator in packed token-id sequences


def _pair_stats(words: list[tuple[list[str], int]]):
    """pair -> total freq, and pair -> set of word indexes holding it."""
    counts: dict = {}
    where: dict = {}
    for wi, (syms, freq) in enumerate(words):
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + freq
            where.setdefault((a, b), set()).add(wi)
    return counts, where


def _merge_word(syms: list[str], pair: tuple[str, str]) -> list[str]:
    a, b = pair
    out, i, n = [], 0, len(syms)
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 4_000,
    sample_docs: int = 20_000,
    min_pair_freq: int = 2,
) -> dict:
    """Train a BPE merge table → ``{"kind": "bpe", "merges": [[a, b],
    ...], "eow": EOW}`` (artifact-persistable JSON).

    Standard Sennrich training over word frequencies: words are the
    repo tokenizer's lowercase alnum runs (so BPE composes with every
    other text operator), each represented as its character sequence
    plus the ``</w>`` sentinel; ``num_merges`` times, the most frequent
    adjacent symbol pair merges into one symbol (ties → smallest pair,
    for a deterministic table). Pair counts are maintained
    INCREMENTALLY (only words containing the merged pair are
    re-counted), the textbook optimization that keeps training
    O(merges × words-touched) instead of O(merges × vocabulary).
    Training stops early when no pair reaches ``min_pair_freq`` —
    merging hapax pairs memorizes the sample, not the language."""
    rows = (
        docs.select(F.col(text_col).alias("_t"))
        .filter(F.col("_t").isNotNull())
        .orderBy(F.md5(F.col("_t")), F.col("_t"))
        .limit(sample_docs)
        .collect()
    )
    freqs: dict = {}
    for r in rows:
        for tok in _py_tokenize(r["_t"]):
            freqs[tok] = freqs.get(tok, 0) + 1
    if not freqs:
        raise ValueError("cannot train BPE on an empty/whitespace sample")
    words = [(list(w) + [EOW], f) for w, f in sorted(freqs.items())]
    counts, where = _pair_stats(words)
    merges: list[list[str]] = []
    for _ in range(num_merges):
        if not counts:
            break
        # deterministic argmax: max count, then smallest pair
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < min_pair_freq:
            break
        merges.append([best[0], best[1]])
        for wi in sorted(where.pop(best, ())):
            syms, freq = words[wi]
            # retract this word's pair contributions, merge, re-add
            for p in zip(syms, syms[1:]):
                counts[p] -= freq
                if counts[p] <= 0:
                    counts.pop(p, None)
                s = where.get(p)
                if s is not None:
                    s.discard(wi)
                    if not s:
                        where.pop(p, None)
            syms = _merge_word(syms, best)
            words[wi] = (syms, freq)
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + freq
                where.setdefault(p, set()).add(wi)
    # the initial single-char symbol set (+ EOW): with it the model
    # defines a CLOSED vocabulary (bpe_vocab) so sequences can render
    # as token ids; chars outside it map to UNK at id-encode time.
    # (from freqs, not `words` — the merge loop mutated those in place)
    alphabet = sorted({c for w in freqs for c in w} | {EOW})
    return {"kind": "bpe", "merges": merges, "eow": EOW,
            "alphabet": alphabet}


def _py_bpe_encode(word: str, ranks: dict, eow: str) -> list[str]:
    """Greedy lowest-rank merging of one word (Sennrich's apply step)."""
    syms = list(word) + [eow]
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        syms = _merge_word(syms, best_pair)
    return syms


def bpe_vocab(model: dict) -> dict:
    """The model's deterministic token → id table: ``{UNK: 0, SEP: 1}``,
    then the training alphabet (sorted single chars + EOW), then each
    merge's output symbol in merge order (first occurrence wins on the
    rare a+b string collision) — the GPT-2-style 'alphabet then merges'
    id assignment, derived purely from the model dict so any two
    processes holding the same artifact agree on every id.

    Models trained before the ``alphabet`` field fall back to the
    characters observable in the merge table (+ EOW): ids stay
    deterministic, unseen-in-merges chars map to UNK."""
    alphabet = model.get("alphabet") or sorted(
        {c for pair in model["merges"] for part in pair for c in part}
        | {model.get("eow", EOW)}
    )
    vocab = {UNK: 0, SEP: 1}
    for sym in alphabet:
        if sym not in vocab:
            vocab[sym] = len(vocab)
    for a, b in model["merges"]:
        sym = a + b
        if sym not in vocab:
            vocab[sym] = len(vocab)
    return vocab


def bpe_decode_ids(ids, model: dict) -> str:
    """ids → text (driver-side; the loader-side inverse used by the
    roundtrip tests): tokens re-join with EOW → space, SEP → a plain
    space at the document boundary, UNK renders as the literal
    ``"<unk>"`` symbol (inline, like any other non-EOW symbol).
    ``decode(encode_ids(t))`` equals ``" ".join(tokenize(t))`` whenever
    ``t``'s characters are inside the training alphabet. Output is
    space-normalized (an EOW already ends each word with a space, so a
    following SEP must not double it)."""
    inv = {i: s for s, i in bpe_vocab(model).items()}
    eow = model.get("eow", EOW)
    out: list[str] = []
    for i in ids:
        sym = inv.get(int(i), UNK)
        if sym == SEP:
            out.append(" ")
        else:
            out.append(sym[: -len(eow)] + " " if sym.endswith(eow) else sym)
    return " ".join("".join(out).split())


# Merge-table broadcasts memoized per (application, model content):
# without this every bpe_encode call ships a fresh broadcast that is
# never unpersisted, so bench loops / iterative pipelines accumulate
# merge tables in executor storage for the session lifetime.
# release_all() (sifts_spark.caching) unpersists and clears the cache;
# unpersist (not destroy) keeps already-built plans valid — they
# re-fetch from the driver on next use.
_BC_CACHE: dict = {}


def _merge_table_broadcast(sess, model: dict):
    import hashlib

    eow = model.get("eow", EOW)
    content = hashlib.md5(
        (
            "\x1f".join("\x1e".join(p) for p in model["merges"])
            + eow
            + "\x1f".join(model.get("alphabet") or ())
        ).encode()
    ).hexdigest()
    key = (sess.sparkContext.applicationId, content)
    bc = _BC_CACHE.get(key)
    if bc is None:
        bc = sess.sparkContext.broadcast(
            {
                "ranks": {tuple(p): i for i, p in enumerate(model["merges"])},
                "eow": eow,
                "vocab": bpe_vocab(model),
            }
        )
        _BC_CACHE[key] = bc
    return bc


def release_bpe_broadcasts() -> int:
    """Unpersist every cached merge-table broadcast; returns the count
    (registered with :func:`sifts_spark.caching.release_all`)."""
    released = 0
    for bc in _BC_CACHE.values():
        try:
            bc.unpersist(blocking=False)
            released += 1
        except Exception:
            pass
    _BC_CACHE.clear()
    return released


register_release_hook(release_bpe_broadcasts)


def bpe_encode(text_col: Column, model: dict, spark=None) -> Column:
    """text → ARRAY<STRING> of BPE subword tokens (``</w>``-terminated
    word finals, Sennrich's wire format). Arrow kernel; the merge
    table rides ONE broadcast per (session, model) — repeated calls
    reuse it (see ``_BC_CACHE``) — and segmentations memoize per
    unique word per batch. Characters never seen in training pass
    through as single-char symbols — BPE's open-vocabulary property."""
    from pyspark.sql import SparkSession

    sess = spark or SparkSession.getActiveSession()
    bc = _merge_table_broadcast(sess, model)

    @pandas_udf("array<string>")
    def _enc(texts: pd.Series) -> pd.Series:
        ranks = bc.value["ranks"]
        eow = bc.value["eow"]
        cache: dict = {}
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            toks: list[str] = []
            for w in _py_tokenize(t):
                seg = cache.get(w)
                if seg is None:
                    seg = _py_bpe_encode(w, ranks, eow)
                    cache[w] = seg
                toks.extend(seg)
            out.append(toks)
        return pd.Series(out)

    return _enc(text_col)


def bpe_encode_ids(text_col: Column, model: dict, spark=None) -> Column:
    """text → ARRAY<INT> of vocabulary ids (:func:`bpe_vocab`) — what a
    training loader consumes directly, no re-tokenization (r11 verdict:
    rendering text that packing already token-counted makes the loader
    pay the BPE pass twice). Same broadcast merge table and per-batch
    word memoization as :func:`bpe_encode`; symbols outside the
    training alphabet map to UNK (id 0)."""
    from pyspark.sql import SparkSession

    sess = spark or SparkSession.getActiveSession()
    bc = _merge_table_broadcast(sess, model)

    @pandas_udf("array<int>")
    def _enc(texts: pd.Series) -> pd.Series:
        ranks = bc.value["ranks"]
        eow = bc.value["eow"]
        vocab = bc.value["vocab"]
        unk = vocab[UNK]
        cache: dict = {}
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            ids: list[int] = []
            for w in _py_tokenize(t):
                seg = cache.get(w)
                if seg is None:
                    seg = [
                        vocab.get(s, unk)
                        for s in _py_bpe_encode(w, ranks, eow)
                    ]
                    cache[w] = seg
                ids.extend(seg)
            out.append(ids)
        return pd.Series(out)

    return _enc(text_col)


def bpe_token_count(text_col: Column, model: dict, spark=None) -> Column:
    """text → BIGINT true-BPE token count — the drop-in upgrade for
    ``bpe_ish_token_count`` wherever packing/mixing budgets tokens."""
    return F.size(bpe_encode(text_col, model, spark)).cast("long")


def bpe_segment(
    docs: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide segmentation → ``(id, tokens ARRAY<STRING>,
    n_tokens BIGINT)`` — one map-side pass, ready to feed
    ``pack_sequences(token_col="n_tokens")``."""
    out = ensure_min_parallelism(
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    )
    return out.select(
        "id", bpe_encode(F.col("_t"), model, docs.sparkSession).alias("tokens")
    ).withColumn("n_tokens", F.size("tokens").cast("long"))
