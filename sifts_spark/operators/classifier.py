"""Model-based quality filtering and importance resampling.

Extension beyond the reference surface (SURVEY.md §2.6): the two
classifier-shaped stages every production pretraining pipeline runs
after the heuristic filters (`operators/textanalysis.py`):

* **quality classifier** — GPT-3's filtering recipe (Brown et al. 2020
  appendix A: train a linear classifier on hashed token features with a
  high-quality positive set vs raw-web negatives; keep docs the
  classifier scores high, with stochastic smoothing). fastText's
  architecture (Joulin et al. 2016) is the usual implementation; here
  it is a hashing-trick logistic regression trained driver-side on a
  deterministic sample and scored map-side by an Arrow kernel — the
  exact shape a 1000-executor scoring pass needs (model is one
  broadcast float32 vector; scoring is one scan, no shuffle).

* **DSIR importance resampling** — Xie et al. 2023 ("Data Selection
  for Language Models via Importance Resampling"): weight every raw
  doc by target-LM/source-LM likelihood ratio over hashed features,
  then sample WITHOUT replacement proportionally to the weights. The
  LMs reuse :func:`sifts_spark.operators.textanalysis.train_unigram_lm`
  (DSIR's hashed-bigram model is noted as the stronger production
  variant); the sampling step is the Gumbel top-k trick
  (Efraimidis–Spirakis keys), which turns weighted sampling without
  replacement into a TakeOrdered(n) — no global sort, no driver state.

Determinism contract (same as the dedup family): every hash is md5,
every random draw derives from md5(id, seed) — reruns are bit-stable
and an oracle can replay them.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sifts_spark.functions.hashing import ensure_min_parallelism, _py_tokenize


def _bucket(tok: str, dim: int) -> int:
    # md5-derived hashing-trick bucket: engine-independent, seedless.
    return int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big") % dim


def _featurize(texts, dim: int) -> "np.ndarray":
    """Dense (n_docs, dim) L1-normalized hashed bag-of-tokens. Driver/
    executor-side helper — callers bound n_docs (training sample) or
    batch size (Arrow scoring), so dense is fine and keeps the math
    numpy-C-speed without a scipy dependency."""
    X = np.zeros((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        toks = _py_tokenize(t or "")
        if not toks:
            continue
        w = 1.0 / len(toks)
        for tok in toks:
            X[i, _bucket(tok, dim)] += w
    return X


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    text_col: str = "text",
    dim: int = 2**15,
    sample_per_class: int = 10_000,
    epochs: int = 60,
    lr: float = 2.0,
    l2: float = 1e-5,
) -> dict:
    """Train the GPT-3-style quality classifier → ``{"kind":
    "quality_lr", "dim", "weights" (float32 bytes), "bias"}`` —
    persistable via :mod:`sifts_spark.functions.artifacts` (bytes
    fields hex-encode transparently).

    ``positive`` is the curated high-quality set (the reference-corpus
    role WebText/Wikipedia play in Brown et al. 2020), ``negative``
    the raw pool. Each side contributes a DETERMINISTIC
    ``sample_per_class``-doc sample (md5-hash order of the text — an
    unbiased permutation, rerun-stable) collected to the driver; a
    hashing-trick logistic regression is fit full-batch with numpy.
    Distributed shape: two TakeOrdered(sample) jobs; the corpus is
    never collected. The model is dim×4 bytes (128 KiB at the default
    2^15) — broadcast-sized by construction."""
    def _sample(df: DataFrame) -> list[str]:
        rows = (
            df.select(F.col(text_col).alias("_t"))
            .orderBy(F.md5(F.col("_t")), F.col("_t"))
            .limit(sample_per_class)
            .collect()
        )
        return [r["_t"] or "" for r in rows]

    pos, neg = _sample(positive), _sample(negative)
    if not pos or not neg:
        raise ValueError("both classes need at least one non-empty sample")
    X = _featurize(pos + neg, dim)
    y = np.concatenate([np.ones(len(pos)), np.zeros(len(neg))]).astype(np.float32)
    w = np.zeros(dim, dtype=np.float32)
    b = 0.0
    n = len(y)
    for _ in range(epochs):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = (p - y) / n
        w -= lr * (X.T @ g + l2 * w)
        b -= lr * float(g.sum())
    return {
        "kind": "quality_lr",
        "dim": dim,
        "weights": w.astype("<f4").tobytes(),
        "bias": float(b),
    }


CLASSIFIER_SCHEMA = "double"


def classifier_score(
    docs: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every doc with a :func:`train_quality_classifier` model →
    ``(id, quality_prob)`` (sigmoid in [0,1]; empty/NULL text scores
    the bias alone). Map-side Arrow kernel, one scan, no shuffle; the
    weight vector ships as a ``SparkContext.broadcast`` (once per
    executor), never in the task closure."""
    from pyspark.sql.functions import pandas_udf

    dim = int(model["dim"])
    bias = float(model["bias"])
    bc = docs.sparkSession.sparkContext.broadcast(
        np.frombuffer(model["weights"], dtype="<f4").copy()
    )

    @pandas_udf(CLASSIFIER_SCHEMA)
    def _score(texts: pd.Series) -> pd.Series:
        w = bc.value
        out = []
        for t in texts:
            toks = _py_tokenize(t or "")
            if toks:
                idx = np.fromiter(
                    (_bucket(tok, dim) for tok in toks), dtype=np.int64, count=len(toks)
                )
                z = float(w[idx].sum()) / len(toks) + bias
            else:
                z = bias
            out.append(round(1.0 / (1.0 + math.exp(-z)), 6))
        return pd.Series(out)

    base = ensure_min_parallelism(
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    )
    return base.select("id", _score(F.col("_t")).alias("quality_prob"))


def pareto_keep(quality_prob, id_col="id", alpha: float = 9.0, seed: int = 0):
    """GPT-3's stochastic keep rule (Brown et al. 2020 appendix A):
    keep a doc iff ``1 - score < x`` with x ~ Pareto(α=9) —
    high-scoring docs almost always survive, low-scoring ones keep a
    long tail so the filtered corpus stays diverse. Returns a Boolean
    Column; the Pareto draw derives from md5(id, seed) so reruns are
    stable and equal-scored docs draw independently.

    Column-expression (JVM) implementation: u = md5-uniform in (0,1],
    x = u^(-1/α) − 1 is a Lomax/Pareto-II sample (inverse-CDF; the
    ``np.random.pareto`` convention the GPT-3 rule is stated in, with
    support [0,∞) — so keep probability is (2−q)^(−α): ≈0.64 at
    q=0.95, ≈0.002 at q=0.05)."""
    q = F.col(quality_prob) if isinstance(quality_prob, str) else quality_prob
    i = F.col(id_col) if isinstance(id_col, str) else id_col
    u = (
        F.conv(F.substring(F.md5(F.concat_ws("\x1f", i.cast("string"),
                                              F.lit(str(seed)))), 1, 13), 16, 10)
        .cast("double") / F.lit(float(16**13))
    )
    # clamp away 0 so the power is finite
    x = F.pow(F.greatest(u, F.lit(1e-12)), F.lit(-1.0 / alpha)) - F.lit(1.0)
    return (F.lit(1.0) - q) < x


# --------------------------------------------- DSIR importance resampling


def importance_weights(
    docs: DataFrame,
    target_lm: dict,
    source_lm: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc DSIR log importance weight → ``(id, n_tokens,
    log_weight)`` with ``log_weight = Σ_feat [log p_target(feat) −
    log p_source(feat)]`` (Xie et al. 2023 eq. 2). Feature space
    follows the models: two ``train_unigram_lm`` dicts → word
    features (the stand-in); two
    :func:`~sifts_spark.operators.textanalysis.train_hashed_ngram_lm`
    dicts → hashed n-gram features (the paper's §2.2 space —
    hashed BIGRAMS with the default n=2 — where ``n_tokens`` counts
    n-grams). Mixing kinds raises: a log-ratio across different
    feature spaces is meaningless. Empty docs weigh 0. Map-side Arrow
    kernel; both LMs ride ONE broadcast."""
    from pyspark.sql.functions import pandas_udf

    t_hashed = target_lm.get("kind") == "hashed_ngram_lm"
    s_hashed = source_lm.get("kind") == "hashed_ngram_lm"
    if t_hashed != s_hashed:
        raise ValueError(
            "target_lm and source_lm must share a feature space "
            "(both unigram dicts or both hashed_ngram_lm models)"
        )
    if t_hashed:
        if (target_lm["n"], target_lm["num_buckets"]) != (
            source_lm["n"], source_lm["num_buckets"]
        ):
            raise ValueError(
                "hashed LMs must share (n, num_buckets) or their "
                "buckets don't align"
            )
        import numpy as np

        from sifts_spark.operators.textanalysis import _py_gram_buckets

        n, nb = int(target_lm["n"]), int(target_lm["num_buckets"])
        bc_h = docs.sparkSession.sparkContext.broadcast(
            np.frombuffer(target_lm["logprob"], dtype="<f4").astype("<f8")
            - np.frombuffer(source_lm["logprob"], dtype="<f4").astype("<f8")
        )

        @pandas_udf("n_tokens long, log_weight double")
        def _w(texts: pd.Series) -> pd.DataFrame:
            diff = bc_h.value
            rows = []
            cache: dict = {}  # per-batch md5 memo (Zipf: grams repeat)
            for t in texts:
                bs = _py_gram_buckets(t, n, nb, cache)
                lw = float(diff[np.asarray(bs, dtype=np.int64)].sum()) if bs else 0.0
                rows.append((len(bs), round(lw, 6)))
            return pd.DataFrame(rows, columns=["n_tokens", "log_weight"])

        base = ensure_min_parallelism(
            docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
        )
        return base.select("id", _w(F.col("_t")).alias("_o")).select(
            "id", "_o.n_tokens", "_o.log_weight"
        )

    bc = docs.sparkSession.sparkContext.broadcast(
        {
            "t": (target_lm["logprob"], target_lm["oov_logprob"]),
            "s": (source_lm["logprob"], source_lm["oov_logprob"]),
        }
    )

    @pandas_udf("n_tokens long, log_weight double")
    def _w(texts: pd.Series) -> pd.DataFrame:
        tlp, toov = bc.value["t"]
        slp, soov = bc.value["s"]
        rows = []
        for t in texts:
            toks = _py_tokenize(t or "")
            lw = sum(tlp.get(k, toov) - slp.get(k, soov) for k in toks)
            rows.append((len(toks), round(lw, 6)))
        return pd.DataFrame(rows, columns=["n_tokens", "log_weight"])

    base = ensure_min_parallelism(
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    )
    return base.select("id", _w(F.col("_t")).alias("_o")).select(
        "id", "_o.n_tokens", "_o.log_weight"
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    log_weight_col: str = "log_weight",
    id_col: str = "id",
    seed: int = 0,
) -> DataFrame:
    """Exactly ``n`` rows sampled WITHOUT replacement with probability
    proportional to ``exp(log_weight)`` — the resampling half of DSIR.

    Gumbel top-k (equivalently Efraimidis–Spirakis 2006): give every
    row the key ``log_weight + Gumbel(0,1)`` and take the n largest;
    the result is exactly a weighted draw without replacement. The
    Gumbel sample is ``−log(−log u)`` with u a DETERMINISTIC uniform
    from md5(id, seed), so the draw is rerun-stable and replayable.

    Scale shape: one map-side key expression + TakeOrderedAndProject(n)
    — no global sort, no shuffle of the losers, no driver state beyond
    the n winners. Rows with log_weight NULL (or −inf semantics:
    weight 0) never win."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("\x1f", F.col(id_col).cast("string"),
                                  F.lit(str(seed)))), 1, 13),
            16, 10,
        ).cast("double") / F.lit(float(16**13))
    )
    gumbel = -F.log(-F.log(F.greatest(u, F.lit(1e-12))))
    key = F.col(log_weight_col) + gumbel
    return (
        df.withColumn("_gk", key)
        .filter(F.col("_gk").isNotNull())
        .orderBy(F.col("_gk").desc(), F.col(id_col))
        .limit(n)
        .drop("_gk")
    )
