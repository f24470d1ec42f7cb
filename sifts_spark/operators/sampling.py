"""Deterministic sampling / per-group selection for training-data
pipelines.

``df.sample()`` is seed-dependent across partitionings and engines —
useless under a cross-engine correctness gate and non-reproducible when
a table is rewritten with a different file split. Everything here keys
off content hashes instead: the same row set always yields the same
sample, on any engine, at any partition count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    id_col: str,
) -> DataFrame:
    """Exactly ``n_per_group`` rows per group (fewer if the group is
    smaller), chosen by md5-hash order of the id — a deterministic
    uniform draw (md5 is uniform on ids, so hash-rank order is an
    unbiased permutation). One shuffle keyed by group.

    At 100 TB: per-group row_number concentrates each group on one
    reducer — fine for many medium groups (the training-data case:
    sample per language/source/domain). For few huge groups prefer a
    threshold filter ``md5(id) < p``-style (no total order needed);
    that variant trades exact-n for full parallelism.
    """
    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_group)
        .drop("_rn")
    )


def topk_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    k: int,
    id_col: str,
    descending: bool = True,
) -> DataFrame:
    """Top-``k`` rows per group by ``order_col`` (id tiebreak →
    deterministic). Same shuffle shape as :func:`stratified_sample`;
    rank is exposed as ``rank`` (1-based)."""
    key = F.col(order_col).desc() if descending else F.col(order_col).asc()
    w = Window.partitionBy(group_col).orderBy(key, F.col(id_col))
    return df.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def split_corpus(
    df: DataFrame,
    splits: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "split",
    method: str = "hash",
    stratify_col: str | None = None,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named partition (train/validation/
    holdout/…) → input columns + ``split_col`` — the split step every
    training pipeline needs before a held-out eval set can exist, and
    the one ``randomSplit`` gets wrong for data work: Spark's sampling
    is seed-and-partitioning dependent, so a rewritten table or a
    different engine reshuffles which docs are "held out" — silently
    contaminating every eval built on the old split.

    ``splits`` maps name → fraction (insertion order is boundary
    order; fractions must be positive and sum to 1 within 1e-6).
    Assignment keys off ``md5(seed, id)`` only — adding or removing
    OTHER rows never moves an existing row between splits (the
    property that makes a holdout set stable across corpus versions;
    a fraction-boundary change only migrates boundary-interval rows).

    ``method="hash"`` (default, the 100 TB path): the md5 unit-interval
    trick — first 8 hex chars as a fraction of 2^32 against cumulative
    boundaries; pure map-side expressions, NO shuffle, NO window;
    per-split counts are binomial around n*frac (exact in expectation,
    ±√n jitter). ``method="exact"``: md5-rank row_number against
    count-scaled boundaries — exact floor/ceil split sizes (per
    ``stratify_col`` group when given: every stratum splits in the
    same proportions — balanced eval sets for skewed language/source
    mixes) at the cost of one shuffle; per-group total order, so use
    it for many-medium-strata shapes, not one giant stratum.
    ``stratify_col`` with ``method="hash"`` raises — hash assignment
    is already stratum-independent, so asking for stratification there
    signals the caller wants the exact guarantee.
    """
    if not splits:
        raise ValueError("splits must name at least one partition")
    fracs = list(splits.values())
    if any(f <= 0 for f in fracs):
        raise ValueError(f"split fractions must be positive: {splits}")
    if abs(sum(fracs) - 1.0) > 1e-6:
        raise ValueError(f"split fractions must sum to 1: {splits}")
    if method not in ("hash", "exact"):
        raise ValueError(f"unknown split method: {method!r}")
    if method == "hash" and stratify_col is not None:
        raise ValueError(
            "stratify_col requires method='exact' (hash assignment is "
            "already independent across strata; exact mode adds the "
            "per-stratum size guarantee)"
        )
    names = list(splits)
    cum = []
    run = 0.0
    for f in fracs:
        run += f
        cum.append(run)
    # (the last interval needs no boundary: otherwise(names[-1]) below
    # catches everything past cum[-2])

    # NULL ids would all hash to md5(seed) alone (concat_ws drops the
    # NULL) and land in ONE split together — silently violating the
    # binomial-size and stability guarantees. Fail loudly at execution
    # time instead; zero cost on clean data.
    sid = F.when(
        F.col(id_col).isNull(),
        F.raise_error(
            F.lit("split_corpus requires non-null ids")
        ).cast("string"),
    ).otherwise(F.col(id_col).cast("string"))

    if method == "hash":
        unit = (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("\x00", F.lit(seed), sid)),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(float(2**32))
        )
        col = F.lit(names[-1])
        for name, hi in zip(reversed(names[:-1]), reversed(cum[:-1])):
            col = F.when(unit < F.lit(hi), F.lit(name)).otherwise(col)
        return df.withColumn(split_col, col)

    order = F.md5(F.concat_ws("\x00", F.lit(seed), sid))
    key = stratify_col if stratify_col is not None else F.lit(0)
    w = Window.partitionBy(key).orderBy(order, F.col(id_col))
    wn = Window.partitionBy(key)
    rn = F.row_number().over(w)
    n = F.count(F.lit(1)).over(wn)
    col = F.lit(names[-1])
    for name, hi in zip(reversed(names[:-1]), reversed(cum[:-1])):
        col = F.when(
            rn <= F.round(F.lit(hi) * n).cast("long"), F.lit(name)
        ).otherwise(col)
    return df.withColumn(split_col, col)


def mix_corpus(
    df: DataFrame,
    group_col: str,
    token_col: str,
    target_weights: dict,
    total_tokens: int,
    id_col: str = "doc_id",
    allow_upsampling: bool = True,
) -> DataFrame:
    """Deterministic domain re-mixing to target proportions — the
    "data mixture" step of LLM corpus assembly (the Pile's per-source
    epochs, Gao et al. 2021; DoReMi's domain weights, Xie et al. 2023).

    For each group ``g`` with weight ``w_g`` (normalized here), select
    documents in md5-hash order until ``w_g * total_tokens`` tokens are
    taken. Groups smaller than their budget are UPSAMPLED by whole
    deterministic epochs (the same hash-order pass repeated; ``epoch``
    column says which copy a row is) unless ``allow_upsampling=False``,
    which caps a group at one epoch. A row is kept iff it STARTS before
    the group budget ends, so each group overshoots by at most one
    document — exact-budget truncation would split a document.

    Shuffle shape: one sum per group (map-side combined), one
    window-cumsum keyed by group (same single-reducer-per-group caveat
    as :func:`stratified_sample` — domains are few and medium, the
    training-data case), epochs via a row-count-preserving
    ``posexplode`` of a repeat array.
    """
    wsum = float(sum(target_weights.values()))
    if wsum <= 0:
        raise ValueError("target_weights must sum to a positive value")
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(g, w / wsum) for g, w in target_weights.items()],
        f"{group_col} string, _w double",
    )
    df = df.join(F.broadcast(wdf), group_col)  # drops unlisted groups
    # group totals are domains-sized: collect ONCE (the warning below
    # needs an action anyway) and rebuild as a literal frame, so the
    # groupBy scan is not re-executed by the join
    total_rows = (
        df.groupBy(group_col)
        .agg(F.sum(F.col(token_col).cast("long")).alias("_gtot"))
        .collect()
    )
    # A weighted group with NO rows — or rows whose token column is all
    # NULL (sum comes back None) — silently contributes nothing and the
    # output under-delivers its share of total_tokens — that is a data
    # bug (wrong group labels, upstream over-filtering), surface it.
    missing = set(target_weights) - {
        r[group_col] for r in total_rows if (r["_gtot"] or 0) > 0
    }
    if missing:
        import logging

        logging.getLogger(__name__).warning(
            "mix_corpus: weighted group(s) %s have no rows — their "
            "%.0f%% of the budget will NOT be delivered",
            sorted(missing),
            100 * sum(target_weights[g] for g in missing) / wsum,
        )
    # Epoch replication rides a BROADCAST (group, epoch) frame built
    # driver-side — the per-group epoch counts are already computable
    # from the collected totals. The earlier per-row
    # F.sequence(0, n_epochs-1) + explode materialized an
    # epochs-length array on EVERY row, which for a tiny domain under
    # a huge budget (50k tokens at a 1B budget → 20k epochs) built
    # 20k-element arrays per row; here the same fan-out is
    # sum(n_epochs) driver rows joined in.
    import math

    epoch_rows = []
    for r in total_rows:
        g, gtot = r[group_col], r["_gtot"] or 0
        if gtot <= 0:
            continue  # all-NULL token group: warned above, undeliverable
        budget = (target_weights[g] / wsum) * total_tokens
        n_ep = (
            max(1, math.ceil(budget / max(gtot, 1)))
            if allow_upsampling
            else 1
        )
        epoch_rows.extend((g, gtot, e) for e in range(n_ep))
    epochs = spark.createDataFrame(
        epoch_rows, f"{group_col} string, _gtot long, epoch int"
    )
    df = df.join(F.broadcast(epochs), group_col).withColumn(
        "_budget", F.col("_w") * F.lit(float(total_tokens))
    )
    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(group_col, "epoch").orderBy(h, F.col(id_col))
    cum = (
        F.sum(F.col(token_col).cast("long")).over(w) - F.col(token_col)
    )  # tokens BEFORE this row in hash order (per epoch copy)
    out = (
        df.withColumn("_cum", cum)
        .filter(
            F.col("_cum") + F.col("epoch") * F.col("_gtot") < F.col("_budget")
        )
        .drop("_w", "_gtot", "_budget", "_cum")
    )
    return out


PACK_SCHEMA = (
    "seq_id string, doc_ids array<string>, n_docs int, "
    "total_tokens long, fill double"
)


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    max_tokens: int = 2048,
    max_open_bins: int = 256,
) -> DataFrame:
    """Pack documents into training sequences of ≤ ``max_tokens``
    → (seq_id, doc_ids, n_docs, total_tokens, fill) — the sequence-
    packing step that turns a curated corpus into fixed-length LM
    examples without cross-document padding waste.

    Bounded FIRST-FIT per partition: docs stream through in
    deterministic order (hash repartition + sortWithinPartitions on
    the id hash), each placed into the first open bin it fits, else a
    new bin; when ``max_open_bins`` bins are open the fullest is
    emitted (bounds executor memory — packing state never exceeds
    ``max_open_bins * max_tokens`` tokens of bookkeeping regardless of
    partition size). Documents longer than ``max_tokens`` get a
    single-doc oversize bin (fill > 1) — flag or split upstream.
    seq_ids are ``{partition}-{counter}``: globally unique, stable for
    a fixed partitioning. Packing is per-partition, so quality is
    local-first-fit (fill ~0.9+ for docs ≪ max_tokens); no shuffle
    beyond the deterministic repartition."""
    import pandas as pd
    from pyspark import TaskContext

    def pack(batches):
        pid = TaskContext.get().partitionId()
        counter = 0
        open_bins: list[list] = []  # [tokens_used, [ids]]

        def emit(b):
            nonlocal counter
            sid = f"{pid}-{counter}"
            counter += 1
            return (sid, b[1], len(b[1]), b[0], round(b[0] / max_tokens, 6))

        out = []
        for pdf in batches:
            for did, nt in zip(pdf["_id"], pdf["_nt"]):
                nt = int(nt)
                if nt >= max_tokens:
                    out.append(emit((nt, [did])))
                    continue
                for b in open_bins:
                    if b[0] + nt <= max_tokens:
                        b[0] += nt
                        b[1].append(did)
                        break
                else:
                    open_bins.append([nt, [did]])
                    if len(open_bins) > max_open_bins:
                        fullest = max(range(len(open_bins)),
                                      key=lambda i: open_bins[i][0])
                        out.append(emit(open_bins.pop(fullest)))
            if out:
                yield pd.DataFrame(
                    out, columns=["seq_id", "doc_ids", "n_docs",
                                  "total_tokens", "fill"],
                )
                out = []
        for b in open_bins:
            out.append(emit(b))
        if out:
            yield pd.DataFrame(
                out, columns=["seq_id", "doc_ids", "n_docs",
                              "total_tokens", "fill"],
            )

    h = F.md5(F.col(id_col).cast("string"))
    prepped = (
        docs.select(
            F.col(id_col).cast("string").alias("_id"),
            F.col(token_col).cast("long").alias("_nt"),
            h.alias("_h"),
        )
        .repartition(F.col("_h"))
        .sortWithinPartitions("_h", "_id")
    )
    return prepped.mapInPandas(pack, PACK_SCHEMA)


def render_sequences(
    sequences: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
    bpe_model: dict | None = None,
) -> DataFrame:
    """Materialize packed sequences into training payloads →
    (seq_id, text, n_docs, total_tokens, fill) — the step between
    :func:`pack_sequences`' assignments and what a training loader
    actually reads: each sequence's member documents concatenated IN
    PACKING ORDER, joined by ``sep`` (pass the tokenizer's EOS/
    document-separator string in a real pipeline; the default keeps
    payloads human-inspectable).

    Docs are matched on ``id_col`` against the ``doc_ids`` arrays (the
    recipe's epoch-suffixed ``row_id`` keys work too — pass the frame
    keyed the way packing saw it). A doc id missing from ``docs``
    drops out of its sequence (its tokens were budgeted but its text
    cannot be rendered) — keep the two frames from one snapshot.

    Scale shape: posexplode of assignment-sized arrays, ONE doc-keyed
    shuffle join to fetch payloads, ONE seq-keyed aggregate that
    reassembles order via ``array_sort`` over (pos, text) structs —
    the payload bytes move exactly once; nothing is driver-side.

    ``bpe_model`` (a :func:`~sifts_spark.operators.bpe.train_bpe`
    artifact) additionally emits ``token_ids ARRAY<INT>`` — each
    member encoded through the broadcast merge table
    (:func:`~sifts_spark.operators.bpe.bpe_encode_ids`) BEFORE the
    join (map-side, once per doc), members joined by the vocabulary's
    SEP id (1). A training loader then reads ids directly instead of
    re-tokenizing text the packing stage already token-counted; the
    ``text`` column stays for inspection, and
    :func:`~sifts_spark.operators.bpe.bpe_decode_ids` inverts the ids
    modulo separators (the pinned roundtrip).
    """
    asg = sequences.select(
        "seq_id",
        "total_tokens",
        "fill",
        F.posexplode("doc_ids").alias("_pos", "_id"),
    )
    payload = docs.select(
        F.col(id_col).alias("_id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("_t"),
    )
    aggs = [
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_t"))),
                lambda s: s["_t"],
            ),
            sep,
        ).alias("text"),
        F.count(F.lit(1)).alias("n_docs"),
        F.first("total_tokens").alias("total_tokens"),
        F.first("fill").alias("fill"),
    ]
    if bpe_model is not None:
        from sifts_spark.operators.bpe import SEP, bpe_encode_ids, bpe_vocab

        sep_id = bpe_vocab(bpe_model)[SEP]
        payload = payload.withColumn(
            "_ids", bpe_encode_ids(F.col("_t"), bpe_model, docs.sparkSession)
        )
        # interpose the SEP id between members, preserving pack order:
        # transform-with-index prefixes every non-first member's ids
        aggs.append(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_ids"))),
                    lambda s, i: F.when(
                        i == 0, s["_ids"]
                    ).otherwise(
                        F.concat(F.array(F.lit(sep_id)), s["_ids"])
                    ),
                )
            ).alias("token_ids")
        )
    return asg.join(payload, "_id").groupBy("seq_id").agg(*aggs)
