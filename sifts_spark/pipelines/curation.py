"""End-to-end corpus curation: the composite a training-data pipeline
actually runs, assembled from this repo's operators.

    raw docs ──┬─ language_id ──┐
               ├─ quality_score ─┼─ tag pass/fail per stage (ONE pass)
               └─ minhash LSH → clusters → canonical-keep ┘
                        │
                 kept docs → scrub_pii → token counts → curated frame
                        │
                 per-stage attrition report from ONE aggregation

Scale shape: the filter stages are map-side column tags — no row is
dropped until the end, so stage attrition comes from one groupBy over
the tag columns instead of a count() action per stage (at 100 TB,
five count() actions = five full scans). The only shuffles are the
ones the dedup operators already own (LSH band join + cluster
propagation over the dup SUBGRAPH, both |pairs|-sized).

Dedup keeps the canonical doc per near-dup cluster (cluster_id = min
doc id — deterministic, oracle-friendly), mirroring the "keep one per
group" step after any pairwise dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sifts_spark.operators.dedup import duplicate_clusters, minhash_lsh_pairs
from sifts_spark.operators.textanalysis import (
    bpe_ish_token_count,
    language_id,
    quality_score,
    scrub_pii,
)


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    allowed_langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.35,
    jaccard_threshold: float = 0.5,
    scrub: bool = True,
    soft_dedup: bool = False,
    langid_model: dict | str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """→ ``(curated, report)``.

    ``langid_model`` (a :func:`~sifts_spark.operators.textanalysis.
    train_langid` artifact dict, or a PATH to one persisted with
    :func:`~sifts_spark.functions.artifacts.save_artifact` — e.g. the
    shipped 53-language ``artifacts/langid53.json``): the language
    gate scores with the trained hashed-char-n-gram classifier
    (:func:`~sifts_spark.operators.textanalysis.langid_score` — one
    broadcast-matrix Arrow scan) instead of the 5-language marker
    lexicon, so a multilingual curation run can gate on any label set
    the model was trained over — one kwarg, no training step. Same
    ``(id, pred_lang)`` contract either way; attrition report keys
    are unchanged.

    ``curated``: (id, text, pred_lang, quality, n_tokens) — documents
    that pass language + quality gates AND are their near-dup cluster's
    canonical representative; ``text`` is PII-scrubbed when ``scrub``.

    ``soft_dedup=True`` switches the near-dup stage from hard removal
    to SoftDedup-style reweighting (He et al. 2024; see
    :func:`~sifts_spark.operators.dedup.duplicate_weights`): every
    cluster member passing the other gates is KEPT and the curated
    frame gains a ``dup_weight`` column (``1/cluster_size`` — each
    resource's aggregate contribution is 1.0) for the training
    loader / weighted sampling; cluster sizes are counted over the
    pairs-bounded member set only, singletons default to 1.

    ``report``: one row per (lang_ok, quality_ok, canonical) tag
    combination with ``n`` docs and ``tokens`` — the full attrition
    matrix from a single aggregation (not a count per stage); the
    ``canonical`` tag stays informative under ``soft_dedup`` even
    though it no longer gates.
    """
    base = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))

    if langid_model is not None:
        from sifts_spark.operators.textanalysis import langid_score

        if isinstance(langid_model, str):
            from sifts_spark.functions.artifacts import load_artifact

            langid_model = load_artifact(docs.sparkSession, langid_model)
        langs = langid_score(base, langid_model, id_col="id", text_col="text")
    else:
        langs = language_id(base, id_col="id", text_col="text")
    qual = quality_score(base, id_col="id", text_col="text")

    # near-dup canonical flag over the whole corpus (dedup BEFORE the
    # cheap filters would also be defensible; after them it would couple
    # dedup results to filter settings — keep it independent)
    pairs = minhash_lsh_pairs(
        base, id_col="id", text_col="text", jaccard_threshold=jaccard_threshold
    )
    clusters = duplicate_clusters(base, pairs, id_col="id")

    tagged = (
        base.join(langs.select("id", "pred_lang"), "id")
        .join(qual.select("id", "quality"), "id")
        .join(clusters, "id")
        .withColumn("lang_ok", F.col("pred_lang").isin(*allowed_langs))
        .withColumn("quality_ok", F.col("quality") >= F.lit(min_quality))
        .withColumn("canonical", F.col("cluster_id") == F.col("id"))
        .withColumn("n_tokens", bpe_ish_token_count(F.col("text")))
    )
    if soft_dedup:
        from sifts_spark.operators.dedup import with_cluster_sizes

        sized = with_cluster_sizes(clusters, pairs).select(
            "id", F.col("cluster_size").alias("__csize")
        )
        tagged = tagged.join(sized, "id")

    report = (
        tagged.groupBy("lang_ok", "quality_ok", "canonical")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_tokens").alias("tokens"),
        )
    )

    kept = tagged.filter(
        F.col("lang_ok")
        & F.col("quality_ok")
        & (F.col("canonical") if not soft_dedup else F.lit(True))
    )
    out_text = scrub_pii(F.col("text")) if scrub else F.col("text")
    cols = [
        F.col("id"),
        out_text.alias("text"),
        F.col("pred_lang"),
        F.col("quality"),
        F.col("n_tokens"),
    ]
    if soft_dedup:
        cols.append(
            F.round(
                F.lit(1.0) / F.col("__csize").cast("double"), 6
            ).alias("dup_weight")
        )
    curated = kept.select(*cols)
    return curated, report


def prepare_training_data(
    docs: DataFrame,
    out_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    allowed_langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.35,
    jaccard_threshold: float = 0.5,
    eval_texts=None,
    contamination_n: int = 13,
    ppl_band: tuple[float, float] | None = (0.02, 0.98),
    paragraph_dedup: bool = False,
    substring_dedup: bool = False,
    substring_k: int = 50,
    bpe_model: dict | None = None,
    quality_model: dict | None = None,
    classifier_min_prob: float = 0.5,
    classifier_pareto: bool = False,
    mix_weights: dict | None = None,
    total_tokens: int | None = None,
    max_seq_tokens: int = 2048,
    target_file_mb: float = 256.0,
    scrub: bool = True,
    url_col: str | None = None,
    blocked_domains=None,
    psl=None,
    url_dedup: bool = False,
    max_docs_per_domain: int | None = None,
    c4_rules: bool = False,
    bad_words: tuple[str, ...] = (),
    soft_dedup: bool = False,
    gopher_rules: bool = False,
    gopher_repetition: bool = False,
    holdout_frac: float = 0.0,
    split_seed: str = "holdout",
    semantic_dedup_eps: float | None = None,
    render_sequence_text: bool = False,
    sequence_sep: str = "\n\n",
    langid_model: dict | str | None = None,
) -> dict:
    """Raw docs → training shards, end-to-end → manifest dict.

    The full recipe a pretraining-data job runs, composed from this
    repo's operators in their published order (URL blocklist → CCNet →
    Gopher → GPT-3 decontamination → Pile/DoReMi mixing → packing):

    0. optional domain blocklist (C4/RefinedWeb's first gate) — when
       ``blocked_domains`` (list or ``domain``-column DataFrame) and
       ``url_col`` are given, rows whose registrable domain is listed
       drop before any content stage
       (:func:`~sifts_spark.operators.urls.filter_domains` — map-side
       broadcast anti-join, the cheapest filter runs first); pass
       ``psl`` (a :class:`~sifts_spark.operators.urls
       .PublicSuffixList`) to key the blocklist on full-PSL eTLD+1;
    0b. optional URL-keyed dedup (``url_dedup=True``, requires
       ``url_col``) — refetches of one resource under different
       spellings (tracking params, fragments, default ports, param
       order) keep only the min-id copy BEFORE any text is parsed
       (:func:`~sifts_spark.operators.urls.dedup_by_url`; rows with
       unparseable URLs all survive);
    0c. optional per-domain cap (``max_docs_per_domain``, requires
       ``url_col``) — no registrable domain contributes more than N
       docs (RefinedWeb §3.1's anti-spam stage; deterministic
       hash-order sample per domain,
       :func:`~sifts_spark.operators.urls.cap_domains`; ``psl``
       applies here too);
    0d. optional C4 cleaning rules (``c4_rules=True``) — terminal-
       punctuation / min-words / javascript line filters rewrite each
       doc, then the ≥5-sentence, lorem-ipsum, brace and ``bad_words``
       page gates drop docs (Raffel et al. 2020 §2.2,
       :func:`~sifts_spark.operators.textanalysis.c4_clean` — map-side,
       before any scoring so later stages see clean text);
    0e. optional Gopher quality rules (``gopher_rules=True``) — docs
       failing MassiveWeb's document-shape gates drop (word count,
       mean word length, symbol/bullet/ellipsis ratios, alpha-word
       fraction, stopword presence; Rae et al. 2021 app. A1.1,
       :func:`~sifts_spark.operators.textanalysis.gopher_quality` —
       one map-side semi-join gate);
    0f. optional Gopher repetition rules (``gopher_repetition=True``)
       — docs failing any of the 13 repetition-removal signals drop
       (dup line/paragraph fractions by count and chars, top-2/3/4-
       gram char coverage, dup-5..10-gram char coverage; Rae et al.
       2021 app. A1.1, :func:`~sifts_spark.operators.textanalysis
       .gopher_repetition` — one Arrow-kernel semi-join gate);
    1. :func:`curate_corpus` — langid + quality gates, near-dup
       canonical keep, PII scrub (one-pass tag semantics);
       ``soft_dedup=True`` keeps near-dup cluster members and carries
       a ``dup_weight`` column (``1/cluster_size``) through every
       later stage into the docs export — sampling-time downweighting
       for the training loader instead of hard removal
       (``manifest["dedup_mode"]`` records which);
    1a2. optional SEMANTIC dedup (``semantic_dedup_eps``, e.g. 0.95) —
       the SemDeDup stage (Abbas et al. 2023): hash-embed the curated
       text (:func:`~sifts_spark.operators.embedding.embed_hashing`,
       128-dim feature hashing — the documented lexical stand-in; for
       neural semantic dedup run :func:`~sifts_spark.operators.dedup
       .semdedup` yourself over real embeddings), k-means-cluster,
       and within each cell keep one doc per eps-cosine connected
       component (the least prototypical member — the paper's
       diversity-preserving choice);
    1b. optional corpus-wide paragraph dedup (CCNet's line-hash stage,
       ``paragraph_dedup=True``) — boilerplate paragraphs keep only
       their first occurrence; texts are rewritten and token counts
       recomputed; docs left empty drop out;
    1b2. optional exact-substring dedup (Lee et al. 2021's ExactSubstr
       stage, ``substring_dedup=True``) — duplicated runs of
       >= ``substring_k`` tokens keep only their corpus-wide first
       copy (:func:`~sifts_spark.operators.substring
       .remove_duplicate_spans` in exact mode — one fingerprint per
       token, full-run span coverage);
    1c. optional model-based quality filter (GPT-3's classifier stage,
       ``quality_model`` from :func:`~sifts_spark.operators.classifier
       .train_quality_classifier`) — hard threshold
       ``classifier_min_prob``, or the stochastic Pareto keep rule
       when ``classifier_pareto=True``;
    2. decontamination — drop docs overlapping ``eval_texts`` by
       ``contamination_n``-grams (skipped when no eval set given);
    3. perplexity band — train a unigram LM on the survivors, keep
       docs inside the ``ppl_band`` quantile band (CCNet keeps the
       low/middle band; both tails are suspect — skipped when None);
    3b. optional holdout split (``holdout_frac`` > 0) — a
       deterministic md5-keyed fraction of the fully-filtered corpus
       peels off to ``{out_path}/holdout`` BEFORE mixing/packing (so
       held-out docs never consume the token budget or leak into
       training sequences), via :func:`~sifts_spark.operators.sampling
       .split_corpus` hash mode — membership depends only on
       ``(split_seed, id)``, so the holdout set is stable across
       corpus versions (holdout token counts stay the regex proxy;
       eval sets don't need BPE budgets);
    4. mixing — :func:`~sifts_spark.operators.sampling.mix_corpus`
       to ``mix_weights`` over predicted language at ``total_tokens``
       (skipped unless both given); when a trained ``bpe_model``
       (:func:`~sifts_spark.operators.bpe.train_bpe`) is supplied,
       mixing and packing budget in TRUE BPE tokens — ``n_tokens`` is
       recomputed through the broadcast merge table instead of the
       regex proxy (``manifest["token_counter"]`` records which);
    5. packing — :func:`~sifts_spark.operators.sampling
       .pack_sequences` into ``max_seq_tokens`` bins;
    6. export — docs to ``{out_path}/docs`` and the packing manifest
       to ``{out_path}/sequences`` via the calibrated-shard sink;
       ``render_sequence_text=True`` additionally materializes the
       CONCATENATED training payloads (:func:`~sifts_spark.operators
       .sampling.render_sequences`, members joined by
       ``sequence_sep`` in packing order) to
       ``{out_path}/sequences_text`` — what a loader that doesn't
       re-join docs itself reads; with ``bpe_model`` also supplied,
       each payload row carries ``token_ids ARRAY<INT>``
       (SEP-id-joined, :func:`~sifts_spark.operators.bpe
       .bpe_encode_ids`) so the loader never re-tokenizes
       (``manifest["sequence_token_ids"]`` records it).

    Driver actions: one count per stage boundary (5 small aggs over a
    persisted frame — attrition numbers are the POINT of the manifest;
    a silent pipeline at 100 TB is undebuggable) plus the LM/quantile
    training the stages own. Stage frames persist/unpersist around
    their reuse.
    """
    from sifts_spark.operators.sampling import mix_corpus, pack_sequences
    from sifts_spark.operators.textanalysis import (
        find_contaminated,
        perplexity_score,
        train_unigram_lm,
    )
    from sifts_spark.pipelines.export import export_corpus

    manifest: dict = {"stages": {}}
    manifest["stages"]["input"] = docs.count()

    # Pre-curation (stage-0) chain: persist each derived frame before
    # its attrition count and drop the superseded parent — otherwise
    # every later stage's count() (and curation's own consumption)
    # re-executes the whole unpersisted upstream chain: with four
    # optional stages enabled the source scan + URL-dedup window +
    # cap window + C4 rewrite would each run ~5x.
    stage0 = None

    def _gate(new_docs, label):
        nonlocal docs, stage0
        new_docs = new_docs.persist()
        manifest["stages"][label] = new_docs.count()
        if stage0 is not None:
            stage0.unpersist()
        stage0 = new_docs
        docs = new_docs

    if blocked_domains is not None:
        if url_col is None:
            raise ValueError("blocked_domains requires url_col")
        from sifts_spark.operators.urls import filter_domains

        _gate(
            filter_domains(docs, blocked_domains, url_col, psl=psl),
            "domain_filtered",
        )
    if url_dedup:
        if url_col is None:
            raise ValueError("url_dedup requires url_col")
        from sifts_spark.operators.urls import dedup_by_url

        _gate(dedup_by_url(docs, url_col, id_col=id_col), "url_deduped")
    if max_docs_per_domain is not None:
        if url_col is None:
            raise ValueError("max_docs_per_domain requires url_col")
        from sifts_spark.operators.urls import cap_domains

        _gate(
            cap_domains(
                docs, url_col, max_docs=max_docs_per_domain,
                id_col=id_col, psl=psl,
            ),
            "domain_capped",
        )
    if c4_rules:
        from sifts_spark.operators.textanalysis import c4_clean

        _gate(
            c4_clean(
                docs, id_col=id_col, text_col=text_col, bad_words=bad_words
            ),
            "c4_cleaned",
        )
    if gopher_rules:
        from sifts_spark.operators.textanalysis import gopher_quality

        keep = (
            gopher_quality(docs, id_col=id_col, text_col=text_col)
            .filter(F.col("gopher_pass"))
            .select(F.col("id").alias(id_col))
        )
        _gate(docs.join(keep, id_col, "left_semi"), "gopher_filtered")
    if gopher_repetition:
        from sifts_spark.operators.textanalysis import (
            gopher_repetition as _gopher_rep,
        )

        keep = (
            _gopher_rep(docs, id_col=id_col, text_col=text_col)
            .filter(F.col("gopher_rep_pass"))
            .select(F.col("id").alias(id_col))
        )
        _gate(docs.join(keep, id_col, "left_semi"), "gopher_rep_filtered")
    curated, report = curate_corpus(
        docs, id_col=id_col, text_col=text_col,
        allowed_langs=allowed_langs, min_quality=min_quality,
        jaccard_threshold=jaccard_threshold, scrub=scrub,
        soft_dedup=soft_dedup, langid_model=langid_model,
    )
    manifest["dedup_mode"] = "soft" if soft_dedup else "hard"
    # which classifier gated the language stage (provenance, like
    # token_counter / sequence_token_ids)
    manifest["langid"] = "model" if langid_model is not None else "marker"
    curated = curated.persist()
    manifest["stages"]["curated"] = curated.count()
    manifest["attrition"] = [r.asDict() for r in report.collect()]
    if stage0 is not None:
        stage0.unpersist()  # curation has materialized past it

    # each superseded stage unpersists once its successor materializes
    # (a leaked persist per stage would pin 3 copies of the corpus in
    # executor storage through packing and both exports)
    stage = curated

    def _advance(new_stage):
        nonlocal stage
        new_stage = new_stage.persist()
        n = new_stage.count()  # materialize BEFORE dropping the parent
        if stage is not curated:
            stage.unpersist()
        stage = new_stage
        return n

    if semantic_dedup_eps is not None:
        from sifts_spark.operators.dedup import semdedup
        from sifts_spark.operators.embedding import embed_hashing
        from sifts_spark.operators.vector_search import kmeans_centroids

        # persisted: the embed kernel feeds both the centroid sample
        # and the semdedup scan — unpersisted it would run twice
        emb = embed_hashing(
            stage, id_col="id", text_col="text", dim=128
        ).persist()  # 128: the measured config (DEDUP_EVAL/EXT_BENCH)
        cents = kmeans_centroids(emb, vec_col="embedding")
        keep = (
            semdedup(
                emb, id_col="id", vec_col="embedding",
                centroids=cents, eps=semantic_dedup_eps,
            )
            .filter(F.col("keep"))
            .select("id")
        )
        manifest["stages"]["semantic_deduped"] = _advance(
            stage.join(keep, "id", "left_semi")
        )
        emb.unpersist()

    if paragraph_dedup:
        from sifts_spark.operators.dedup import dedup_paragraphs

        rewritten = dedup_paragraphs(stage, id_col="id", text_col="text")
        manifest["stages"]["paragraph_deduped"] = _advance(
            stage.drop("text", "n_tokens")
            .join(rewritten.filter(F.col("n_kept") > 0).select("id", "text"), "id")
            .withColumn("n_tokens", bpe_ish_token_count(F.col("text")))
        )

    if substring_dedup:
        from sifts_spark.operators.substring import remove_duplicate_spans

        cut = remove_duplicate_spans(
            stage, id_col="id", text_col="text", k=substring_k,
        )
        manifest["stages"]["substring_deduped"] = _advance(
            stage.drop("text", "n_tokens")
            .join(
                # rlike, not trim: docs reduced to '\n'/'\t' remnants
                # must drop out, and trim strips only space (0x20)
                cut.filter(~F.col("text").rlike(r"^\s*$"))
                .select("id", "text"),
                "id",
            )
            .withColumn("n_tokens", bpe_ish_token_count(F.col("text")))
        )

    if quality_model is not None:
        from sifts_spark.operators.classifier import classifier_score, pareto_keep

        scored = classifier_score(stage, quality_model, id_col="id", text_col="text")
        keep_ids = (
            scored.filter(pareto_keep("quality_prob", "id"))
            if classifier_pareto
            else scored.filter(F.col("quality_prob") >= F.lit(classifier_min_prob))
        ).select("id")
        manifest["stages"]["classifier_filtered"] = _advance(stage.join(keep_ids, "id"))

    if eval_texts is not None:
        flagged = find_contaminated(
            stage, eval_texts, n=contamination_n, id_col="id", text_col="text"
        ).select("id")
        manifest["stages"]["decontaminated"] = _advance(
            stage.join(flagged, "id", "left_anti")
        )

    if ppl_band is not None:
        lm = train_unigram_lm(stage, text_col="text")
        ppl = perplexity_score(stage, lm, id_col="id", text_col="text")
        lo, hi = ppl.filter(F.col("perplexity").isNotNull()).approxQuantile(
            "perplexity", list(ppl_band), 0.001
        )
        keep = ppl.filter(
            F.col("perplexity").between(lo, hi)
        ).select("id")
        manifest["stages"]["ppl_band"] = _advance(stage.join(keep, "id"))
        manifest["ppl_cutoffs"] = {"low": lo, "high": hi}

    if holdout_frac:
        if not (0.0 < holdout_frac < 1.0):
            raise ValueError(
                f"holdout_frac must be in (0, 1): {holdout_frac}"
            )
        from sifts_spark.operators.sampling import split_corpus

        tagged = split_corpus(
            stage,
            {"train": 1.0 - holdout_frac, "holdout": holdout_frac},
            id_col="id",
            seed=split_seed,
        )
        holdout = tagged.filter(F.col("split") == "holdout").drop("split")
        holdout = holdout.persist()
        manifest["stages"]["holdout"] = holdout.count()
        manifest["export_holdout"] = export_corpus(
            holdout,
            f"{out_path.rstrip('/')}/holdout",
            target_file_mb=target_file_mb,
        )
        holdout.unpersist()
        manifest["stages"]["train_split"] = _advance(
            tagged.filter(F.col("split") == "train").drop("split")
        )

    if bpe_model is not None:
        from sifts_spark.operators.bpe import bpe_token_count

        # through _advance, NOT a bare rebind: the derived frame must
        # be persisted (or packing + export each re-run the BPE kernel
        # over the whole corpus) and the PARENT stage frame must be the
        # one unpersisted (uncache matches exact plans only — dropping
        # the handle to a persisted parent leaks it in executor
        # storage through both exports)
        manifest["stages"]["bpe_counted"] = _advance(
            stage.withColumn(
                "n_tokens",
                bpe_token_count(F.col("text"), bpe_model, stage.sparkSession),
            )
        )
        manifest["token_counter"] = "bpe"
    else:
        manifest["token_counter"] = "regex"

    if mix_weights and total_tokens:
        manifest["stages"]["mixed"] = _advance(
            mix_corpus(
                stage, "pred_lang", "n_tokens", mix_weights, total_tokens,
                id_col="id",
            )
        )
        stage_persisted = stage
    else:
        # keep the PERSISTED handle: unpersisting the withColumn-derived
        # plan below would be a no-op (uncache matches exact plans only
        # — the bpe-block lesson) and leak the last stage through
        # packing and every export
        stage_persisted = stage
        stage = stage.withColumn("epoch", F.lit(0))

    # packing needs a unique row key once upsampling introduced epochs
    packable = stage.select(
        F.concat_ws("#", F.col("id").cast("string"), F.col("epoch").cast("string")).alias("row_id"),
        "n_tokens",
    )
    seqs = pack_sequences(packable, "row_id", "n_tokens", max_seq_tokens)
    if render_sequence_text:
        # two consumers (payload render + assignment export): persist
        # so the packing kernel runs once; packing is deterministic, so
        # this is cost, not correctness
        seqs = seqs.persist()
    manifest["export_docs"] = export_corpus(
        stage, f"{out_path.rstrip('/')}/docs", target_file_mb=target_file_mb
    )
    if render_sequence_text:
        from sifts_spark.operators.sampling import render_sequences

        # the epoch-suffixed row_id keys the payload frame exactly the
        # way packing saw it, so upsampled epochs render their copy too
        rendered = render_sequences(
            seqs,
            stage.select(
                F.concat_ws(
                    "#",
                    F.col("id").cast("string"),
                    F.col("epoch").cast("string"),
                ).alias("row_id"),
                "text",
            ),
            id_col="row_id",
            sep=sequence_sep,
            # with a BPE model the payload gains token_ids ARRAY<INT>
            # (SEP-joined, loader-ready) alongside the text
            bpe_model=bpe_model,
        )
        manifest["sequence_token_ids"] = bpe_model is not None
        manifest["export_sequence_text"] = export_corpus(
            rendered,
            f"{out_path.rstrip('/')}/sequences_text",
            target_file_mb=target_file_mb,
        )
    manifest["export_sequences"] = export_corpus(
        seqs, f"{out_path.rstrip('/')}/sequences", target_file_mb=target_file_mb
    )
    if render_sequence_text:
        seqs.unpersist()
    if stage_persisted is not curated:
        stage_persisted.unpersist()
    curated.unpersist()
    return manifest
