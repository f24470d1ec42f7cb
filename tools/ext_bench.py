"""Two-scale bench for the extension-operator family (SURVEY §6.1).

Usage: python tools/ext_bench.py [sf_dir]  (default /root/testdata/sf0.1;
run again with .scale/sf1 from tools/make_scale.py for the 10× column).

Times the round-5/6 LLM-pipeline extension operators best-of-3 on a
noop sink, model/index training measured separately as setup (a real
deployment trains once and scores per-batch). Prints ONE JSON line:
{"sf_dir": ..., "setup": {...}, "queries": {...}} — the artifact SURVEY's
extension-family ratio table quotes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")

    # Host-epoch stamps (r16): single-thread AND all-core probes —
    # cross-round ext rows are only comparable between artifacts whose
    # BOTH stamps agree (the r15 fts_cjk_substr postmortem: equal
    # single-thread stamps, 1.7x apart on 32 threads).
    import bench as _bench

    calib = _bench.calibration_sec()
    calib_par = _bench.calibration_parallel_sec()

    from pyspark.sql import functions as F

    from sifts_spark.caching import release_all
    from sifts_spark.operators.bpe import bpe_token_count, train_bpe
    from sifts_spark.operators.classifier import (
        classifier_score,
        importance_weights,
        train_quality_classifier,
        weighted_sample,
    )
    from sifts_spark.operators.dedup import dedup_paragraphs, semdedup
    from sifts_spark.operators.substring import (
        duplicate_spans,
        remove_duplicate_spans,
    )
    from sifts_spark.operators.textanalysis import train_unigram_lm
    from sifts_spark.operators.vector_search import kmeans_centroids
    from sifts_spark.session import get_spark
    from sifts_spark.sources.tables import load_table

    spark = get_spark(
        "sifts-ext-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # Arrow worker-pool warmup (same rationale as bench.py)
    from pyspark.sql.functions import pandas_udf
    import pandas as pd  # noqa: F401

    @pandas_udf("double")
    def _warm(s):
        return s * 1.0

    spark.range(256).repartition(int(cpus)).select(
        _warm(F.col("id").cast("double"))
    ).write.format("noop").mode("overwrite").save()
    # ... and one shuffle+agg over a real scan: the session's first
    # distributed groupBy pays whole-stage-codegen compilation (~14s
    # measured landing on whichever setup step runs first; with this
    # warmup the first LM train drops to the same ~1-2s as the second)
    docs.limit(2000).groupBy("lang").count().write.format("noop").mode(
        "overwrite"
    ).save()

    setup: dict[str, float] = {}

    def timed_setup(name, fn):
        t0 = time.perf_counter()
        out = fn()
        setup[name] = round(time.perf_counter() - t0, 3)
        return out

    # models trained once (setup): classifier, source/target LMs, BPE,
    # k-means centroids — each driver-sized
    half = docs.filter(F.col("doc_id") % 2 == 0)
    other = docs.filter(F.col("doc_id") % 2 == 1)
    clf = timed_setup(
        "classifier_train",
        lambda: train_quality_classifier(
            half, other, text_col="text", sample_per_class=2000, epochs=30
        ),
    )
    lm_t = timed_setup(
        "lm_target_train", lambda: train_unigram_lm(half, vocab_size=20_000)
    )
    lm_s = timed_setup(
        "lm_source_train", lambda: train_unigram_lm(other, vocab_size=20_000)
    )
    bpe = timed_setup(
        "bpe_train",
        lambda: train_bpe(docs, num_merges=2000, sample_docs=5000),
    )
    cents = timed_setup("kmeans_centroids", lambda: kmeans_centroids(emb))
    from sifts_spark.operators.textanalysis import train_hashed_ngram_lm

    big_t = timed_setup(
        "bigram_lm_target_train",
        lambda: train_hashed_ngram_lm(half, n=2, num_buckets=1 << 18),
    )
    big_s = timed_setup(
        "bigram_lm_source_train",
        lambda: train_hashed_ngram_lm(other, n=2, num_buckets=1 << 18),
    )
    # image payloads synthesized from doc text bytes: the pHash bench
    # measures the hashing + pairing engine, not a codec
    from sifts_spark.operators.multimodal import image_phash_pairs

    media = docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )

    # WET shards synthesized from the corpus (setup): Common Crawl
    # convention, one gzip member per record, 16 shards — the read_wet
    # row then measures the binaryFile -> streaming-inflate -> Arrow
    # parse path end to end (shards/sec = 16 / best_sec).
    import tempfile

    from sifts_spark.sources.warc import read_wet

    wet_dir = tempfile.mkdtemp(prefix="ext_bench_wet_")
    _NSH = 16

    def _write_wet_shards():
        def write_part(idx, it):
            import gzip as _gz
            import os as _os

            path = _os.path.join(wet_dir, f"shard{idx:04d}.warc.wet.gz")
            with open(path, "wb") as f:
                for row in it:
                    body = (row["text"] or "").encode()
                    did = row["doc_id"]
                    # realistic URL mix (same families as the crawl
                    # frame) so the wet→export e2e's stage-0 blocklist
                    # has real registrable domains to match
                    fam = int(did) % 4
                    if fam == 0:
                        uri = f"https://www.{row['source']}.example.com/a/{did}"
                    elif fam == 1:
                        uri = f"https://news.{row['source']}.example.com/b"
                    elif fam == 2:
                        uri = f"http://shop.{row['source']}.co.uk/c?x={did}"
                    else:
                        uri = f"http://10.0.0.{int(did) % 250}/d"
                    head = (
                        "WARC/1.0\r\nWARC-Type: conversion\r\n"
                        f"WARC-Record-ID: d{did}\r\n"
                        f"WARC-Target-URI: {uri}\r\n"
                        f"Content-Length: {len(body)}\r\n\r\n"
                    ).encode()
                    f.write(_gz.compress(head + body + b"\r\n\r\n"))
            return iter(())

        docs.select("doc_id", "source", "text").repartition(_NSH).rdd \
            .mapPartitionsWithIndex(write_part).count()

    timed_setup("wet_shard_synthesis", _write_wet_shards)

    # HTML pages + crawl URLs synthesized MAP-SIDE from the corpus
    # (format_string — no driver materialization): the extract row
    # measures the stdlib block-parser kernel, the domain rows the
    # JVM-expression host/eTLD+1 path over a realistic URL mix.
    from sifts_spark.operators.htmltext import extract_main_text
    from sifts_spark.operators.urls import domain_stats, filter_domains

    # repartition: the testdata table is ONE parquet file (one scan
    # partition), but real HTML arrives shard-parallel (read_warc_html:
    # one task per WARC shard) — a single-core number would misstate
    # the operator's shape by ~cpus×
    pages = docs.repartition(int(cpus)).select(
        F.col("doc_id").cast("string").alias("id"),
        F.format_string(
            "<html><head><title>Doc %s</title></head><body>"
            "<nav><a href='/'>Home</a> <a href='/b'>Browse</a> "
            "<a href='/l'>Login</a></nav><article><h2>Doc %s</h2>"
            "<p>%s</p></article><footer><a href='/t'>Terms</a> "
            "<a href='/p'>Privacy</a></footer></body></html>",
            "doc_id", "doc_id", "text",
        ).alias("html"),
    )
    crawl = docs.withColumn(
        "url",
        F.expr(
            "CASE CAST(doc_id AS INT) % 4"
            " WHEN 0 THEN 'https://www.' || source || '.example.com/a/' || doc_id"
            " WHEN 1 THEN 'https://news.' || source || '.example.com/b'"
            " WHEN 2 THEN 'http://shop.' || source || '.co.uk/c?x=' || doc_id"
            " ELSE 'http://10.0.0.' || (CAST(doc_id AS INT) % 250) || '/d' END"
        ),
    )
    blocked = [f"src{i}.co.uk" for i in range(100)]

    from sifts_spark.operators.chunking import chunk_documents
    from sifts_spark.operators.embedding import (
        embed_hashing as _embed_hashing,
    )
    from sifts_spark.operators.sampling import split_corpus
    from sifts_spark.operators.textanalysis import (
        c4_clean,
        gopher_repetition,
        keywords_tfidf,
        script_stats,
    )
    from sifts_spark.operators.topics import topic_clusters
    from sifts_spark.operators.urls import cap_domains, dedup_by_url

    docs_emb = docs.join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
    )

    QUERIES = {
        "classifier_score": lambda: classifier_score(docs, clf),
        # repartition: mapInPandas inherits the scan's partitioning and
        # the testdata table is ONE file — same rationale as `pages`
        "chunk_documents": lambda: chunk_documents(
            docs.repartition(int(cpus)), max_tokens=256, overlap_tokens=32
        ),
        "keywords_tfidf": lambda: keywords_tfidf(docs, k=5),
        "dsir_weights": lambda: importance_weights(docs, lm_t, lm_s),
        "dsir_sample": lambda: weighted_sample(
            importance_weights(docs, lm_t, lm_s), n=1000
        ),
        "paragraph_dedup": lambda: dedup_paragraphs(docs),
        "substring_spans_winnow": lambda: duplicate_spans(docs, k=20, w=8),
        "substring_remove_exact": lambda: remove_duplicate_spans(docs, k=20),
        "bpe_token_count": lambda: docs.select(
            "doc_id", bpe_token_count(F.col("text"), bpe, spark).alias("n")
        ),
        "semdedup": lambda: semdedup(emb, centroids=cents, eps=0.95),
        "dsir_weights_bigram": lambda: importance_weights(docs, big_t, big_s),
        "image_phash_pairs": lambda: image_phash_pairs(media, max_hamming=0),
        "read_wet": lambda: read_wet(spark, wet_dir)[0],
        "extract_html_text": lambda: extract_main_text(pages),
        "domain_stats": lambda: domain_stats(crawl, "url", text_col="text"),
        "filter_domains": lambda: filter_domains(crawl, blocked, "url"),
        # r10 URL/cleaning family: canonicalize+window URL dedup, the
        # skew-proof per-domain cap, and the one-pass C4 rule stack
        "url_dedup": lambda: dedup_by_url(crawl, "url"),
        "cap_domains_hash": lambda: cap_domains(
            crawl, "url", max_docs=50, method="hash"
        ),
        "c4_clean": lambda: c4_clean(docs),
        # r10 curation/audit family: the full Gopher repetition kernel,
        # script composition, the map-side corpus split, and topic
        # labels over pre-trained centroids (training is `kmeans_
        # centroids` in setup). script_stats repartitions for the same
        # one-file reason as `pages`; gopher_repetition carries its own
        # parallelism guard.
        "gopher_repetition": lambda: gopher_repetition(docs),
        "script_stats": lambda: script_stats(
            docs.repartition(int(cpus))
        ),
        "split_corpus_hash": lambda: split_corpus(
            docs, {"train": 0.98, "holdout": 0.02}
        ),
        "topic_clusters": lambda: topic_clusters(
            docs_emb, centroids=cents, k_terms=10
        )[1],
        # carries its own parallelism guard, like gopher_repetition
        "embed_hashing": lambda: _embed_hashing(docs, dim=128),
    }

    # r12: phrase-path scale contrast (positional postings vs the
    # content-verify fallback) + timing rows for the pool-bounded
    # rerankers (r11 verdict item 7). Postings written term-sorted to
    # parquet in setup — both rows then measure QUERY cost on the
    # on-disk index, like a deployment.
    from sifts_spark.functions.text import tokenize as _tokenize
    from sifts_spark.functions.snippets import snippet_column
    from sifts_spark.functions.vector import cosine_similarity
    from sifts_spark.operators import search as S_search
    from sifts_spark.operators.vector_search import mmr_select
    from sifts_spark.queryparser import parse_query

    sdocs = docs.select(
        F.col("doc_id").cast("string").alias("id"),
        F.col("text").alias("content"),
    )
    pos_idx = tempfile.mkdtemp(prefix="ext_bench_pos_postings_")
    plain_idx = tempfile.mkdtemp(prefix="ext_bench_postings_")
    timed_setup(
        "positional_postings_build",
        lambda: S_search.write_postings(
            S_search.build_postings(sdocs, positions=True), pos_idx
        ),
    )
    timed_setup(
        "plain_postings_build",
        lambda: S_search.write_postings(
            S_search.build_postings(sdocs), plain_idx
        ),
    )
    release_all()

    def _dir_bytes(path):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(path)
            for f in fs
        )

    # size side of the index_positions default decision (r12 item 6):
    # the positional layout's on-disk overhead vs the plain postings,
    # published at both scales next to the build-time rows above
    setup["plain_postings_bytes"] = _dir_bytes(plain_idx)
    setup["positional_postings_bytes"] = _dir_bytes(pos_idx)
    _PHRASE = parse_query('"hash join"')  # ~6% of docs match the run,
    # ~63% contain both (individually common) words — the 11x candidate
    # gap the positional index exists to avoid re-reading as text

    def _phrase_positional():
        # index-side adjacency: candidate-pool-sized postings work,
        # content bytes never read (_pending is all-False on a fully
        # positional index; dropped here as a deployment would)
        return S_search.search_postings(
            spark.read.parquet(pos_idx), _PHRASE
        ).drop("_pending")

    def _phrase_content_verify():
        # the positions-free plan: all-words-present superset joins the
        # corpus text and re-tokenizes every candidate — ~11x more docs
        # move their content bytes than match
        cand = S_search.search_postings(
            spark.read.parquet(plain_idx), _PHRASE
        )
        return sdocs.join(cand, "id").filter(
            _PHRASE.to_column(_tokenize(F.col("content")))
        ).select("id", "rank")

    QUERIES["phrase_positional_index"] = _phrase_positional
    QUERIES["phrase_content_verify"] = _phrase_content_verify

    # leading-* serving strategies (r16): the term DICTIONARY answers
    # a token-substring ask (endswith over the sorted term column —
    # index bytes, no re-tokenization) vs the scan predicate
    # re-tokenizing the corpus. Suffix("mer") ⊂ customer/merge-ish
    # vocab — a common-word ask, the honest high-selectivity case.
    from sifts_spark.queryparser import Suffix

    _SUFFIX_Q = Suffix("mer")

    def _suffix_term_dict():
        return S_search.search_postings(
            spark.read.parquet(plain_idx), _SUFFIX_Q
        )

    def _suffix_scan():
        return S_search.match_filter(sdocs, _SUFFIX_Q, "content").select(
            "id"
        )

    QUERIES["suffix_term_dict"] = _suffix_term_dict
    QUERIES["suffix_scan"] = _suffix_scan

    # fuzzy term match (r16): levenshtein over the same term dictionary
    # (non-prunable term-column scan — the Prefix cost class); the ~2
    # variant (r17) puts the wider distance's cost on record: the cond
    # is the same one-pass levenshtein, so the delta is candidate
    # volume, not probe shape
    from sifts_spark.queryparser import Fuzzy

    QUERIES["fuzzy_term_dict"] = lambda: S_search.search_postings(
        spark.read.parquet(plain_idx), Fuzzy("merge", 1)
    )
    QUERIES["fuzzy2_term_dict"] = lambda: S_search.search_postings(
        spark.read.parquet(plain_idx), Fuzzy("merge", 2)
    )

    # ---- cjk_bigram family at scale (r14): the honest cost/benefit of
    # bigram expansion. Corpus: the documents table letter-translated to
    # CJK and fully despaced (digits/punct stay and segment runs — the
    # realistic shape), so every doc is a handful of long unspaced runs.
    # Measured: positional bigram postings build + on-disk bytes (each
    # CJK char lands in ~2 bigrams → rows scale with CHARS not words —
    # the amplification a deployment sizes disks for), then the same
    # substring query answered index-side vs by the scan predicate.
    from sifts_spark.functions.text import TOKENIZER_CJK

    _CJK26 = "一二三四五六七八九十百千万上下左右中大小山水火木金土"
    _L26 = "abcdefghijklmnopqrstuvwxyz"
    cdocs = docs.select(
        F.col("doc_id").cast("string").alias("id"),
        F.regexp_replace(
            F.translate(F.lower(F.col("text")), _L26, _CJK26),
            r"\s+",
            "",
        ).alias("content"),
    )
    cjk_idx = tempfile.mkdtemp(prefix="ext_bench_cjk_postings_")
    timed_setup(
        "cjk_postings_build",
        lambda: S_search.write_postings(
            S_search.build_postings(
                cdocs, positions=True, tokenizer=TOKENIZER_CJK
            ),
            cjk_idx,
        ),
    )
    setup["cjk_postings_bytes"] = _dir_bytes(cjk_idx)
    release_all()
    # the same written phrase as _PHRASE, translated + despaced: a
    # substring of longer runs, answerable ONLY under the bigram family
    _CJK_Q = parse_query(
        "hashjoin".translate(str.maketrans(_L26, _CJK26)),
        tokenizer=TOKENIZER_CJK,
    )

    def _cjk_substr_postings():
        return S_search.search_postings(
            spark.read.parquet(cjk_idx), _CJK_Q
        ).drop("_pending")

    def _cjk_substr_scan():
        return S_search.match_filter(
            cdocs, _CJK_Q, "content", tokenizer=TOKENIZER_CJK
        ).select("id")

    # exact run-boundary verify cost (r15): both physical strategies
    # with the opt-in precision knob on — the scan folds one raw
    # Contains per gram-chain phrase into the predicate; the postings
    # path pays the Collection.query(exact_runs=True) serving shape
    # (candidates joined to content, structural re-verify — the
    # positions-free verify cost class)
    def _cjk_substr_scan_exact():
        return S_search.match_filter(
            cdocs, _CJK_Q, "content", tokenizer=TOKENIZER_CJK,
            exact_runs=True,
        ).select("id")

    def _cjk_substr_postings_exact():
        from sifts_spark.operators.search import exact_runs_verify

        cand = S_search.search_postings(
            spark.read.parquet(cjk_idx), _CJK_Q
        ).drop("_pending")
        return exact_runs_verify(
            cand.join(cdocs, "id"), _CJK_Q, "content", TOKENIZER_CJK
        ).select("id")

    QUERIES["cjk_substr_postings"] = _cjk_substr_postings
    QUERIES["cjk_substr_scan"] = _cjk_substr_scan
    QUERIES["cjk_substr_postings_exact"] = _cjk_substr_postings_exact
    QUERIES["cjk_substr_scan_exact"] = _cjk_substr_scan_exact

    # ---- trigram family on an ORDINARY latin corpus (late r14): the
    # number a user choosing between unicode (word match) and trigram
    # (universal within-word substring) needs — what the substring
    # capability costs in index bytes/build on text that doesn't need
    # CJK handling, and what it buys vs re-scanning.
    from sifts_spark.functions.text import TOKENIZER_TRIGRAM

    tri_idx = tempfile.mkdtemp(prefix="ext_bench_tri_postings_")
    timed_setup(
        "trigram_postings_build",
        lambda: S_search.write_postings(
            S_search.build_postings(
                sdocs, positions=True, tokenizer=TOKENIZER_TRIGRAM
            ),
            tri_idx,
        ),
    )
    setup["trigram_postings_bytes"] = _dir_bytes(tri_idx)
    release_all()
    # ---- stop-gram position pruning (r16, VERDICT item 4): the
    # trigram sidecar is ~3x word-positional bytes, dominated by the
    # position arrays of high-df grams. stop_df_ratio empties those
    # arrays (postings + tf/df stay; adjacency degrades to the
    # _pending content-verify leg — recall-equality pinned in
    # tests/test_search_positions.py). Distribution first: on THIS
    # synthetic vocab (~30 words) the gram-df histogram is degenerate —
    # nearly every gram sits at df/N 0.78-0.92, so a cap any real
    # corpus would use (Zipf tail keeps most grams positional) prunes
    # ~everything here; the rows below are therefore the WORST case:
    # max bytes win, query degraded to verify on ~all candidates.
    tri_stats = (
        spark.read.parquet(tri_idx)
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum(F.size("pos")).alias("positions"),
        )
    )
    n_docs_tri = sdocs.count()
    dist = (
        tri_stats.select(
            F.count(F.lit(1)).alias("grams"),
            F.sum("positions").alias("positions_total"),
            *[
                F.sum(
                    F.when(
                        F.col("df") > cap * n_docs_tri, F.col("positions")
                    ).otherwise(F.lit(0))
                ).alias(f"positions_above_df{cap}")
                for cap in (0.9, 0.75, 0.5)
            ],
        ).first()
    )
    setup["trigram_gram_df_dist"] = {
        k: int(dist[k] or 0) for k in dist.asDict()
    }
    tri_pruned_idx = tempfile.mkdtemp(prefix="ext_bench_tri_pruned_")
    timed_setup(
        "trigram_pruned_postings_build",
        lambda: S_search.write_postings(
            S_search.build_postings(
                sdocs, positions=True, stop_df_ratio=0.75,
                tokenizer=TOKENIZER_TRIGRAM,
            ),
            tri_pruned_idx,
        ),
    )
    setup["trigram_pruned_postings_bytes"] = _dir_bytes(tri_pruned_idx)
    release_all()
    # "ustome" = the in-word interior of "customer" (~77% of docs — the
    # synthetic vocab is ~30 words, so in-word substrings are either
    # rare-token-bound or common; the HIGH-selectivity case is the
    # honest worst case for the index: candidate lists are
    # corpus-sized, yet the postings path still avoids re-expanding
    # every document's text per query)
    _TRI_Q = parse_query("ustome", tokenizer=TOKENIZER_TRIGRAM)

    def _trigram_substr_postings():
        return S_search.search_postings(
            spark.read.parquet(tri_idx), _TRI_Q
        ).drop("_pending")

    def _trigram_substr_scan():
        return S_search.match_filter(
            sdocs, _TRI_Q, "content", tokenizer=TOKENIZER_TRIGRAM
        ).select("id")

    def _trigram_substr_postings_pruned():
        # the stop-gram-pruned index: "ustome" is all stop grams under
        # the 0.75 cap on this vocab, so every candidate goes _pending
        # and pays the content verify — the honest worst case of the
        # bytes/verify trade (a Zipfian corpus only degrades its
        # stop-gram-crossing queries)
        cand = S_search.search_postings(
            spark.read.parquet(tri_pruned_idx), _TRI_Q
        )
        verify = _TRI_Q.to_column(
            _tokenize(F.col("content"), TOKENIZER_TRIGRAM)
        )
        return (
            cand.join(sdocs, "id")
            .filter(
                F.when(F.col("_pending"), verify).otherwise(F.lit(True))
            )
            .select("id", "rank")
        )

    QUERIES["trigram_substr_postings"] = _trigram_substr_postings
    QUERIES["trigram_substr_scan"] = _trigram_substr_scan
    QUERIES["trigram_substr_postings_pruned"] = _trigram_substr_postings_pruned

    # ---- stop-gram pruning on a ZIPF-df corpus (r17, VERDICT item 3).
    # The ~30-word synthetic vocab above is DEGENERATE for df pruning
    # (75/76 grams above the 0.75 cap — the rows above are the
    # documented worst case, where every query crosses stop grams and
    # pays the verify). This corpus has a realistic Zipf(s≈1)
    # vocabulary instead: 20k words drawn log-uniformly (inverse-CDF
    # over a deterministic hash — density ∝ 1/rank), words are
    # zero-padded base-26 encodings of the rank so grams share across
    # words the way real morphology shares them. Measured at 5k docs:
    # 9 of ~16.8k grams exceed the 0.75 df cap yet carry ~39% of ALL
    # position payload — the head-concentration regime the knob is
    # for. The ratios are N-invariant (per-doc token count fixed), so
    # the two-scale rows compare cleanly. Rows: bytes + build for both
    # layouts, then the same gram-chain query served on both indexes
    # in both regimes — a mid-rank word (every gram under the cap:
    # positions KEPT, index-side adjacency on the pruned index too)
    # and the rank-1 stop word (all grams pruned: the degraded leg,
    # now bounded to stop-word asks instead of the whole surface).
    import math as _math

    _ZR = 20000.0

    def _zword(rank):
        return F.translate(
            F.lpad(F.conv(rank.cast("string"), 10, 26), 4, "0"),
            "0123456789ABCDEFGHIJKLMNOP",
            "abcdefghijklmnopqrstuvwxyz",
        )

    def _zrank(doc_id, i):
        u = (
            F.pmod(F.hash(doc_id, i, F.lit(42)), F.lit(1000003))
            + F.lit(0.5)
        ) / F.lit(1000003.0)
        return F.floor(F.exp(u * F.lit(_math.log(_ZR)))).cast("int")

    _ztoks = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda i: _zword(_zrank(F.col("doc_id"), i)),
    )
    zdocs = docs.select(
        F.col("doc_id").cast("string").alias("id"),
        F.concat_ws(" ", _ztoks).alias("content"),
    )
    zipf_idx = tempfile.mkdtemp(prefix="ext_bench_zipf_postings_")
    zipf_pruned_idx = tempfile.mkdtemp(prefix="ext_bench_zipf_pruned_")
    timed_setup(
        "zipf_postings_build",
        lambda: S_search.write_postings(
            S_search.build_postings(
                zdocs, positions=True, tokenizer=TOKENIZER_TRIGRAM
            ),
            zipf_idx,
        ),
    )
    timed_setup(
        "zipf_pruned_postings_build",
        lambda: S_search.write_postings(
            S_search.build_postings(
                zdocs,
                positions=True,
                stop_df_ratio=0.75,
                tokenizer=TOKENIZER_TRIGRAM,
            ),
            zipf_pruned_idx,
        ),
    )
    setup["zipf_postings_bytes"] = _dir_bytes(zipf_idx)
    setup["zipf_pruned_postings_bytes"] = _dir_bytes(zipf_pruned_idx)
    release_all()
    zn = docs.count()
    zdist = (
        spark.read.parquet(zipf_idx)
        .groupBy("term")
        .agg(
            F.countDistinct("id").alias("df"),
            F.sum(F.size("pos")).alias("positions"),
        )
        .select(
            F.count(F.lit(1)).alias("grams"),
            F.sum("positions").alias("positions_total"),
            F.sum(
                F.when(F.col("df") > 0.75 * zn, 1).otherwise(F.lit(0))
            ).alias("grams_above_df0.75"),
            F.sum(
                F.when(
                    F.col("df") > 0.75 * zn, F.col("positions")
                ).otherwise(F.lit(0))
            ).alias("positions_above_df0.75"),
        )
        .first()
    )
    setup["zipf_gram_df_dist"] = {
        k: int(zdist[k] or 0) for k in zdist.asDict()
    }
    # rank-500 word "aatg": grams aat (df≈0.48N) / atg (df≈0.03N) —
    # both KEPT at the 0.75 cap; rank-1 word "aaab": grams aaa/aab at
    # df≈N — both pruned (words are rank encodings, so the choices are
    # deterministic; dfs re-measurable from zipf_gram_df_dist's frame)
    _ZMID_Q = parse_query("aatg", tokenizer=TOKENIZER_TRIGRAM)
    _ZSTOP_Q = parse_query("aaab", tokenizer=TOKENIZER_TRIGRAM)

    def _zipf_serve(idx, q):
        cand = S_search.search_postings(spark.read.parquet(idx), q)
        verify = q.to_column(_tokenize(F.col("content"), TOKENIZER_TRIGRAM))
        return (
            cand.join(zdocs, "id")
            .filter(
                F.when(F.col("_pending"), verify).otherwise(F.lit(True))
            )
            .select("id", "rank")
        )

    QUERIES["zipf_substr_postings"] = lambda: _zipf_serve(zipf_idx, _ZMID_Q)
    QUERIES["zipf_substr_postings_pruned"] = lambda: _zipf_serve(
        zipf_pruned_idx, _ZMID_Q
    )
    QUERIES["zipf_stopword_postings"] = lambda: _zipf_serve(
        zipf_idx, _ZSTOP_Q
    )
    QUERIES["zipf_stopword_postings_pruned"] = lambda: _zipf_serve(
        zipf_pruned_idx, _ZSTOP_Q
    )
    # one Arrow pass marking matched terms over the whole corpus (the
    # bulk highlight path, query_df(highlight=True))
    QUERIES["snippet_bulk"] = lambda: sdocs.select(
        "id", snippet_column(_PHRASE, F.col("content")).alias("snippet")
    )

    def _mmr_rerank():
        # pool production IS the distributed cost (TakeOrdered to 200);
        # the greedy rerank is driver-side over the fetch_k pool by
        # design (mmr_select docstring). Returns the picks as a frame
        # so the harness's noop sink times the whole path.
        q = emb.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qe")
        )
        pool = (
            emb.crossJoin(F.broadcast(q))
            .select(
                "vec_id",
                cosine_similarity(F.col("embedding"), F.col("qe")).alias(
                    "rel"
                ),
                "embedding",
            )
            .orderBy(F.col("rel").desc(), F.col("vec_id"))
            .limit(200)
            .collect()
        )
        picks = mmr_select(
            [r["rel"] for r in pool],
            [r["embedding"] for r in pool],
            k=20,
        )
        return spark.createDataFrame(
            [(int(pool[i]["vec_id"]), j) for j, i in enumerate(picks)],
            "vec_id long, pick_order int",
        )

    QUERIES["mmr_rerank_pool200"] = _mmr_rerank

    # r18: the Collection.query(vector_search=True) serving shape —
    # filter-notNull → UNROUNDED rank vs a constant query → order desc
    # → page — under the interpreted HOF fold vs the bit-exact
    # sequential-fold Arrow kernel that replaced it on the serving path
    # (functions/vector.cosine_vs_const_seqfold_arrow; values pinned
    # bit-identical by test_seqfold_kernel_bitexact_vs_hof). Both rows
    # stay in the artifact so the within-artifact contrast survives
    # epoch drift.
    from sifts_spark.functions.vector import cosine_vs_const_seqfold_arrow

    _qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 3).collect()[0]["embedding"]
    ]
    _qlit = F.array(*[F.lit(x) for x in _qv]).cast("array<double>")

    QUERIES["vector_rank_hof"] = lambda: (
        emb.filter(F.col("embedding").isNotNull())
        .withColumn(
            "rank", cosine_similarity(F.col("embedding"), _qlit)
        )
        .orderBy(F.col("rank").desc(), "vec_id")
        .limit(50)
    )
    QUERIES["vector_rank_seqfold"] = lambda: (
        emb.filter(F.col("embedding").isNotNull())
        .withColumn(
            "rank", cosine_vs_const_seqfold_arrow(F.col("embedding"), _qv)
        )
        .orderBy(F.col("rank").desc(), "vec_id")
        .limit(50)
    )

    # r12: trainable language ID (fastText-grade) — trained once on the
    # corpus's labels (setup), scored in one Arrow matmul scan
    from sifts_spark.operators.textanalysis import langid_score, train_langid

    lid_model = timed_setup(
        "langid_train",
        lambda: train_langid(docs, lang_col="lang", sample_per_lang=1000),
    )
    QUERIES["langid_model_score"] = lambda: langid_score(docs, lid_model)

    # r13: the same one-broadcast one-matmul-scan shape at REAL L —
    # 53 languages / 13 scripts (tools/langid50.py). The model trains
    # on the synthetic multiscript corpus (setup; label count is what
    # matters, not the corpus), then scores THIS sf's documents: the
    # per-row cost scales with L only through the (L, dim) matmul
    # width, and the broadcast stays megabyte-sized.
    from tools.langid50 import corpus_rows

    def _train_lid50():
        rows50 = corpus_rows()
        df50 = spark.createDataFrame(
            rows50, "doc_id long, text string, lang string"
        )
        return train_langid(df50, sample_per_lang=200, dim=2**13)

    lid50 = timed_setup("langid50_train", _train_lid50)
    setup["langid50_labels"] = len(lid50["langs"])
    setup["langid50_broadcast_bytes"] = (
        len(lid50["langs"]) * int(lid50["dim"]) * 4
    )
    QUERIES["langid50_model_score"] = lambda: langid_score(docs, lid50)

    # r12: deep-pagination contrast — OFFSET N (every partition holds
    # an N+page TakeOrdered heap) vs the keyset seek filter (page-sized
    # heaps at any depth). Same on-disk table, same total order, same
    # page; N = 80% of the corpus so the gap scales with sf.
    from sifts_spark.functions.metadata import (
        compile_keyset_after,
        compile_order_by,
    )

    page_dir = tempfile.mkdtemp(prefix="ext_bench_page_")
    timed_setup(
        "page_table_build",
        lambda: sdocs.withColumn(
            "metadata", F.to_json(F.struct(F.length("content").alias("len")))
        ).write.mode("overwrite").parquet(page_dir),
    )
    pframe = spark.read.parquet(page_dir)
    _deep = int(pframe.count() * 0.8)
    _page_sort = compile_order_by(F.col("metadata"), "len", numeric="auto")
    _cursor = (
        pframe.orderBy(*_page_sort, F.col("id"))
        .offset(_deep - 1).limit(1).select("metadata", "id").collect()[0]
    )

    QUERIES["page_offset_deep"] = lambda: (
        pframe.orderBy(*_page_sort, F.col("id")).offset(_deep).limit(100)
    )

    def _page_keyset_deep():
        pred = compile_keyset_after(
            F.col("metadata"), "len", _cursor["metadata"], _cursor["id"],
            F.col("id"), numeric="auto",
        )
        return pframe.filter(pred).orderBy(*_page_sort, F.col("id")).limit(100)

    QUERIES["page_keyset_deep"] = _page_keyset_deep

    # r13: promoted-metadata contrast — the same selective `where` over
    # (a) schemaless JSON (get_json_object is opaque to the source:
    # every row group read AND parsed) vs (b) promoted typed sidecar
    # columns (predicate in PushedFilters; row groups/files skipped on
    # min/max stats). Both tables hold identical rows, both written
    # clustered by the key (the realistic layout promotion exploits);
    # predicate selects ~1% of rows.
    from sifts_spark.functions.metadata import compile_where
    from sifts_spark.sources.store import DocumentStore

    wdir_json = tempfile.mkdtemp(prefix="ext_bench_wjson_")
    wdir_prom = tempfile.mkdtemp(prefix="ext_bench_wprom_")
    _wbase = sdocs.withColumn(
        "metadata", F.to_json(F.struct(F.length("content").alias("len")))
    ).sort(F.length("content"))

    def _build_where_tables():
        _wbase.write.mode("overwrite").parquet(wdir_json)
        DocumentStore.promote_columns(_wbase, ["len"]).write.mode(
            "overwrite"
        ).parquet(wdir_prom)

    timed_setup("where_tables_build", _build_where_tables)
    _thr = float(
        pframe.selectExpr(
            "percentile_approx(length(content), 0.99) AS p"
        ).collect()[0]["p"]
    )
    _WHERE = {"len": {"$gt": _thr}}

    QUERIES["meta_where_json_scan"] = lambda: (
        spark.read.parquet(wdir_json)
        .filter(compile_where(F.col("metadata"), _WHERE))
        .select("id")
    )
    QUERIES["meta_where_promoted_scan"] = lambda: (
        spark.read.parquet(wdir_prom)
        .filter(
            compile_where(
                F.col("metadata"),
                _WHERE,
                {"len": (F.col("_m_len"), F.col("_mn_len"))},
            )
        )
        .select("id")
    )

    def steal_jiffies() -> int:
        # /proc/stat cpu line, field 8 = steal — every (sec, steal)
        # sample makes host-contention poisoning auditable (SURVEY §6.1,
        # same instrumentation as bench.py)
        try:
            with open("/proc/stat") as f:
                return int(f.readline().split()[8])
        except Exception:
            return -1

    times: dict[str, float] = {}
    runs: dict[str, list] = {}
    for name, fn in QUERIES.items():
        best, samples = float("inf"), []
        for _ in range(3):
            s0 = steal_jiffies()
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            samples.append([round(dt, 3), steal_jiffies() - s0])
            best = min(best, dt)
            release_all()
        times[name] = round(best, 3)
        runs[name] = samples

    # Streaming sketch-index compaction steady state: 24 corpus-sized
    # batches (doc_id % 24) appended to an index dir, compaction after
    # each append with max_batch_dirs=8 — the per-batch compaction cost
    # a long-running stream pays, separated from the sketch+write cost.
    from sifts_spark.operators.dedup import minhash_banded_sketches
    from sifts_spark.streaming.dedup import compact_sketch_index

    idx_dir = tempfile.mkdtemp(prefix="ext_bench_sketchidx_")
    _NB = 24
    compact_times = []
    for b in range(_NB):
        minhash_banded_sketches(
            docs.filter(F.col("doc_id") % _NB == b).withColumn(
                "doc_id", F.col("doc_id").cast("string")
            )  # string ids: the streaming sink's index schema
        ).write.mode("overwrite").parquet(f"{idx_dir}/batch={b}")
        release_all()
        t0 = time.perf_counter()
        compact_sketch_index(spark, idx_dir, max_batch_dirs=8)
        compact_times.append(time.perf_counter() - t0)
    setup["sketch_compact_per_batch_avg"] = round(
        sum(compact_times) / _NB, 3
    )
    setup["sketch_compact_per_batch_max"] = round(max(compact_times), 3)

    # Exchange-bytes audit (r14, r13 verdict "what's wrong" #2): total
    # shuffle-WRITE bytes of one full minhash_lsh_pairs run — the
    # deterministic, epoch-independent witness that the band self-join
    # no longer carries shingle payloads (each doc's shingle set used
    # to cross the banded exchange `bands`× per side). Read from the
    # Spark UI REST API, summed over exactly the stages of the jobs
    # this action schedules.
    from sifts_spark.operators.dedup import minhash_lsh_pairs

    def shuffle_write_bytes(fn) -> int:
        import urllib.request

        sc = spark.sparkContext
        group = f"xbytes-{time.time_ns()}"
        sc.setJobGroup(group, "exchange-bytes audit")
        try:
            fn()
        finally:
            sc.setJobGroup("", "")
        base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
        with urllib.request.urlopen(f"{base}/jobs") as r:
            jobs = json.load(r)
        stage_ids = set()
        for j in jobs:
            if j.get("jobGroup") == group:
                stage_ids.update(j["stageIds"])
        with urllib.request.urlopen(f"{base}/stages") as r:
            stages = json.load(r)
        return sum(
            s.get("shuffleWriteBytes", 0)
            for s in stages
            if s["stageId"] in stage_ids
        )

    try:
        setup["minhash_pairs_shuffle_write_bytes"] = shuffle_write_bytes(
            lambda: minhash_lsh_pairs(docs)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
    except Exception as e:  # REST surface off (spark.ui.enabled=false)
        setup["minhash_pairs_shuffle_write_bytes"] = f"unavailable: {e}"
    release_all()

    # WET → curation → export in ONE composition (r8 item 8): every
    # stage above is measured in isolation; this row measures what a
    # real crawl-to-training-shards job pays end to end, including the
    # recipe's per-stage counts and the export writes. Timed once (the
    # pipeline is a multi-job composite with internal materialization
    # barriers — best-of-3 would triple a minutes-scale row for noise
    # reduction the per-stage rows already provide).
    from sifts_spark.pipelines.curation import prepare_training_data
    from sifts_spark.sources.warc import read_wet

    e2e_out = tempfile.mkdtemp(prefix="ext_bench_e2e_")
    blocked_e2e = [f"src{i}.co.uk" for i in range(100)]
    t0 = time.perf_counter()
    good, _quar = read_wet(spark, wet_dir)
    manifest = prepare_training_data(
        good.withColumn(
            "url", F.get_json_object(F.col("metadata"), "$.uri")
        ),
        e2e_out,
        id_col="id",
        text_col="content",
        min_quality=0.0,
        ppl_band=None,
        url_col="url",
        blocked_domains=blocked_e2e,
    )
    e2e = {
        "wet_to_export_sec": round(time.perf_counter() - t0, 3),
        "stages": manifest["stages"],
    }

    # end-of-run bracket stamp (r17, the bench.py protocol): the host's
    # multi-thread mode flips faster than a spot probe can gate a long
    # run — only agreeing START and END stamps certify the epoch the
    # timed rows actually ran on
    calib_par_end = _bench.calibration_parallel_sec()

    print(
        json.dumps(
            {
                "metric": "extension_family_wall",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "runs": runs,
                "setup": setup,
                "e2e": e2e,
                "calibration_sec": calib,
                "calibration_parallel_sec": calib_par,
                "calibration_parallel_sec_end": calib_par_end,
                "calibration_workers": os.cpu_count() or 1,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
