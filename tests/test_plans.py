"""Plan-shape guards over the WHOLE catalog.

Correctness is pinned by the DuckDB oracle; these tests pin the
physical-plan properties that matter at 100 TB and that a refactor
could silently regress:

* no CartesianProduct / BroadcastNestedLoopJoin anywhere — every join
  in every entry must be key-based (equi/semi/anti); a blocked pairwise
  operator that degrades to all-pairs would show up here first;
* parquet scans of the wide ``documents`` table prune columns — an
  entry that drags ``text`` through a plan that only needs counts
  reads ~100× more bytes than it should at scale.
"""

from __future__ import annotations

import pytest

from sifts_spark.plans.catalog import QUERIES

SF_DIR = "/root/testdata/sf0.001"

_FORBIDDEN = ("CartesianProduct", "BroadcastNestedLoopJoin")

# BroadcastNestedLoopJoin is acceptable ONLY when the broadcast side is
# provably tiny and bounded by construction — never corpus-sized:
#   fts_bm25          — 1-row corpus-stats frame attached to candidates
#   vector_knn        — 1-row literal query vector
#   vector_knn_batch  — the bounded query BATCH (exact-kNN baseline is
#                       corpus x queries BY DEFINITION; the scale paths
#                       are ivf_knn / srp_knn, which stay key-joined)
#   hybrid_rrf        — both of the above: 1-row corpus-stats frame on
#                       the BM25 leg + 1-row query vector on the cosine
#                       leg (the fuse itself is a key-equi full outer)
#   keywords_tfidf    — 1-row broadcast N (doc count) attached to the
#                       scored (id, term) frame, fts_bm25's posture
#   fts_phrase        — routed through search_postings since r12
#                       (positional index path): the same 1-row
#                       corpus-stats frame as fts_bm25
#   fts_fuzzy         — search_postings without precomputed stats
#                       (r17 gate row): the same 1-row corpus-stats
#                       frame as fts_phrase/fts_bm25
_BNLJ_ALLOWED = {
    "fts_bm25", "vector_knn", "vector_knn_batch", "hybrid_rrf",
    "keywords_tfidf", "fts_phrase", "fts_fuzzy",
}


def _explain(spark, name) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("extended")
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_allpairs_join_shapes(spark, name):
    plan = _explain(spark, name)
    for bad in _FORBIDDEN:
        if bad == "BroadcastNestedLoopJoin" and name in _BNLJ_ALLOWED:
            continue
        assert bad not in plan, f"{name}: {bad} in physical plan"


def test_new_extension_ops_no_allpairs_shapes(spark):
    """Same guard for the round-6 extension family (not in the
    catalog): substring dedup, SemDeDup, BPE — none may plan a
    cartesian or nested-loop join."""
    from pyspark.sql import functions as F

    from sifts_spark.operators.bpe import bpe_segment, train_bpe
    from sifts_spark.operators.dedup import semdedup
    from sifts_spark.operators.substring import remove_duplicate_spans
    from sifts_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(50)
    emb = load_table(spark, SF_DIR, "embeddings").limit(50)
    bpe = train_bpe(docs, num_merges=20, sample_docs=50)
    frames = {
        "remove_duplicate_spans": remove_duplicate_spans(docs, k=10),
        "semdedup": semdedup(emb, n_cells=4),
        "bpe_segment": bpe_segment(docs, bpe),
    }
    for name, df in frames.items():
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "extended"
            )
        )
        for bad in _FORBIDDEN:
            assert bad not in plan, f"{name}: {bad} in physical plan"


def test_phash_and_hashed_lm_no_allpairs_shapes(spark):
    from pyspark.sql import functions as F

    from sifts_spark.operators.classifier import importance_weights
    from sifts_spark.operators.multimodal import image_phash_pairs
    from sifts_spark.operators.textanalysis import train_hashed_ngram_lm
    from sifts_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(50)
    media = docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    t = train_hashed_ngram_lm(docs, n=2, num_buckets=4096)
    s = train_hashed_ngram_lm(docs.limit(25), n=2, num_buckets=4096)
    frames = {
        "image_phash_pairs": image_phash_pairs(media, max_hamming=0),
        "dsir_weights_bigram": importance_weights(docs, t, s),
    }
    for name, df in frames.items():
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "extended"
            )
        )
        for bad in _FORBIDDEN:
            assert bad not in plan, f"{name}: {bad} in physical plan"


# Entries whose SEMANTICS never touch document text: their parquet
# scan of the wide `documents` table must prune the text column
# (ReadSchema), or the plan reads ~100x the bytes it needs at scale.
_NO_TEXT_ENTRIES = (
    "order_paginate",       # projects (doc_id, lang, source)
    "total_count",          # count over a lang filter
    "meta_where_numeric",   # metadata from (lang, source, n_chars)
    "meta_where_nin",       # same synthesized metadata
)


def _formatted(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.mark.parametrize("name", _NO_TEXT_ENTRIES)
def test_documents_scan_prunes_text(spark, name):
    plan = _formatted(spark, QUERIES[name](spark, SF_DIR))
    doc_scans = [
        blk for blk in plan.split("Scan parquet")
        if "documents.parquet" in blk and "ReadSchema" in blk
    ]
    assert doc_scans, f"{name}: no documents scan found\n{plan}"
    for blk in doc_scans:
        schema = next(
            ln for ln in blk.splitlines() if "ReadSchema" in ln
        )
        assert "text" not in schema, f"{name}: text not pruned — {schema}"


def test_total_count_filter_pushed_to_scan(spark):
    """The lang predicate must reach the parquet reader (row-group
    stats skip whole chunks at scale), not evaluate post-scan only."""
    plan = _formatted(spark, QUERIES["total_count"](spark, SF_DIR))
    blk = next(
        b for b in plan.split("Scan parquet")
        if "documents.parquet" in b and "PushedFilters" in b
    )
    pushed = next(ln for ln in blk.splitlines() if "PushedFilters" in ln)
    assert "EqualTo(lang,en)" in pushed, pushed


def test_meta_where_string_matches_oracle(spark):
    # de-registered in r11 (row ceded to fts_phrase); original SQL twin
    # kept here
    import duckdb

    from sifts_spark.plans.catalog import (
        _META_WHERE_STRING_SQL,
        meta_where_string,
    )

    got = sorted(r["doc_id"] for r in meta_where_string(spark, SF_DIR).collect())
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = sorted(r[0] for r in con.sql(_META_WHERE_STRING_SQL).fetchall())
    assert got == want and len(got) > 0


def test_text_token_count_matches_oracle(spark):
    # de-registered in r11 (row ceded to fts_not); original SQL twin
    # kept here
    import duckdb

    from sifts_spark.plans.catalog import _TOKEN_COUNT_SQL, text_token_count

    got = {
        r["id"]: r["n_bpe_tokens"]
        for r in text_token_count(spark, SF_DIR).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = {r[0]: r[1] for r in con.sql(_TOKEN_COUNT_SQL).fetchall()}
    assert got == want and len(got) == 500


def test_top_orders_revenue_matches_oracle(spark):
    # de-registered in r13 (row ceded to page_keyset_deep); original
    # SQL twin kept here
    import duckdb

    from sifts_spark.plans.catalog import _TOP_ORDERS_SQL, top_orders_revenue

    got = [
        (r["orderkey"], round(r["revenue"], 4))
        for r in top_orders_revenue(spark, SF_DIR).collect()
    ]
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    want = [(r[0], round(r[1], 4)) for r in con.sql(_TOP_ORDERS_SQL).fetchall()]
    assert got == want and len(got) > 0


def test_page_keyset_deep_is_seek_not_offset(spark):
    """The new catalog row must plan filter + page-sized TakeOrdered —
    no global sort, no offset; and its cursor tie-arm must bite (rows
    AT the cursor bucket with id <= '450' excluded, > '450' included)."""
    from sifts_spark.plans.catalog import page_keyset_deep

    df = page_keyset_deep(spark, SF_DIR)
    plan = _formatted(spark, df)
    assert "TakeOrderedAndProject" in plan, plan
    rows = df.collect()
    assert rows and all(
        r["bucket"] > 3 or (r["bucket"] == 3 and r["id"] > "450")
        for r in rows
    )


def test_fts_term_matches_oracle(spark):
    # de-registered in r14 (row ceded to fts_multiscript); original
    # SQL twin kept here
    import duckdb

    from sifts_spark.plans.catalog import _FTS_TERM_SQL, fts_term

    got = sorted(r["doc_id"] for r in fts_term(spark, SF_DIR).collect())
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = sorted(r[0] for r in con.sql(_FTS_TERM_SQL).fetchall())
    assert got == want and len(got) > 0


def test_dedup_ngram_jaccard_matches_oracle(spark):
    # de-registered in r15 (row ceded to fts_trigram_substr); original
    # SQL twin kept here
    import duckdb

    from sifts_spark.plans.catalog import _NGRAM_SQL, dedup_ngram_jaccard

    got = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in dedup_ngram_jaccard(spark, SF_DIR).collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = sorted(
        (r[0], r[1], round(r[2], 6))
        for r in con.sql(_NGRAM_SQL).fetchall()
    )
    assert got == want and len(got) > 0


def test_dedup_simhash_pairs_matches_oracle(spark):
    # de-registered in r14 (row ceded to fts_cjk_substr); original
    # SQL twin kept here
    import duckdb

    from sifts_spark.plans.catalog import (
        _SIMHASH_PAIRS_SQL,
        dedup_simhash_pairs,
    )

    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup_simhash_pairs(spark, SF_DIR).collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = sorted(
        (r[0], r[1], r[2]) for r in con.sql(_SIMHASH_PAIRS_SQL).fetchall()
    )
    assert got == want and len(got) > 0


def test_dedup_embedding_matches_oracle(spark):
    # de-registered in r16 (row ceded to fts_cjk_exact); original
    # SQL twin kept here
    import duckdb

    from sifts_spark.plans.catalog import _EMB_DUP_SQL, dedup_embedding

    got = sorted(
        (r["id_a"], r["id_b"], round(r["cos_sim"], 6))
        for r in dedup_embedding(spark, SF_DIR).collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    want = sorted(
        (r[0], r[1], round(r[2], 6))
        for r in con.sql(_EMB_DUP_SQL).fetchall()
    )
    assert got == want and len(got) > 0


def test_dedup_paragraphs_matches_oracle(spark):
    # de-registered in r17 (row ceded to fts_fuzzy); original SQL twin
    # kept here
    import duckdb

    from sifts_spark.plans.catalog import _PARA_SQL, dedup_paragraphs

    got = sorted(
        (r["id"], r["text"], r["n_paras"], r["n_kept"], r["n_dropped"])
        for r in dedup_paragraphs(spark, SF_DIR).collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = sorted(tuple(r) for r in con.sql(_PARA_SQL).fetchall())
    assert got == want and len(got) > 0


def test_top_ngrams_matches_oracle(spark):
    # de-registered in r16 (row ceded to fts_substr_scan); original
    # SQL twin kept here
    import duckdb

    from sifts_spark.plans.catalog import _TOP_NGRAMS_SQL, top_ngrams_q

    got = [
        (r["gram"], r["n"]) for r in top_ngrams_q(spark, SF_DIR).collect()
    ]
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = [(r[0], r[1]) for r in con.sql(_TOP_NGRAMS_SQL).fetchall()]
    assert got == want and len(got) == 20
