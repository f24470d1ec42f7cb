"""Dedup operator behavior: blocking shapes, skew guards, clustering.

The value-level semantics of these operators are pinned by the DuckDB
oracle (plans/catalog.py entries); these tests pin the *plan shapes*
that matter at 100 TB — no cartesian joins, cell blocking by default,
skew caps actually dropping hot buckets — which the oracle cannot see.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sifts_spark.caching import release_all
from sifts_spark.operators import dedup as D
from sifts_spark.operators.vector_search import deterministic_centroids


@pytest.fixture(autouse=True)
def _release_caches():
    yield
    release_all()


def _vectors(spark):
    # Two tight clusters around orthogonal axes + one outlier.
    rows = [
        (0, [1.0, 0.0, 0.0], "a"),
        (1, [0.99, 0.01, 0.0], "a"),
        (2, [0.98, -0.01, 0.0], "b"),
        (3, [0.0, 1.0, 0.0], "b"),
        (4, [0.01, 0.99, 0.0], "a"),
        (5, [0.0, 0.0, 1.0], "c"),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )


def test_embedding_dedup_default_cell_blocking_finds_cluster_pairs(spark):
    vecs = _vectors(spark)
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]), (2, [0.0, 0.0, 1.0])],
        "cell_id long, centroid array<double>",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in D.embedding_dup_pairs(
            vecs, centroids=cents, threshold=0.99
        ).collect()
    }
    # within-cell near-identical pairs found; cross-cell pairs never compared
    assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs
    assert (3, 4) in pairs
    assert all(a != 5 and b != 5 for a, b in pairs)


def test_embedding_dedup_default_plan_is_equi_join_not_cartesian(spark):
    vecs = _vectors(spark)
    df = D.embedding_dup_pairs(vecs, threshold=0.5)  # default: IVF cells
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the join must be keyed on the cell id (blk), i.e. candidate-
    # proportional, not corpus²
    assert "blk" in plan


def test_deterministic_centroids_lowest_ids(spark):
    vecs = _vectors(spark)
    cents = deterministic_centroids(vecs, n_cells=3).collect()
    assert [r["cell_id"] for r in cents] == [0, 1, 2]


def test_block_col_override_still_works(spark):
    vecs = _vectors(spark)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in D.embedding_dup_pairs(
            vecs, block_col="label", threshold=0.99
        ).collect()
    }
    # 0/1 share label 'a'; 0/2 near-identical but different labels → missed
    assert (0, 1) in pairs
    assert (0, 2) not in pairs


def test_lsh_skew_guard_drops_degenerate_bucket(spark, caplog):
    # A corpus of identical docs: every band bucket holds every doc —
    # quadratic without the cap. With the cap the job completes and
    # emits zero candidates from the dropped buckets, loudly.
    docs = spark.createDataFrame(
        [(i, "the same tiny document text repeated") for i in range(30)],
        "doc_id long, text string",
    )
    import logging

    with caplog.at_level(logging.WARNING, logger="sifts_spark.operators.dedup"):
        out = D.minhash_lsh_pairs(docs, jaccard_threshold=0.5, max_bucket_size=10)
        assert out.count() == 0
        reports = D.report_dropped_buckets()  # post-action inspection
    assert any("dropped" in r.message for r in caplog.records)
    assert any(r["dropped_rows"] > 0 for r in reports)
    # without the cap the same corpus yields all 30*29/2 pairs
    out2 = D.minhash_lsh_pairs(docs, jaccard_threshold=0.5, max_bucket_size=None)
    assert out2.count() == 30 * 29 // 2


def test_skew_guard_on_simhash_and_ngram_degenerate_corpus(spark, caplog):
    """The shared cap (cap_buckets) must bound candidate generation on
    ALL bucketed self-joins, not just MinHash: hundreds of identical docs
    (every chunk value / rarest shingle identical) plus empty docs, the
    two degenerate shapes that collapse a corpus onto one bucket."""
    import logging

    rows = [(i, "the exact same templated document body") for i in range(300)]
    rows += [(1000 + i, "") for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    with caplog.at_level(logging.WARNING, logger="sifts_spark.operators.dedup"):
        assert D.simhash_pairs(docs, max_bucket_size=50).count() == 0
        D.report_dropped_buckets()
        assert any(
            "simhash_pairs: dropped" in r.message for r in caplog.records
        )
        caplog.clear()
        assert D.ngram_jaccard_pairs(docs, max_bucket_size=50).count() == 0
        D.report_dropped_buckets()
        assert any(
            "ngram_jaccard_pairs: dropped" in r.message for r in caplog.records
        )
    release_all()

    # Uncapped, the identical docs DO pair (recall intact when buckets
    # are sane-sized ... here we keep it small enough to be cheap):
    small = spark.createDataFrame(rows[:20], "doc_id long, text string")
    assert D.simhash_pairs(small, max_bucket_size=None).count() == 20 * 19 // 2
    assert (
        D.ngram_jaccard_pairs(small, max_bucket_size=None).count()
        == 20 * 19 // 2
    )
    release_all()


def test_minhash_incremental_equals_full_corpus_run(spark, tmp_path):
    """The incremental path's contract: pairs(base ∪ new) ==
    pairs(base) ∪ incremental(new, index(base)) under the same params,
    with the persisted sketch index surviving a parquet round-trip —
    so a daily increment never re-sketches the corpus."""
    import os

    from sifts_spark.sources.tables import load_table

    sf = os.environ.get("SPARK_GRAFT_SF_TEST_DIR", "/root/testdata/sf0.001")
    docs = load_table(spark, sf, "documents")
    base = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)

    # the index persists (the real deployment shape) and reads back
    idx_dir = str(tmp_path / "mh_index")
    D.minhash_banded_sketches(base).write.parquet(idx_dir)
    index = spark.read.parquet(idx_dir)

    def pairset(df):
        return {(r["id_a"], r["id_b"], r["jaccard"]) for r in df.collect()}

    full = pairset(D.minhash_lsh_pairs(docs))
    base_pairs = pairset(D.minhash_lsh_pairs(base))
    inc = pairset(D.minhash_lsh_pairs_incremental(new, index))

    assert inc, "increment produced no pairs — test data too clean?"
    assert base_pairs.isdisjoint(inc)     # every inc pair involves a new doc
    assert base_pairs | inc == full       # exact reconstruction

    # cross-only: subset of inc with exactly one side in the new batch
    cross = pairset(
        D.minhash_lsh_pairs_incremental(new, index, include_new_new=False)
    )
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    assert cross <= inc
    assert all((a in new_ids) != (b in new_ids) for a, b, _ in cross)
    assert all((a in new_ids) or (b in new_ids) for a, b, _ in inc)


def test_minhash_incremental_prunes_index_to_touched_buckets(spark):
    """Scale shape: the candidate join's index side must be semi-join
    pruned to the buckets the new batch touches BEFORE the shuffle —
    the plan reads the index but joins only touched (band, key)s."""
    import os

    from sifts_spark.sources.tables import load_table

    sf = os.environ.get("SPARK_GRAFT_SF_TEST_DIR", "/root/testdata/sf0.001")
    docs = load_table(spark, sf, "documents")
    base = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0).limit(3)
    index = D.minhash_banded_sketches(base)
    plan = (
        D.minhash_lsh_pairs_incremental(new, index)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftSemi" in plan, "index pruning semi-join missing from the plan"
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_cap_buckets_schedules_no_job_at_plan_time(spark):
    """The skew guard is fully lazy: building a capped candidate plan
    schedules ZERO Spark jobs (the hot-bucket aggregation runs inside
    the caller's action), and a cap that nothing exceeds yields pairs
    identical to the uncapped plan."""
    rows = [(i, f"document number {i} about topic {i % 3} with words") for i in range(24)]
    rows += [(100 + i, "the same tiny document text repeated") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    docs.count()  # materialize input first so later job counts are pure

    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None))
    capped = D.minhash_lsh_pairs(docs, jaccard_threshold=0.5,
                                 max_bucket_size=10_000)
    sim = D.simhash_pairs(docs, max_bucket_size=10_000)
    after = set(tracker.getJobIdsForGroup(None))
    assert after == before, "candidate-plan construction ran Spark jobs"

    uncapped = D.minhash_lsh_pairs(docs, jaccard_threshold=0.5,
                                   max_bucket_size=None)
    key = lambda r: (r["id_a"], r["id_b"])
    assert sorted(map(key, capped.collect())) == sorted(
        map(key, uncapped.collect())
    )
    sim.count()  # the lazy guard executes fine on the simhash path too
    release_all()
