"""Product quantization: encode shapes, ADC fidelity, refine recall,
IVFPQ composition, determinism.

Floors were measured on this exact corpus (see each test); the
synthetic embeddings are noise-like (same-label cosine ~ 1e-5), the
hardest case for ADC estimation — real clustered corpora do better.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sifts_spark.operators import quantization as Q
from sifts_spark.operators import vector_search as V
from sifts_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
DIM = 64


@pytest.fixture(scope="module")
def emb(spark):
    df = load_table(spark, SF_DIR, "embeddings").cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def books(emb):
    return Q.pq_train(emb, dim=DIM, m=8, nbits=8, iters=8)


def _recall(approx_df, exact_df) -> float:
    ex: dict = {}
    ap: dict = {}
    for r in exact_df.collect():
        ex.setdefault(r["query_id"], set()).add(r["id"])
    for r in approx_df.collect():
        ap.setdefault(r["query_id"], set()).add(r["id"])
    return sum(len(ap.get(q, set()) & i) / len(i) for q, i in ex.items()) / len(ex)


def test_pq_train_shapes_and_determinism(emb, books):
    assert len(books) == 8  # m subspaces
    assert all(len(b) == 256 for b in books)  # ksub = 2^8
    assert all(len(c) == DIM // 8 for b in books for c in b[:4])
    assert books == Q.pq_train(emb, dim=DIM, m=8, nbits=8, iters=8)


def test_pq_encode_codes_and_nulls(spark, emb, books):
    codes = Q.pq_encode(emb, books)
    rows = codes.orderBy("id").limit(50).collect()
    for r in rows:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 256 for c in r["codes"])
    # null embedding encodes to null codes (and is dropped from search)
    withnull = emb.withColumn(
        "embedding", F.when(F.col("vec_id") == 0, F.lit(None)).otherwise(F.col("embedding"))
    )
    nrow = Q.pq_encode(withnull, books).filter(F.col("id") == 0).collect()
    assert nrow[0]["codes"] is None


def test_pq_adc_recall_and_refine(spark, emb, books):
    """ADC full-scan top-10 vs exact: measured 0.685 ADC-only (the
    quantization-noise bound on this noise-like corpus) and 0.99 with
    the exact top-(k*4) re-rank — refine restores what coding lost."""
    codes = Q.pq_encode(emb, books).cache()
    queries = emb.orderBy("vec_id").limit(20)
    exact = V.knn_join(emb, queries, k=10)
    adc = Q.pq_knn_join(codes, queries, books, k=10)
    assert _recall(adc, exact) >= 0.5
    refined = Q.pq_knn_join(codes, queries, books, k=10, refine=4, vectors=emb)
    assert _recall(refined, exact) >= 0.9
    codes.unpersist()


def test_ivfpq_matches_plain_ivf(spark, emb, books):
    """Composing PQ under IVF must cost ~nothing vs float IVF at the
    same (centroids, nprobe): after refine the only recall loss allowed
    is ADC candidate-ordering noise (measured 0.46 == 0.46)."""
    km = V.kmeans_centroids(emb, n_cells=8)
    queries = emb.orderBy("vec_id").limit(20)
    exact = V.knn_join(emb, queries, k=10)
    ivf = V.ivf_knn_join(emb, queries, km, k=10, nprobe=2)
    ivfpq = Q.ivfpq_knn_join(emb, queries, km, books, k=10, nprobe=2, refine=4)
    r_ivf, r_ivfpq = _recall(ivf, exact), _recall(ivfpq, exact)
    assert r_ivfpq >= r_ivf - 0.05, f"PQ lost recall: {r_ivfpq} vs {r_ivf}"
    # refined scores are EXACT cosines: top-1 score matches the exact
    # engine's for every query that agrees on the top-1 id
    ex1 = {r["query_id"]: (r["id"], r["cos_sim"]) for r in exact.filter("rank=1").collect()}
    ap1 = {r["query_id"]: (r["id"], r["score"]) for r in ivfpq.filter("rank=1").collect()}
    agree = [q for q in ex1 if q in ap1 and ex1[q][0] == ap1[q][0]]
    assert agree, "no top-1 agreement at all"
    for q in agree:
        assert abs(ex1[q][1] - ap1[q][1]) < 1e-5


def test_pq_planted_duplicates_found(spark):
    """Planted near-duplicates (cosine ~0.9995 to their source) must be
    retrieved as the top-1 neighbor by the ADC scan WITHOUT refine —
    the coarse estimate only needs to separate sim~1 from sim~0.

    Codebooks are trained on the searched corpus itself (the only
    correct usage — out-of-distribution codebooks collapse distinct
    vectors onto the same codes; pinned by the first run of this test,
    which reused the sf corpus books and found 4/40). Base directions
    are seeded Gaussians — a sin(a*i + b*j) lattice is NOT separated
    (b*j wraps mod 2pi, making distant j near-identical; also measured
    the hard way)."""
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(40, DIM)
    rows = []
    for j, v in enumerate(base):
        rows.append((j, v.tolist()))
        dup = v + 0.02 * rng.randn(DIM)
        rows.append((1000 + j, dup.tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    local_books = Q.pq_train(df, dim=DIM, m=8, nbits=8, iters=8)
    codes = Q.pq_encode(df, local_books)
    queries = df.filter(F.col("vec_id") < 1000)
    top = Q.pq_knn_join(codes, queries, local_books, k=1)
    hits = {r["query_id"]: r["id"] for r in top.collect()}
    good = sum(1 for q, i in hits.items() if i == 1000 + q)
    assert good >= 36, f"only {good}/40 planted dups found top-1"


def test_pq_compression_ratio():
    assert Q.pq_compression_ratio(dim=64, m=8, nbits=8) == 32.0
    assert Q.pq_compression_ratio(dim=768, m=96, nbits=8) == 32.0
    assert Q.pq_compression_ratio(dim=768, m=48, nbits=8) == 64.0


def test_pq_train_rejects_indivisible_dim(emb):
    with pytest.raises(ValueError, match="not divisible"):
        Q.pq_train(emb, dim=DIM, m=7)


def test_pq_null_query_vector_excluded(spark, emb, books):
    """A null query embedding must not 'win' k arbitrary rows via
    NaN-sorts-first; it simply returns no rows."""
    codes = Q.pq_encode(emb, books)
    queries = spark.createDataFrame(
        [(9001, None), (9002, [0.5] * DIM)],
        "vec_id long, embedding array<double>",
    )
    out = Q.pq_knn_join(codes, queries, books, k=3, exclude_self=False)
    got = {r["query_id"] for r in out.collect()}
    assert got == {9002}
    km = V.kmeans_centroids(emb, n_cells=4)
    out2 = Q.ivfpq_knn_join(emb, queries, km, books, k=3, nprobe=2,
                            exclude_self=False)
    assert {r["query_id"] for r in out2.collect()} == {9002}
