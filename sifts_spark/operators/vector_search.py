"""Similarity search over embedding columns.

Extends the reference's exact-scan kNN (/root/reference/src/sifts/
core.py:319-321 pgvector ``<=>``, :527-542 client-side numpy) to
distributed shapes:

* :func:`knn`: exact brute-force top-k for ONE query vector —
  ``orderBy(desc(sim)).limit(k)`` compiles to TakeOrderedAndProject
  (per-partition heap + driver merge, no global sort, no full
  materialization — kills the reference's SQLite cliff).
* :func:`knn_join`: top-k neighbors for a WHOLE table of queries —
  broadcast the (small) query side, per-query window top-k.
* :func:`ivf_knn_join`: the scale path — IVF-style cell pruning: assign
  vectors to their nearest centroid (map-side), probe only the
  ``nprobe`` closest cells per query; the candidate join is
  cell-blocked, never corpus × queries.

All cosine math is the higher-order-function expression from
functions/vector.py — JVM-side, codegen, no UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sifts_spark.functions.vector import cosine_similarity


def knn(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "arrow",
) -> DataFrame:
    """Exact top-k for one literal query vector → (id, cos_sim).

    ``impl="arrow"`` (r17 default) scores with the numpy batch kernel —
    the interpreted HOF fold was ~30 µs/vector and dominated the scan
    (guide §4.2); ``impl="hof"`` keeps the pure-JVM expression. Same
    6-dp rounded values either way (pinned by the impl-equivalence
    test; sum-order differs only in the last ulp, 9 digits under the
    rounding guard). Crossover: the kernel pays one Python worker
    round-trip (~0.17s measured) — below a few thousand vectors the
    HOF path wins (the sf0.1-gated catalog row keeps it); past that
    the kernel wins linearly (1.4× at 20k vectors)."""
    if impl == "arrow":
        from sifts_spark.functions.hashing import ensure_min_parallelism
        from sifts_spark.functions.vector import (
            VEC_BYTES_PER_SPLIT,
            cosine_vs_const_arrow,
        )

        return (
            ensure_min_parallelism(vectors, VEC_BYTES_PER_SPLIT)
            .select(
                F.col(id_col).alias("id"),
                cosine_vs_const_arrow(F.col(vec_col), query_vec).alias(
                    "cos_sim"
                ),
            )
            .orderBy(F.col("cos_sim").desc(), F.col("id"))
            .limit(k)
        )
    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    return (
        vectors.select(
            F.col(id_col).alias("id"),
            F.round(cosine_similarity(F.col(vec_col), q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("id"))
        .limit(k)
    )


def knn_join(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    exclude_self: bool = True,
    impl: str = "arrow",
) -> DataFrame:
    """Exact top-k per query row → (query_id, id, cos_sim, rank).

    Query side is broadcast (queries ≪ corpus); ranking is a window
    per query id. Deterministic tiebreak on neighbor id.

    ``impl="arrow"`` (r17 default) scores the exploded (corpus ×
    queries) pairs with the numpy batch kernel — the interpreted HOF
    fold paid ~30 µs/pair and was 4× the whole query at sf1 (guide
    §4.2); ``impl="hof"`` keeps the pure-JVM expression. Same 6-dp
    rounded values (impl-equivalence test + the vector_knn_batch
    oracle row)."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")
    )
    if impl == "arrow":
        from sifts_spark.functions.hashing import ensure_min_parallelism
        from sifts_spark.functions.vector import (
            VEC_BYTES_PER_SPLIT,
            cosine_similarity_arrow,
        )

        vectors = ensure_min_parallelism(vectors, VEC_BYTES_PER_SPLIT)
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    joined = v.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col("id") != F.col("query_id"))
    if impl == "arrow":
        sim = cosine_similarity_arrow(F.col("v"), F.col("qv"))
    else:
        sim = F.round(cosine_similarity(F.col("v"), F.col("qv")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("id")
    )
    return (
        joined.select("query_id", "id", sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def assign_cells(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "cell_id",
    centroid_vec_col: str = "centroid",
    nprobe: int = 1,
) -> DataFrame:
    """IVF assignment: each vector → its ``nprobe`` nearest centroids
    → (id, v, cell_id, cell_rank). Centroids broadcast; map-side math;
    one narrow output row per probe.

    Similarity is rounded to 6 dp BEFORE ranking (ties broken by
    cell_id) so the assignment is reproducible across engines — raw
    double near-ties would make the oracle comparison flaky.
    """
    c = centroids.select(
        F.col(centroid_id_col).alias("cell_id"),
        F.col(centroid_vec_col).alias("cv"),
    )
    sim = F.round(cosine_similarity(F.col("v"), F.col("cv")), 6)
    w = Window.partitionBy("id").orderBy(F.col("_csim").desc(), F.col("cell_id"))
    return (
        vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .crossJoin(F.broadcast(c))
        .select("id", "v", "cell_id", sim.alias("_csim"))
        .withColumn("cell_rank", F.row_number().over(w))
        .filter(F.col("cell_rank") <= nprobe)
    )


def deterministic_centroids(
    vectors: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic centroid seed: the ``n_cells`` lowest-id vectors
    → (cell_id, centroid). A reproducible stand-in for k-means||
    (whose init is randomized): good enough to break a corpus into
    cells for blocking, and — crucially for the correctness gate —
    replayable by an ANSI-SQL oracle. cell_id is the source row's id.

    Scale: a TakeOrdered of ``n_cells`` rows — no full sort; the result
    is centroid-sized and always broadcast by callers."""
    return (
        vectors.select(F.col(id_col).alias("cell_id"), F.col(vec_col).alias("centroid"))
        .orderBy("cell_id")
        .limit(n_cells)
    )


def kmeans_centroids(
    vectors: DataFrame,
    n_cells: int | None = None,
    vec_col: str = "embedding",
    sample_size: int = 65536,
    iters: int = 10,
    seed: int = 1,
) -> list:
    """PRODUCTION centroid training: sampled spherical k-means →
    ``[(cell_id, [float, ...]), ...]`` ready for :func:`ivf_knn_join`.

    :func:`deterministic_centroids` is a correctness device (replayable
    by the SQL oracle), not a clustering-quality story; THIS is the path
    a deployment uses. Recipe (the standard IVF training shape — faiss
    trains its coarse quantizer on a sample too):

    * one distributed count (skipped if ``n_cells`` is given) sizes
      ``n_cells ~ sqrt(N)`` — per-query candidate work is
      ``nprobe * N / n_cells``, so sqrt keeps both the probe fan-out
      and the cell population sublinear as the corpus grows;
    * one seeded distributed ``sample`` pulls ≤ ``sample_size`` vectors
      to the driver (centroid-sized data, never the corpus);
    * k-means++ init + Lloyd iterations run driver-side in numpy on
      L2-normalized vectors with cosine assignment (spherical k-means)
      — consistent with the cosine cell assignment the join uses;
      empty cells reseed to the farthest vector.

    Deterministic for a fixed (corpus, seed, sample_size): the sample
    is seed-stable and numpy's RandomState replays. The returned list
    is inlined by the callers' map-side assignment, so the corpus is
    never shuffled to be assigned."""
    import math

    vec = vectors.select(F.col(vec_col).alias("v")).filter(
        F.col("v").isNotNull()
    )
    n = None
    if n_cells is None:
        n = vec.count()
        n_cells = max(2, int(round(math.sqrt(max(n, 4)))))
    if n is None:
        n = vec.count()
    frac = min(1.0, (sample_size * 1.2) / max(n, 1))
    rows = (
        vec.sample(withReplacement=False, fraction=frac, seed=seed)
        .limit(sample_size)
        .collect()
    )
    X = np.asarray([list(r["v"]) for r in rows], dtype=np.float64)
    norms = np.sqrt((X * X).sum(axis=1))
    X = X[norms > 0] / norms[norms > 0, None]
    if len(X) == 0:
        raise ValueError("no non-null, non-zero vectors to train on")
    k = min(n_cells, len(X))
    rng = np.random.RandomState(seed)

    # k-means++ seeding on the unit sphere: d² = 2 - 2·cos
    centers = np.empty((k, X.shape[1]))
    centers[0] = X[rng.randint(len(X))]
    min_d2 = np.maximum(2.0 - 2.0 * (X @ centers[0]), 0.0)
    for i in range(1, k):
        total = float(min_d2.sum())
        if total <= 0:
            centers[i] = X[rng.randint(len(X))]
        else:
            centers[i] = X[np.searchsorted(np.cumsum(min_d2), rng.rand() * total)]
        min_d2 = np.minimum(min_d2, np.maximum(2.0 - 2.0 * (X @ centers[i]), 0.0))

    for _ in range(iters):
        assign = np.argmax(X @ centers.T, axis=1)
        sims = (X @ centers.T)[np.arange(len(X)), assign]
        for c in range(k):
            members = X[assign == c]
            if len(members) == 0:
                centers[c] = X[np.argmin(sims)]  # reseed: farthest vector
                continue
            m = members.mean(axis=0)
            mn = np.sqrt((m * m).sum())
            centers[c] = m / mn if mn > 0 else centers[c]
    return [(i, centers[i].tolist()) for i in range(k)]


def ivf_cell_counts(
    vectors: DataFrame,
    centroids,
    vec_col: str = "embedding",
    impl: str = "arrow",
) -> dict:
    """Cell-population audit for an IVF index → ``{"counts": {cell_id:
    n}, "n_cells": k, "imbalance": max/mean}``. A healthy index keeps
    ``imbalance`` low single-digit; a degenerate centroid set (one cell
    swallowing the corpus) makes per-query candidate work linear again
    — assert on this at index-build time, when re-training is cheap."""
    from sifts_spark.functions.vector import cell_assign_arrow

    rows = centroid_rows(centroids)
    assign = (
        cell_assign_arrow(F.col(vec_col), rows)
        if impl == "arrow"
        else cell_assign_expr(F.col(vec_col), rows)
    )
    counts = {
        r["cell_id"]: r["n"]
        for r in (
            vectors.filter(F.col(vec_col).isNotNull())
            .select(assign.alias("cell_id"))
            .groupBy("cell_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    vals = list(counts.values()) or [0]
    mean = sum(vals) / len(rows)
    return {
        "counts": counts,
        "n_cells": len(rows),
        "imbalance": (max(vals) / mean) if mean else float("inf"),
    }


def centroid_rows(centroids) -> list:
    """Normalize a centroid table to driver rows [(cell_id, [floats])].

    Accepts either a (tiny, centroid-sized) DataFrame — collected HERE,
    once — or an already-collected list, which callers on a hot path
    (bench loops, repeated queries against one index) should prefer: a
    real deployment persists its centroid table and loads it once, not
    per query."""
    if isinstance(centroids, list):
        return centroids
    return [(r["cell_id"], list(r["centroid"])) for r in centroids.collect()]


def _cell_sims_expr(vec_col, centroid_rows):
    """ARRAY<STRUCT<s,nid,cid>> of rounded similarities to inlined
    centroid literals; natural struct ordering = (sim asc, cell_id
    desc), so max/sort-desc yields (sim desc, cell_id asc)."""
    cells = F.array(
        *[
            F.struct(
                F.lit(cid).cast("long").alias("cid"),
                F.array(*[F.lit(float(x)) for x in vec])
                .cast("array<double>")
                .alias("cv"),
            )
            for cid, vec in centroid_rows
        ]
    )
    return F.transform(
        cells,
        lambda c: F.struct(
            F.round(cosine_similarity(vec_col, c["cv"]), 6).alias("s"),
            (-c["cid"]).alias("nid"),
            c["cid"].alias("cid"),
        ),
    )


def cell_assign_expr(vec_col, centroid_rows) -> "F.Column":
    """Map-side nearest-centroid id for ``vec_col`` given driver-side
    ``centroid_rows`` = [(numeric cell_id, [float, ...]), ...].

    The centroids are inlined as an array-of-structs literal, so cell
    assignment is a pure projection — the corpus is NEVER shuffled or
    joined to be assigned (the crossJoin+window in :func:`assign_cells`
    shuffles per-id; this path is the 100 TB default). argmax by
    (rounded sim desc, cell_id asc) via struct array_max; numeric cell
    ids required for the negated tiebreak field."""
    return F.array_max(_cell_sims_expr(vec_col, centroid_rows))["cid"]


def cell_topn_expr(vec_col, centroid_rows, nprobe: int) -> "F.Column":
    """Map-side ARRAY of the ``nprobe`` nearest cell ids (the query-side
    multi-probe assignment) — sort-desc + slice over the same inlined
    similarity array as :func:`cell_assign_expr`."""
    ranked = F.reverse(F.array_sort(_cell_sims_expr(vec_col, centroid_rows)))
    return F.transform(F.slice(ranked, 1, nprobe), lambda c: c["cid"])


def ivf_knn_join(
    vectors: DataFrame,
    queries: DataFrame,
    centroids,  # DataFrame | list[(cell_id, [float])] — see centroid_rows
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    exclude_self: bool = True,
    impl: str = "arrow",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate top-k per query via IVF cell pruning
    → (query_id, id, cos_sim, rank).

    Corpus vectors index into their 1 nearest cell and queries probe
    their ``nprobe`` nearest cells MAP-SIDE (centroids are by
    definition centroid-table-sized → driver-collected once and
    inlined; no assignment shuffle, no crossJoin — the corpus's only
    shuffle is the cell-keyed candidate equi-join, candidate-
    proportional). A (query, id) candidate arises at most once (data
    row lives in exactly one cell, probe cells are distinct), so no
    dedup pass. Exact re-rank per query via window top-k.
    Recall < 1 by construction; the exact twin is :func:`knn_join`.

    ``impl="arrow"`` (default) assigns cells with the numpy matmul
    kernels in functions/vector (one (N×dim)@(dim×cells) per Arrow
    batch — the interpreted HOF cosine loop was ~1.5 ms/row); value-
    identical tie-breaks, same 6-dp rounding. ``impl="hof"`` keeps the
    pure-JVM expression path (zero Python in the plan).
    """
    from sifts_spark.functions.hashing import ensure_min_parallelism
    from sifts_spark.functions.vector import (
        VEC_BYTES_PER_SPLIT,
        cell_assign_arrow,
        cell_topn_arrow,
    )

    rows = centroid_rows(centroids)
    assign = (
        (lambda c: cell_assign_arrow(c, rows))
        if impl == "arrow"
        else (lambda c: cell_assign_expr(c, rows))
    )
    if impl == "arrow":
        vectors = ensure_min_parallelism(vectors, VEC_BYTES_PER_SPLIT)
    # coalesce makes the join key provably non-nullable, so the inner
    # join does NOT infer an IsNotNull(cell_id) filter. That inference
    # is poison on a Python-UDF key: the filter's UDF instance is pushed
    # below the repartition while the projection keeps its own copy —
    # the whole corpus-assignment kernel runs TWICE (observed in the
    # sf0.1 plan as two ArrowEvalPython[_assign] nodes). The sentinel
    # only ever tags null embeddings and matches no real cell.
    no_cell = F.lit(-(2**62)).cast("long")
    data_cells = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.coalesce(assign(F.col(vec_col)), no_cell).alias("cell_id"),
    )
    topn = (
        cell_topn_arrow(F.col(query_vec_col), rows, nprobe)
        if impl == "arrow"
        else cell_topn_expr(F.col(query_vec_col), rows, nprobe)
    )
    query_cells = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("qv"),
        F.explode(topn).alias("cell_id"),
    )
    if broadcast_queries:
        # The query batch is the small side BY CONSTRUCTION of a kNN
        # lookup; without the hint Spark's size estimator (which sees
        # only file stats) happily builds the hash relation from the
        # CORPUS side — a driver-side materialization of every vector,
        # which is an OOM at real scale and was measured slower here.
        # Corpus-vs-corpus callers pass broadcast_queries=False and get
        # the cell-keyed shuffle join.
        query_cells = F.broadcast(query_cells)
    joined = data_cells.join(query_cells, "cell_id")
    if exclude_self:
        joined = joined.filter(F.col("id") != F.col("query_id"))
    if impl == "arrow":
        from sifts_spark.functions.vector import cosine_similarity_arrow

        sim = cosine_similarity_arrow(F.col("v"), F.col("qv"))
    else:
        sim = F.round(cosine_similarity(F.col("v"), F.col("qv")), 6)
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("id"))
    return (
        joined.select("query_id", "id", sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ----------------------------------------------------------- SRP-LSH


def srp_hyperplanes(dim: int, n_planes: int = 32, seed: int = 1) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes for signed-random-
    projection LSH: h[p][i] = sin(seed + p*7919 + i*104729), in [-1,1]
    and uncorrelated enough for bucketing. Generated driver-side ONCE
    and inlined as literals into both the Spark plan and the SQL oracle
    — the two engines never each re-derive them, so libm ulp
    differences cannot desynchronize the buckets."""
    import math

    return [
        [math.sin(float(seed + p * 7919 + i * 104729)) for i in range(dim)]
        for p in range(n_planes)
    ]


def srp_band_keys_arrow(vec_col, planes, bands: int) -> "F.Column":
    """vector → ARRAY<LONG> of ``bands`` LSH band keys. Bit p of band b
    is sign(dot(v, plane[b*r+p])) with r = n_planes/bands; one numpy
    (N×dim)@(dim×planes) matmul per Arrow batch. A sign flip requires
    |dot| within ~1 ulp of 0 — vanishing for real-valued embeddings, so
    the oracle twin (same inlined planes, sequential double fold)
    buckets identically."""
    from pyspark.sql.functions import pandas_udf

    H = np.array(planes, dtype=np.float64)
    n_planes = H.shape[0]
    if n_planes % bands:
        raise ValueError("n_planes must be divisible by bands")
    r = n_planes // bands

    @pandas_udf("array<long>")
    def _keys(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="object")
        v = np.array(
            [np.zeros(H.shape[1]) if x is None else np.asarray(x, dtype=np.float64)
             for x in vecs]
        )
        bits = (v @ H.T) >= 0.0  # (N, n_planes)
        weights = (1 << np.arange(r, dtype=np.int64))
        keys = bits.reshape(len(v), bands, r) @ weights  # (N, bands)
        return pd.Series(list(keys.astype(np.int64)))

    return _keys(vec_col)


def srp_knn_join(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 32,
    bands: int = 4,
    seed: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k per query via signed-random-projection LSH
    → (query_id, id, cos_sim, rank). The LSH-bucketed scale path beside
    :func:`ivf_knn_join` (SURVEY: "IVF or LSH-bucketed variant"):

    * band keys are map-side (one Arrow matmul, no shuffle);
    * candidates come from the (band, key) equi-join — collision-
      proportional, never corpus × queries;
    * a pair colliding in several bands is deduped BEFORE the exact
      re-rank (dropDuplicates on (query_id, id) — dup rows are
      identical, so the pick is deterministic);
    * exact cosine re-rank, window top-k with (sim desc, id) tiebreak.

    Recall grows with bands (OR-amplification: P[candidate] =
    1-(1-s^r)^b for cosine-angle similarity s); misses are the LSH
    trade, the exact twin is :func:`knn_join`.
    """
    from sifts_spark.functions.hashing import ensure_min_parallelism
    from sifts_spark.functions.vector import (
        VEC_BYTES_PER_SPLIT,
        cosine_similarity_arrow,
    )

    planes = srp_hyperplanes(dim, n_planes, seed)
    vectors = ensure_min_parallelism(vectors, VEC_BYTES_PER_SPLIT)
    data_sig = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.posexplode(srp_band_keys_arrow(F.col(vec_col), planes, bands)).alias(
            "band", "key"
        ),
    )
    query_sig = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("qv"),
        F.posexplode(
            srp_band_keys_arrow(F.col(query_vec_col), planes, bands)
        ).alias("band", "key"),
    )
    cand = data_sig.join(query_sig, ["band", "key"]).select(
        "query_id", "id", "qv", "v"
    )
    if exclude_self:
        cand = cand.filter(F.col("id") != F.col("query_id"))
    # r17: score FIRST, dedup multi-band collisions AFTER, on scalars.
    # The old dropDuplicates ran BEFORE scoring and therefore carried
    # both dim-sized float arrays (qv, v) through its exchange — and
    # because first() over array<float> is not hash-aggregable, Spark
    # planned it as Sort → SortAggregate → Exchange → Sort →
    # SortAggregate (visible in the r17 before-plan). Scoring the
    # duplicate collisions costs one extra Arrow dot per extra band
    # hit (duplicates carry identical vectors → identical rounded
    # cos_sim, so max() is value-deterministic), while the dedup
    # becomes a partial-agg HashAggregate whose exchange moves three
    # scalars instead of two 64-float arrays (guide §2.3: shuffle
    # fewer bytes; §2.1: avoid sort aggregates). Value-identical:
    # pinned by test_srp_dedup_after_score_value_identical and the
    # srp_knn oracle row.
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("id"))
    return (
        cand.select(
            "query_id",
            "id",
            cosine_similarity_arrow(F.col("v"), F.col("qv")).alias("cos_sim"),
        )
        .groupBy("query_id", "id")
        .agg(F.max("cos_sim").alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def mmr_select(
    relevance: "list[float]",
    embeddings: "list[list[float]]",
    k: int,
    lambda_: float = 0.5,
) -> "list[int]":
    """Greedy Maximal Marginal Relevance selection (Carbonell &
    Goldstein, SIGIR 1998) over a BOUNDED candidate pool → the indices
    of the ``k`` picks in selection order.

    score_i = λ·relevance_i − (1−λ)·max_{j∈selected} cos(e_i, e_j);
    λ=1 is plain relevance ranking, λ=0 pure diversity. Ties break on
    the lower pool index, so with a deterministically-ordered pool
    (rank desc, id asc) the selection is rerun-stable.

    Driver-side numpy by design: MMR is inherently sequential (each
    pick changes every remaining score), and the pool is fetch_k-sized
    (~10²) REGARDLESS of corpus size — the distributed work is
    producing the pool (TakeOrdered over the corpus), not reranking
    it. O(k·n) dot products on an (n,d) matrix.
    """
    n = len(relevance)
    if n == 0 or k <= 0:
        return []
    mat = np.asarray(embeddings, dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0  # zero vectors: cos 0 to everything
    unit = mat / norms
    rel = np.asarray(relevance, dtype=np.float64)
    selected: list[int] = []
    max_sim = np.full(n, -np.inf)
    remaining = np.ones(n, dtype=bool)
    for _ in range(min(k, n)):
        if not selected:
            score = rel.copy()
        else:
            score = lambda_ * rel - (1.0 - lambda_) * max_sim
        score[~remaining] = -np.inf
        pick = int(np.argmax(score))  # argmax takes the FIRST maximum
        selected.append(pick)
        remaining[pick] = False
        sims = unit @ unit[pick]
        max_sim = np.maximum(max_sim, sims)
    return selected
