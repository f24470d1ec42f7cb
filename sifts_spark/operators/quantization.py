"""Product quantization (PQ) for embedding columns — the ANN *memory*
story at 100 TB.

The reference's vector path holds full float vectors (pgvector column,
/root/reference/src/sifts/core.py:558-564 exact scan; SQLite JSON
arrays, :527-542). ivf_knn_join / srp_knn_join (vector_search.py) fix
the *compute* shape — candidate-proportional joins instead of corpus
scans — but every candidate row still ships its float32[dim] payload
through the shuffle and holds it in executor memory. At 100 TB of
embeddings that payload IS the cost: a 64-dim float32 vector is 256
bytes; its 8-byte PQ code is 32x smaller, so the candidate shuffle,
the cache working set, and the scan bandwidth all shrink 32x.

Method (Jegou, Douze, Schmid, "Product Quantization for Nearest
Neighbor Search", IEEE TPAMI 2011 — the IVFADC family faiss
implements):

* **train** — split the dim-D space into ``m`` subspaces of D/m dims;
  k-means each subspace independently on a driver-side sample
  (codebooks are tiny: m * 2^nbits * D/m floats — the corpus never
  leaves the executors, same training posture as
  vector_search.kmeans_centroids).
* **encode** — map-side Arrow kernel: L2-normalize, then per subspace
  argmax-IP against the sub-codebook → ``array<int>`` of m codes per
  vector. One (batch x ksub) matmul per subspace per Arrow batch.
* **search (ADC)** — asymmetric distance computation: the QUERY stays
  un-quantized; per query build an (m x ksub) lookup table of
  sub-inner-products, then a candidate's estimated cosine is m table
  lookups + a sum — no float vector ever touches the corpus side.
  Numpy shape: ``LUT[arange(m), codes].sum(axis=1)`` per batch.
* **refine** — optional exact re-rank of the ADC top-(k*refine)
  against the true vectors ("PQ with re-ranking"): joins only
  k*refine rows per query back to the float table, restoring
  exact-ordering at the top while the scan stayed code-sized.

Spherical convention: corpus vectors are normalized at encode time and
queries at LUT time, so ADC inner product estimates cosine — matching
every other similarity operator in this repo.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _normalize_rows(X: np.ndarray) -> np.ndarray:
    norms = np.sqrt((X * X).sum(axis=1, keepdims=True))
    norms[norms == 0.0] = 1.0
    return X / norms


def pq_train(
    vectors: DataFrame,
    dim: int,
    m: int = 8,
    nbits: int = 8,
    vec_col: str = "embedding",
    sample_size: int = 65536,
    iters: int = 10,
    seed: int = 1,
) -> list:
    """Train PQ codebooks on a seeded sample → nested list with shape
    ``(m, ksub, dim/m)``, ksub = 2^nbits.

    Driver-side numpy k-means per subspace (k-means++ init, Lloyd
    iterations, empty-cluster reseed to the farthest point) — the
    sample is ≤ ``sample_size`` rows regardless of corpus size, and the
    returned codebooks total ``m * ksub * dim/m`` floats (for the
    default 8x256 over 64 dims: 16 KiB) — always broadcastable, always
    inlinable. Deterministic for fixed (corpus, seed, sample_size).
    """
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    ksub = 1 << nbits
    vec = vectors.select(F.col(vec_col).alias("v")).filter(F.col("v").isNotNull())
    n = vec.count()
    frac = min(1.0, (sample_size * 1.2) / max(n, 1))
    rows = (
        vec.sample(withReplacement=False, fraction=frac, seed=seed)
        .limit(sample_size)
        .collect()
    )
    X = _normalize_rows(np.asarray([list(r["v"]) for r in rows], dtype=np.float64))
    if len(X) == 0:
        raise ValueError("no non-null vectors to train on")
    rng = np.random.RandomState(seed)
    books = np.empty((m, ksub, dsub))
    for j in range(m):
        S = np.ascontiguousarray(X[:, j * dsub : (j + 1) * dsub])
        k = min(ksub, len(np.unique(S, axis=0)))
        # k-means++ init on squared euclidean
        centers = np.empty((k, dsub))
        centers[0] = S[rng.randint(len(S))]
        d2 = ((S - centers[0]) ** 2).sum(axis=1)
        for i in range(1, k):
            total = float(d2.sum())
            if total <= 0:
                centers[i] = S[rng.randint(len(S))]
            else:
                centers[i] = S[np.searchsorted(np.cumsum(d2), rng.rand() * total)]
            d2 = np.minimum(d2, ((S - centers[i]) ** 2).sum(axis=1))
        for _ in range(iters):
            # (N,k) distances via |s|^2 - 2 s.c + |c|^2; argmin per row
            dots = S @ centers.T
            cn = (centers * centers).sum(axis=1)
            assign = np.argmin(cn[None, :] - 2.0 * dots, axis=1)
            dist = (S * S).sum(axis=1) + cn[assign] - 2.0 * dots[np.arange(len(S)), assign]
            for c in range(k):
                members = S[assign == c]
                if len(members) == 0:
                    centers[c] = S[np.argmax(dist)]
                    continue
                centers[c] = members.mean(axis=0)
        if k < ksub:
            # duplicate-pad so codes always index a full 2^nbits table;
            # padded entries are never the argmax winner's unique owner
            centers = np.vstack([centers, np.repeat(centers[:1], ksub - k, axis=0)])
        books[j] = centers
    return books.tolist()


def _codebook_array(codebooks) -> np.ndarray:
    B = np.asarray(codebooks, dtype=np.float64)
    if B.ndim != 3:
        raise ValueError(f"codebooks must be (m, ksub, dsub), got shape {B.shape}")
    return B


def pq_encode_arrow(vec_col, codebooks) -> "F.Column":
    """vector → ``array<int>`` of m PQ codes, map-side. Per Arrow batch
    and subspace: one (N x dsub)@(dsub x ksub) matmul + argmax — the
    nearest sub-centroid in L2 on the normalized vector (|s|^2 is
    constant per row, so argmin L2 == argmax(IP - |c|^2/2))."""
    from pyspark.sql.functions import pandas_udf

    B = _codebook_array(codebooks)
    m, ksub, dsub = B.shape
    half_cn = 0.5 * (B * B).sum(axis=2)  # (m, ksub)

    @pandas_udf("array<int>")
    def _encode(vecs: pd.Series) -> pd.Series:
        out = []
        mask = vecs.notna().to_numpy()
        if mask.any():
            V = _normalize_rows(
                np.asarray([list(x) for x in vecs[mask]], dtype=np.float64)
            )
            codes = np.empty((len(V), m), dtype=np.int32)
            for j in range(m):
                S = V[:, j * dsub : (j + 1) * dsub]
                codes[:, j] = np.argmax(S @ B[j].T - half_cn[j][None, :], axis=1)
            it = iter(codes)
        for ok in mask:
            out.append(next(it).tolist() if ok else None)
        return pd.Series(out, dtype="object")

    return _encode(vec_col)


def pq_encode(
    vectors: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """corpus → (id, codes) — the persisted, 32x-smaller search table.
    Map-side only; callers write this beside (not instead of) the float
    table, which the refine step and exact re-checks still read."""
    return vectors.select(
        F.col(id_col).alias("id"),
        pq_encode_arrow(F.col(vec_col), codebooks).alias("codes"),
    )


def pq_adc_score_arrow(codes_col, qv_col, codebooks, qid_col=None) -> "F.Column":
    """(codes, query_vector[, query_id]) → estimated cosine, Arrow
    kernel.

    Per batch: one LUT = (m x ksub) table of sub-inner-products per
    DISTINCT query in the batch — a kNN batch repeats each query
    across its candidates — then ``LUT[arange(m), codes].sum(axis=1)``
    scores the whole query group in one fancy-index.

    Pass ``qid_col`` when candidate rows carry a query id (every kNN
    join does): grouping then runs through pandas ``groupby`` on the
    scalar id at C speed. Without it, queries dedupe by hashing each
    row's vector bytes — a per-row Python loop that dominated the
    join (11.9s → 3.8s at the 10× corpus when the joins switched to
    qid grouping).

    Null codes or a null query vector score SQL NULL (not NaN): Spark
    orders NaN ABOVE every real double in a descending sort, so a NaN
    would let null-input rows "win" a top-k for direct callers of this
    public kernel; NULL sorts last under ``desc`` ordering."""
    from pyspark.sql.functions import pandas_udf

    B = _codebook_array(codebooks)
    m, ksub, dsub = B.shape

    def _lut(q: np.ndarray) -> np.ndarray:
        qn = np.sqrt((q * q).sum()) or 1.0
        qs = (q / qn).reshape(m, dsub)
        # LUT[j][c] = <q_sub_j, codebook[j][c]>
        return np.einsum("jd,jkd->jk", qs, B)

    rows = np.arange(m)

    @pandas_udf("double")
    def _score_by_qid(
        codes: pd.Series, qv: pd.Series, qid: pd.Series
    ) -> pd.Series:
        n = len(codes)
        out = np.full(n, np.nan)
        ok = codes.notna().to_numpy() & qv.notna().to_numpy()
        if ok.any():
            idx = np.nonzero(ok)[0]
            C = np.asarray([list(c) for c in codes.iloc[idx]], dtype=np.int64)
            for _, sub in pd.Series(np.arange(len(idx))).groupby(
                qid.iloc[idx].reset_index(drop=True)
            ):
                sel = sub.to_numpy()
                lut = _lut(
                    np.asarray(list(qv.iloc[idx[sel[0]]]), dtype=np.float64)
                )
                out[idx[sel]] = lut[rows[None, :], C[sel]].sum(axis=1)
        s = pd.Series(np.round(out, 6))
        return s.where(pd.notna(s), None)  # NaN (null input) -> SQL NULL

    @pandas_udf("double")
    def _score(codes: pd.Series, qv: pd.Series) -> pd.Series:
        n = len(codes)
        out = np.full(n, np.nan)
        ok = codes.notna().to_numpy() & qv.notna().to_numpy()
        if ok.any():
            idx = np.nonzero(ok)[0]
            C = np.asarray([list(c) for c in codes.iloc[idx]], dtype=np.int64)
            luts: dict[bytes, np.ndarray] = {}
            groups: dict[bytes, list[int]] = {}
            for pos, i in enumerate(idx):
                q = np.asarray(list(qv.iloc[i]), dtype=np.float64)
                key = q.tobytes()
                if key not in luts:
                    luts[key] = _lut(q)
                groups.setdefault(key, []).append(pos)
            for key, poss in groups.items():
                sel = np.asarray(poss)
                out[idx[sel]] = luts[key][rows[None, :], C[sel]].sum(axis=1)
        s = pd.Series(np.round(out, 6))
        return s.where(pd.notna(s), None)  # NaN (null input) -> SQL NULL

    if qid_col is not None:
        return _score_by_qid(codes_col, qv_col, qid_col)
    return _score(codes_col, qv_col)


def pq_knn_join(
    codes: DataFrame,
    queries: DataFrame,
    codebooks,
    k: int = 5,
    refine: int = 0,
    vectors: DataFrame | None = None,
    id_col: str = "id",
    codes_col: str = "codes",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """ADC top-k per query over a PQ-coded corpus
    → (query_id, id, score, rank); ``score`` is the ADC cosine
    estimate, or the EXACT cosine when refining.

    The scan side carries only (id, m-byte codes) — broadcast-joined
    against the query batch, scored by LUT lookups, window top-k. With
    ``refine=r > 0`` the per-query top (k*r) ADC winners join back to
    the float ``vectors`` table (k*r rows per query, not the corpus)
    for exact cosine re-ranking — the standard recall-restoring tail.

    At 100 TB: the expensive pass reads 32x less than a float scan and
    ships no vectors; the refine join is candidate-sized and
    equi-keyed on id.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")
    ).filter(
        F.col("qv").isNotNull()  # null query -> NULL score; drop before
        # the cross join rather than carrying dead rows through it
    )
    c = codes.select(F.col(id_col).alias("id"), F.col(codes_col).alias("codes")).filter(
        F.col("codes").isNotNull()  # null embedding -> no codes -> NULL
        # score; drop here so they never enter the candidate join
    )
    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col("id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        "id",
        pq_adc_score_arrow(
            F.col("codes"), F.col("qv"), codebooks, qid_col=F.col("query_id")
        ).alias("score"),
        *(["qv"] if refine else []),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("id"))
    fanout = k * refine if refine else k
    top = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= fanout)
    )
    if not refine:
        return top
    if vectors is None:
        raise ValueError("refine > 0 requires the float `vectors` table")
    from sifts_spark.functions.vector import cosine_similarity_arrow

    v = vectors.select(F.col(vec_id_col).alias("id"), F.col(vec_col).alias("v"))
    exact = top.drop("rank", "score").join(v, "id").select(
        "query_id",
        "id",
        cosine_similarity_arrow(F.col("v"), F.col("qv")).alias("score"),
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )


def ivfpq_knn_join(
    vectors: DataFrame,
    queries: DataFrame,
    centroids,
    codebooks,
    k: int = 5,
    nprobe: int = 2,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """IVF cell pruning x PQ codes — the composed 100 TB plan
    (faiss "IVFADC") → (query_id, id, score, rank), exact-refined.

    Corpus rows are assigned to 1 cell AND encoded to m-byte codes in
    the same map-side projection; queries probe ``nprobe`` cells; the
    candidate equi-join ships codes only; ADC scores candidates; the
    per-query ADC top-(k*refine) re-ranks exactly against the float
    table. Compute is candidate-proportional (IVF) and the candidate
    payload is code-sized (PQ) — the two prunings compose
    multiplicatively.
    """
    from sifts_spark.functions.vector import (
        cell_assign_arrow,
        cell_topn_arrow,
        cosine_similarity_arrow,
    )
    from sifts_spark.operators.vector_search import centroid_rows

    rows = centroid_rows(centroids)
    no_cell = F.lit(-(2**62)).cast("long")
    data_side = vectors.select(
        F.col(id_col).alias("id"),
        F.coalesce(cell_assign_arrow(F.col(vec_col), rows), no_cell).alias("cell_id"),
        pq_encode_arrow(F.col(vec_col), codebooks).alias("codes"),
    )
    query_side = F.broadcast(
        queries.filter(F.col(query_vec_col).isNotNull())  # null query →
        # NULL ADC score; drop before the candidate join
        .select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("qv"),
            F.explode(
                cell_topn_arrow(F.col(query_vec_col), rows, nprobe)
            ).alias("cell_id"),
        )
    )
    cand = data_side.join(query_side, "cell_id")
    if exclude_self:
        cand = cand.filter(F.col("id") != F.col("query_id"))
    scored = cand.select(
        "query_id",
        "id",
        pq_adc_score_arrow(
            F.col("codes"), F.col("qv"), codebooks, qid_col=F.col("query_id")
        ).alias("score"),
        "qv",
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("id"))
    top = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= max(k * refine, k))
        .drop("rank", "score")
    )
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    exact = top.join(v, "id").select(
        "query_id",
        "id",
        cosine_similarity_arrow(F.col("v"), F.col("qv")).alias("score"),
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )


def pq_compression_ratio(dim: int, m: int, nbits: int = 8, float_bytes: int = 4) -> float:
    """Bytes-per-vector ratio float table : code table (the memory
    claim, e.g. 64-dim float32 vs 8x8-bit codes → 32.0)."""
    code_bytes = m * nbits / 8.0
    return (dim * float_bytes) / code_bytes
