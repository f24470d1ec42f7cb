"""Vector math as Catalyst higher-order-function expressions.

Parity target: pgvector ``embedding <=> q`` cosine distance
(/root/reference/src/sifts/core.py:319-321, :558-564) and the SQLite
client-side numpy ranking (core.py:527-542). Both reduce to a cosine
similarity; we compute it with ``zip_with``/``aggregate`` so the whole
expression runs JVM-side inside codegen — no Python round-trip per row,
and TakeOrderedAndProject handles top-k without a full sort.

All arithmetic in DOUBLE: the testdata embeddings are float32, but
accumulating in float32 diverges from the DuckDB oracle (which promotes);
``cast`` early, stay double.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Spread sizing for the numpy batch kernels below (r17): their compute
# is ns/byte (one matmul per Arrow batch), so a tiny vector table
# spread to core-count splits pays per-task Arrow-boundary overhead
# far exceeding the kernel — size splits by BYTES instead
# (ensure_min_parallelism(bytes_per_split=...), guide §2.2). 128 KiB
# ≈ 300 64-dim float vectors per split; measured best-width band at
# sf0.1 (~4-8 splits for the 0.8 MB embeddings table, 32-way was the
# worst width for every vector row), converging to full width as the
# table grows.
VEC_BYTES_PER_SPLIT = 128 << 10


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity in [-1, 1]; null/zero-norm inputs → NULL
    (matches pgvector, which errors on zero vectors — we go NULL-safe)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


def cosine_similarity_sql(a_expr: str, b_expr: str) -> str:
    """DuckDB twin. list_cosine_similarity matches zip_with/aggregate
    up to float addition order; round before hashing (the harness does)."""
    return f"list_cosine_similarity({a_expr}, {b_expr})"


# ------------------------------------------------------- Arrow kernels
#
# Vectorized twins of the IVF cell-assignment expressions in
# operators/vector_search (cell_assign_expr / cell_topn_expr). The HOF
# path evaluates cosine-per-centroid in an interpreted per-element loop
# (~1.5 ms/row for 8 centroids x 64 dims at sf0.1 — it dominated the
# ivf_knn bench); these compute THE SAME rounded-to-6dp similarities as
# one numpy (N x dim) @ (dim x cells) matmul per Arrow batch. Tie-break
# parity: centroids sorted by cell_id ascending + stable argsort on
# -sim == (sim desc, cell_id asc), exactly the struct ordering the HOF
# path uses. Sum order differs (pairwise SIMD vs sequential fold) only
# in the last ulp — 9 decimal digits below the 6-dp rounding guard.


def _centroid_matrix(centroid_rows):
    """[(cid, [floats]), ...] -> (cids sorted asc, matrix, norms)."""
    rows = sorted(centroid_rows, key=lambda r: r[0])
    cids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    return cids, mat, norms


def _batch_cell_sims(vecs, mat, norms):
    """pd.Series of embeddings -> (N x cells) rounded similarity matrix
    (rows with null/zero-norm vectors come out as NaN)."""
    v = np.array(
        [np.zeros(mat.shape[1]) if x is None else np.asarray(x, dtype=np.float64)
         for x in vecs]
    )
    vn = np.sqrt((v * v).sum(axis=1))
    denom = np.outer(vn, norms)
    with np.errstate(divide="ignore", invalid="ignore"):
        sims = np.where(denom > 0, (v @ mat.T) / denom, np.nan)
    return np.round(sims, 6)


def cosine_similarity_arrow(a_col: Column, b_col: Column) -> Column:
    """Pairwise cosine(a, b) rounded to 6 dp, Arrow-vectorized — the
    batch twin of ``F.round(cosine_similarity(a, b), 6)`` for candidate-
    pair re-ranking, where the interpreted HOF fold (~30 µs/pair at
    dim 64) dominates blocked self-joins. NULL/zero-norm → NULL, exactly
    like the HOF path (Spark's Divide is null-on-zero): returning NaN
    here would be value-DIFFERENT in ranking consumers, because Spark
    sorts NaN ABOVE every double, so a zero-norm embedding would rank
    at the TOP of a ``cos_sim DESC`` window instead of last."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        dim = next((len(x) for x in a if x is not None), 0)
        za = np.zeros(dim)
        av = np.array(
            [za if x is None else np.asarray(x, dtype=np.float64) for x in a]
        )
        bv = np.array(
            [za if x is None else np.asarray(x, dtype=np.float64) for x in b]
        )
        num = (av * bv).sum(axis=1)
        denom = np.sqrt((av * av).sum(axis=1)) * np.sqrt((bv * bv).sum(axis=1))
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(denom > 0, num / denom, np.nan)
        # NaN -> None so the Arrow column carries real NULLs
        return pd.Series(np.round(out, 6)).where(~np.isnan(out), None)

    return _cos(a_col, b_col)


def cosine_vs_const_arrow(vec_col: Column, query_vec) -> Column:
    """cosine(vec, CONSTANT query) rounded to 6 dp, Arrow-vectorized —
    the fixed-query twin of :func:`cosine_similarity_arrow` for the
    single-query exact-kNN scan (r17): the query vector is closed over
    driver-side, so only ONE column crosses the Python boundary
    instead of shipping the same query array per row (guide §4.1).
    NULL/zero-norm → NULL, like the HOF path."""
    from pyspark.sql.functions import pandas_udf

    q = np.asarray([float(x) for x in query_vec], dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))

    @pandas_udf("double")
    def _cos(a: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        za = np.zeros(len(q))
        av = np.array(
            [za if x is None else np.asarray(x, dtype=np.float64) for x in a]
        )
        num = av @ q
        denom = np.sqrt((av * av).sum(axis=1)) * qn
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(denom > 0, num / denom, np.nan)
        return pd.Series(np.round(out, 6)).where(~np.isnan(out), None)

    return _cos(vec_col)


def cosine_vs_const_seqfold_arrow(vec_col: Column, query_vec) -> Column:
    """UNROUNDED cosine(vec, CONSTANT query), bit-identical to the
    interpreted HOF expression ``cosine_similarity(vec, qlit)`` — the
    Collection.query serving-path twin (r18).

    The catalog kernels round to 6 dp, which absorbs the last-ulp
    sum-order difference between numpy's pairwise SIMD reduction and
    the HOF's sequential left fold. Collection rank is UNROUNDED (it is
    user-visible and pinned by tests against the HOF values), so this
    kernel reproduces the fold's exact float semantics instead of
    rounding them away:

    * products elementwise in double after an exact float32→float64
      widen — same IEEE values as ``x.cast("double") * y.cast("double")``;
    * the fold via ``np.cumsum`` (strictly sequential left-to-right
      double adds; the fold's ``0.0 + x0`` is exact, so prefix sums are
      bit-equal);
    * ``sqrt`` is correctly rounded on both sides (IEEE-754);
    * NULL/length edges match ``zip_with``/``aggregate``/``when``:
      null row → NULL; dim mismatch → NULL (zip_with pads with null →
      null fold); zero-norm (either side) or empty array → denom 0 →
      NULL; NaN-poisoned input → NaN (Spark's ``NaN > 0`` is TRUE under
      its total order, so the HOF emits NaN/NaN = NaN, not NULL).

    Pinned bit-exact against the HOF by
    tests/test_vector.py::test_seqfold_kernel_bitexact_vs_hof.
    """
    from pyspark.sql.functions import pandas_udf

    q = np.asarray([float(x) for x in query_vec], dtype=np.float64)
    if len(q) == 0 or np.isnan(q).any():
        # Degenerate queries: the HOF's NULL/NaN algebra over a NaN or
        # empty LITERAL side is row-shape-dependent and cannot cross
        # the pandas→Arrow boundary (pandas floats have no NaN≠NULL
        # distinction) — serve the expression path, which is exact by
        # definition and never hot for a nonsense query.
        qlit = F.array(*[F.lit(float(x)) for x in query_vec]).cast(
            "array<double>"
        )
        return cosine_similarity(vec_col, qlit)
    qn = float(np.sqrt(np.cumsum(q * q)[-1]))

    @pandas_udf("double")
    def _cos(a: pd.Series) -> pd.Series:
        n = len(a)
        if n == 0:
            return pd.Series([], dtype="float64")
        vals = a.to_numpy()
        ok = np.fromiter(
            (x is not None and len(x) == len(q) for x in vals),
            dtype=bool, count=n,
        )
        out: list = [None] * n
        idx = np.flatnonzero(ok)
        if len(idx):
            m = np.stack(
                [np.asarray(vals[i], dtype=np.float64) for i in idx]
            )
            dot = np.cumsum(m * q, axis=1)[:, -1]
            na = np.sqrt(np.cumsum(m * m, axis=1)[:, -1])
            denom = na * qn
            vpositive = denom > 0  # IEEE: False for 0 and NaN
            with np.errstate(divide="ignore", invalid="ignore"):
                ratio = dot / denom
            for j, i in enumerate(idx):
                if vpositive[j]:
                    out[i] = float(ratio[j])
                # NaN-poisoned rows stay None here; the JVM wrapper
                # below re-injects NaN (pandas cannot carry NaN≠NULL).
        return pd.Series(out, dtype="object")

    # NaN-poisoned vectors: the HOF emits NaN (Spark's total order has
    # NaN > 0, so `when(denom > 0, ...)` takes the THEN branch and
    # NaN/NaN = NaN), while pandas→Arrow would collapse the kernel's
    # NaN to NULL. array_max propagates NaN under the same total order
    # (NaN is the max whenever present), so one cheap JVM collection
    # expression restores the exact edge. The size guard keeps the
    # NaN+dim-mismatch combination on the kernel path: there zip_with's
    # null padding nulls the fold FIRST (acc + NULL = NULL beats NaN),
    # so the HOF emits NULL, not NaN.
    return F.when(
        F.isnan(F.array_max(vec_col))
        & (F.size(vec_col) == F.lit(len(q))),
        F.lit(float("nan")),
    ).otherwise(_cos(vec_col))


def cell_assign_arrow(vec_col: Column, centroid_rows) -> Column:
    """Map-side nearest-centroid id, Arrow-vectorized. Value-identical
    to :func:`sifts_spark.operators.vector_search.cell_assign_expr`:
    argmax by (sim rounded to 6dp desc, cell_id asc). Delegates to
    :func:`cell_assign_sim_arrow` — ONE argmax/tie/NULL implementation
    to keep value-identical, not two."""
    return cell_assign_sim_arrow(vec_col, centroid_rows).getField(
        "cell_id"
    )


def cell_assign_sim_arrow(vec_col: Column, centroid_rows) -> Column:
    """Map-side ``struct<cell_id, sim>`` of the nearest centroid and
    its rounded cosine — :func:`cell_assign_arrow` plus the winning
    similarity in the same Arrow pass, for consumers that keep a
    prototypicality signal per assignment (topic audits, SemDeDup-style
    keep rules). Ties: lowest cell_id (argmax-first, the
    ``assign_cells`` contract); NULL/zero-norm vectors assign to the
    lowest cell id with ``sim`` NULL (the dedup-module posture —
    filter upstream if unassignable rows should vanish)."""
    from pyspark.sql.functions import pandas_udf

    cids, mat, norms = _centroid_matrix(centroid_rows)

    @pandas_udf("cell_id long, sim double")
    def _assign(vecs: pd.Series) -> pd.DataFrame:
        if len(vecs) == 0:
            return pd.DataFrame(
                {
                    "cell_id": pd.Series([], dtype="int64"),
                    "sim": pd.Series([], dtype="float64"),
                }
            )
        sims = _batch_cell_sims(vecs, mat, norms)
        best = np.argmax(np.where(np.isnan(sims), -np.inf, sims), axis=1)
        bsim = sims[np.arange(len(sims)), best]
        return pd.DataFrame(
            {
                "cell_id": cids[best],
                "sim": pd.Series(bsim).where(~np.isnan(bsim), None),
            }
        )

    return _assign(vec_col)


def cell_topn_arrow(vec_col: Column, centroid_rows, nprobe: int) -> Column:
    """Map-side ARRAY of the ``nprobe`` nearest cell ids, Arrow-
    vectorized twin of
    :func:`sifts_spark.operators.vector_search.cell_topn_expr`."""
    from pyspark.sql.functions import pandas_udf

    cids, mat, norms = _centroid_matrix(centroid_rows)

    @pandas_udf("array<long>")
    def _topn(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="object")
        sims = _batch_cell_sims(vecs, mat, norms)
        # stable sort on -sim: ties keep column order == cell_id asc
        order = np.argsort(
            np.where(np.isnan(sims), np.inf, -sims), axis=1, kind="stable"
        )[:, :nprobe]
        return pd.Series(list(cids[order]))

    return _topn(vec_col)
