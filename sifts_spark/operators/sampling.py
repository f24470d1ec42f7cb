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
