"""Bucketed table layout: co-located fact↔fact joins without a shuffle.

At 100 TB the dominant cost of `lineitem ⋈ orders`-class joins is
shuffling both facts on the join key. Writing both sides bucketed by
that key (same bucket count) lets Spark's bucketed-scan rule line
buckets up 1:1 — `.explain` shows a SortMergeJoin with NO Exchange on
either side. This is the static twin of AQE's runtime optimizations:
you pay the shuffle once at layout time, every subsequent join is free.

Bucketing requires the session catalog (``saveAsTable``); pass a
``tmp_path``-scoped warehouse in tests via
``spark.sql.warehouse.dir``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    sort_by: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog
    table. Sorting within buckets additionally removes the Sort from a
    later SortMergeJoin — the join degenerates to a streamed merge."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
