"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` delegate to the catalog in
``sifts_spark.plans.catalog`` — one entry per implemented operator from
SURVEY.md §2 plus the training-data-pipeline extensions, each paired
with a DuckDB-runnable ANSI-SQL oracle producing identical rows.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sifts_spark.plans.catalog import ORACLES, QUERIES, flagship  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: BM25-ranked conjunctive
    full-text search over the documents collection via the postings
    index (SURVEY §2 R2/R3 + §2.5 rank)."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
