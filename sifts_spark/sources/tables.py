"""Loaders for the driver's parquet tables (TESTDATA.md).

Plain ``spark.read.parquet`` — schema comes from the files; filters and
projections applied by callers reach the scan via Catalyst pushdown.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from pyspark.sql import functions as F

    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # The events parquet carries NAIVE timestamps. Two session-default
        # hazards, both normalized HERE (the layer every caller — including
        # the driver's stock SparkSession — flows through), not in the
        # session factory:
        #   * TIMESTAMP(NANOS) files: Spark's vectorized reader rejects
        #     nanos; read as long and truncate to micros (DuckDB's µs
        #     coercion does the same).
        #   * timestamp[us] files: Spark 4 with default
        #     inferTimestampNTZ=true reads them as TIMESTAMP_NTZ, which
        #     unix_micros/watermarks reject. Cast to TIMESTAMP — with the
        #     UTC session timezone the instant is value-identical to the
        #     naive wall-clock the DuckDB oracle sees.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def register_testdata(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql use)."""
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)
