"""Bucketed co-located join: the plan must contain NO shuffle Exchange.

Broadcast is disabled inside the test — at real fact×fact scale neither
side fits the broadcast threshold, which is exactly when bucketing
matters; with tiny test tables the planner would otherwise just
broadcast and never exercise the bucketed-scan rule.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sifts_spark.sources.bucketing import read_table, write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")


def test_bucketed_join_has_no_exchange(spark, no_broadcast):
    orders = spark.range(0, 1000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 7).alias("o_custkey"),
    )
    items = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("l_orderkey"),
        (F.col("id") % 13).cast("double").alias("l_quantity"),
    )
    write_bucketed(orders, "b_orders", "o_orderkey", buckets=4, sort_by="o_orderkey")
    write_bucketed(items, "b_items", "l_orderkey", buckets=4, sort_by="l_orderkey")

    joined = read_table(spark, "b_items").join(
        read_table(spark, "b_orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan
    # co-located join result is right
    assert joined.count() == 5000
