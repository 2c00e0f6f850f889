"""Bucketed co-located join: the 100 TB join strategy, proven on the plan.

At cluster scale the orders↔customer join (the dashboard's one big
join) should not shuffle either fact table per query: writing both
sides bucketed by the join key lets Spark's sort-merge join read
co-located buckets directly. This test writes both tables bucketed,
joins them, and asserts the physical plan contains NO Exchange — the
shuffle is paid once at write time, then amortized over every
subsequent join/aggregation on that key.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_tables(spark, sf_dir, tmp_path):
    from flink_scala_spark import tables

    spark.sql("CREATE DATABASE IF NOT EXISTS bucketing_test")
    orders = tables.load(spark, sf_dir, "orders")
    customer = tables.load(spark, sf_dir, "customer")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .option("path", str(tmp_path / "orders_b"))
        .saveAsTable("bucketing_test.orders_b")
    )
    (
        customer.write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .option("path", str(tmp_path / "customer_b"))
        .saveAsTable("bucketing_test.customer_b")
    )
    yield "bucketing_test.orders_b", "bucketing_test.customer_b"
    spark.sql("DROP TABLE IF EXISTS bucketing_test.orders_b")
    spark.sql("DROP TABLE IF EXISTS bucketing_test.customer_b")
    spark.sql("DROP DATABASE IF EXISTS bucketing_test")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    orders_t, customer_t = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(orders_t)
            .join(
                spark.table(customer_t),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .groupBy("c_nationkey")
            .agg(F.count("*").alias("cnt"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # join itself must be shuffle-free; the only exchange allowed is
        # the post-join groupBy on a DIFFERENT key
        join_section = plan.split("SortMergeJoin")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_section, (
            "bucketed sort-merge join should read co-located buckets, "
            f"but the plan shuffles below the join:\n{plan}"
        )
        # correctness unchanged vs the unbucketed join
        expected = (
            spark.table(orders_t)
            .join(
                spark.table(customer_t).hint("broadcast"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .count()
        )
        assert joined.agg(F.sum("cnt")).collect()[0][0] == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
