"""The plain-SQL surface: every test table registered as a view, ANSI
SQL running through the same Catalyst pipeline as the DataFrame API."""

from __future__ import annotations


def test_sql_over_registered_views(spark, sf_dir):
    from flink_scala_spark import tables

    tables.register_views(spark, sf_dir)
    df = spark.sql(
        """
        SELECT n.n_name, count(*) AS cnt, round(sum(o.o_totalprice), 2) AS total
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        ORDER BY total DESC
        """
    )
    rows = df.collect()
    assert rows
    # same result through the DataFrame API
    from flink_scala_spark.operators import dashboard
    from pyspark.sql import functions as F

    api = (
        dashboard.order_totals_by_day_province(
            tables.load(spark, sf_dir, "orders"),
            tables.load(spark, sf_dir, "customer"),
            tables.load(spark, sf_dir, "nation"),
        )
        .groupBy("province")
        .agg(F.sum("total_num").alias("cnt"))
    )
    sql_counts = {r["n_name"]: r["cnt"] for r in rows}
    api_counts = {r["province"]: r["cnt"] for r in api.collect()}
    assert sql_counts == api_counts
