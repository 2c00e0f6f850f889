"""Order-dashboard aggregations (the reference's flagship application).

Re-expresses the "Double-11" live order dashboard of
``/root/reference/src/main/scala/com/hk/orderTest/OrderAnalysy.scala``:
orders keyed globally and by province, bucketed into a ``yyyyMMdd`` day
(OrderAnalysy.scala:282-285), emitting ``(orderDay, totalNum,
totalMoney)`` and ``(orderDay, province, totalNum, totalMoney)``
(OrderAnalysy.scala:69-144). The driver testdata has no province
column; the customer's nation (via a broadcast-joined dim table) plays
that role — same shape: a low-cardinality group key from a small
dimension.

Scale notes:
- The day/province aggregation is a single hash-shuffle on the group
  key with map-side partial aggregation — the canonical scalable shape.
- ``nation`` (25 rows) and ``customer`` (1.5k .. 150M rows at 100 TB)
  differ: nation is always broadcast; customer->orders is a key join
  that AQE handles (or bucketing co-locates in a real deployment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def day_bucket(ts_col: str) -> F.Column:
    """``yyyyMMdd`` integer day bucket (OrderAnalysy.scala:282-285)."""
    return F.date_format(F.col(ts_col), "yyyyMMdd").cast("int").alias("order_day")


def order_totals_by_day(orders: DataFrame) -> DataFrame:
    """Global per-day order count + money total (TotalDataFun,
    OrderAnalysy.scala:308-336 / sink :215-273)."""
    return (
        orders.groupBy(day_bucket("o_orderdate"))
        .agg(
            F.count("*").alias("total_num"),
            F.round(F.sum("o_totalprice"), 2).alias("total_money"),
        )
    )


def order_totals_rollup(
    orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Day × province totals with subtotal levels (ROLLUP): the
    dashboard's per-province and per-day views plus the grand total in
    ONE aggregation pass — Spark computes all grouping sets in a single
    shuffle (partial aggs per set), instead of three separate jobs.

    Aggregated-out keys are filled with sentinels (-1 / 'ALL') so the
    output schema is null-free and engine-portable.
    """
    dim = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("province"))
    joined = orders.join(dim, orders.o_custkey == dim.c_custkey).select(
        day_bucket("o_orderdate"), "province", "o_totalprice"
    )
    rolled = joined.rollup("order_day", "province").agg(
        F.count("*").alias("total_num"),
        F.round(F.sum("o_totalprice"), 2).alias("total_money"),
    )
    return rolled.select(
        F.coalesce("order_day", F.lit(-1)).alias("order_day"),
        F.coalesce("province", F.lit("ALL")).alias("province"),
        "total_num",
        "total_money",
    )


def order_totals_by_day_province(
    orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Per-day, per-province count + money total (GroupDataFuc,
    OrderAnalysy.scala:275-303; keyBy(_.province) :55).

    nation is broadcast (25 rows); the orders->customer join shuffles on
    custkey and is AQE/bucketing-friendly at scale.
    """
    dim = customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey).select(
        "c_custkey", F.col("n_name").alias("province")
    )
    return (
        orders.join(dim, orders.o_custkey == dim.c_custkey)
        .groupBy(day_bucket("o_orderdate"), "province")
        .agg(
            F.count("*").alias("total_num"),
            F.round(F.sum("o_totalprice"), 2).alias("total_money"),
        )
    )
