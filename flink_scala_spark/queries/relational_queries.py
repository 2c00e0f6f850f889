"""Relational breadth: classic analytical join/agg shapes (TPC-H
flavored, adapted to the driver's star schema) that a user migrating
off the reference would expect a general-purpose engine to run.

Scale discipline shared by every query here:

- All money aggregation runs in DECIMAL(12,2)/(4,2) so sums are
  order-independent and the DuckDB oracle matches bit-for-bit (the
  technique proven by ``lineitem_pricing_summary``); the one cast to
  DOUBLE happens after the aggregate.
- Broadcast-hint policy (round 9): explicit ``F.broadcast()`` hints go
  ONLY on fixed-cardinality artifacts — nation (25 rows), region (5),
  1-row aggregates, per-type stats frames. SF-SCALING tables
  (customer/part/supplier — hundreds of GB each at 100 TB) are joined
  UNHINTED: AQE's size check broadcasts them while they are genuinely
  under threshold (they are, at every test SF, so plans are unchanged
  here) and degrades to shuffle joins at scale instead of a guaranteed
  broadcast OOM. The lineitem fact table streams through the join
  pipeline exactly once, and the only shuffles are the final
  aggregation keys.
- No correlated per-row subqueries: every EXISTS/IN becomes a
  semi/anti join, every "equal to the max" becomes an aggregate
  joined back — shapes AQE can re-plan at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_scala_spark import tables
from flink_scala_spark.queries.catalog import register
from flink_scala_spark.materialize import shared_bounded


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables.load(spark, sf_dir, name)


_REV = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
)


def _rev_col() -> F.Column:
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )


@register(
    "order_priority_pipeline",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    "relational", "semi-join",
)
def q_order_priority_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS as a LEFT SEMI join (no row multiplication —
    an order with 7 late lineitems counts once, no distinct needed),
    then a tiny-key hash agg. The semi join probes lineitem only on
    (orderkey, shipdate) — column pruning reaches the scan."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > orders["o_orderdate"]),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "customer_order_distribution",
    """
    SELECT c_count, count(*) AS custdist FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    ) t GROUP BY c_count
    """,
    "relational", "outer-join",
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: customers-per-order-count histogram. LEFT OUTER join
    keeps zero-order customers (count(o_orderkey) ignores the NULLs),
    then two cascaded aggs — the second one's key space is tiny, so
    the heavy shuffle happens exactly once, on c_custkey."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "top_supplier_revenue",
    f"""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               CAST(sum({_REV}) AS DOUBLE) AS total_revenue
        FROM lineitem GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM rev r JOIN supplier s ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    "relational", "view-max",
)
def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: per-supplier revenue view, keep the max. The max is
    a 1-row aggregate broadcast back onto the view — NOT a global
    window (a ``max() over ()`` funnels every row through one
    partition; the join keeps all parallelism). DECIMAL sums make
    "equal to the max" exact across engines."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev_col()).cast("double").alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    top = rev.join(F.broadcast(mx), rev["total_revenue"] == mx["mx"]).select(
        "supplier_no", "total_revenue"
    )
    return (
        F.broadcast(top)
        .join(sup, sup["s_suppkey"] == top["supplier_no"])
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "min_cost_supplier_per_part",
    """
    WITH unit AS (
        SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey),
    best AS (SELECT l_partkey, min(unit_cost) AS min_cost FROM unit GROUP BY l_partkey)
    SELECT u.l_partkey AS p_partkey, p.p_name,
           min(u.l_suppkey) AS s_suppkey, b.min_cost AS unit_cost
    FROM unit u
    JOIN best b ON u.l_partkey = b.l_partkey AND u.unit_cost = b.min_cost
    JOIN part p ON p.p_partkey = u.l_partkey
    GROUP BY u.l_partkey, p.p_name, b.min_cost
    """,
    "relational", "correlated-min",
)
def q_min_cost_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (adapted: unit cost from lineitem, no partsupp table):
    cheapest supplier per part. The correlated "= (SELECT min ...)"
    decorrelates into agg + join-back; supplier ties break on min
    suppkey so the result is deterministic. ``min`` over IEEE doubles
    is order-independent, and both engines evaluate the same division
    — no decimal dance needed for min/max."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    # One agg replaces the old agg -> agg -> equality-join-back ->
    # re-agg funnel (4 data exchanges -> 1, guide §2.4): the part's
    # min unit cost and the min suppkey achieving it are exactly the
    # lexicographic struct min over the part's lineitems. A supplier
    # reaches the per-part min iff one of its lineitems does, so
    # skipping the per-(part, supplier) pre-min cannot change either
    # output (min over doubles is order- and grouping-independent).
    picked = li.groupBy("l_partkey").agg(
        F.min(
            F.struct(
                (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"),
                F.col("l_suppkey").alias("s_suppkey"),
            )
        ).alias("m")
    )
    return picked.join(
        part, picked["l_partkey"] == part["p_partkey"]
    ).select(
        "p_partkey",
        "p_name",
        F.col("m.s_suppkey").alias("s_suppkey"),
        F.col("m.unit_cost").alias("unit_cost"),
    )


@register(
    "revenue_cube",
    f"""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS order_year,
           count(*) AS cnt, CAST(sum({_REV}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY CUBE (n.n_name, year(o.o_orderdate))
    """,
    "relational", "cube",
)
def q_revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (nation, order year): all four grouping sets — the
    full matrix, both margins, and the grand total — in ONE shuffle
    (Catalyst expands the grouping sets map-side, partial aggs still
    combine). Complements order_dashboard_rollup's ROLLUP (X18)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", _rev_col().alias("rev"))
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("order_year"),
            "rev",
        )
    )
    return joined.cube("nation", "order_year").agg(
        F.count("*").alias("cnt"), F.sum("rev").cast("double").alias("revenue")
    )


@register(
    "promo_revenue_share",
    f"""
    SELECT CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%' THEN {_REV}
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS promo_revenue,
           CAST(sum({_REV}) AS DOUBLE) AS total_revenue,
           CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%' THEN {_REV}
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(sum({_REV}) AS DOUBLE) AS promo_share
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
    "relational", "conditional-agg",
)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: conditional aggregation — promo revenue share. Both
    sums stay DECIMAL through the aggregate; the share is one double
    division of two identically-rounded doubles, so the ratio is
    bit-equal across engines (a decimal division would expose
    engine-specific scale/rounding rules)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _rev_col()
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    agg = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .agg(
            F.sum(promo).cast("double").alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (F.col("promo_revenue") / F.col("total_revenue")).alias("promo_share"),
    )


@register(
    "returned_revenue_top_customers",
    f"""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           CAST(sum({_REV}) AS DOUBLE) AS returned_revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY returned_revenue DESC, c_custkey
    LIMIT 20
    """,
    "relational", "topk",
)
def q_returned_revenue_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: who returned the most revenue. The returnflag filter
    pushes to the lineitem scan; nation broadcasts and customer joins
    unhinted (AQE broadcasts it below threshold); the ordered LIMIT
    plans as TakeOrderedAndProject (per-partition top-20 + driver
    merge — no global sort). Tie-break on c_custkey keeps the top-20
    deterministic."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.sum(_rev_col()).cast("double").alias("returned_revenue"))
        .orderBy(F.desc("returned_revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "nation_trade_flow",
    f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(o.o_orderdate) AS INT) AS order_year,
           CAST(sum({_REV}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE sn.n_name <> cn.n_name
    GROUP BY sn.n_name, cn.n_name, year(o.o_orderdate)
    """,
    "relational", "multi-join",
)
def q_nation_trade_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: cross-nation trade volume. Six-table join where the
    fact table is joined once against orders (the only other large
    side); nation broadcasts, supplier/customer join unhinted (AQE
    broadcasts them while small) — one fact shuffle, one
    final-agg shuffle. The <> predicate prunes same-nation flow
    before aggregation."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", _rev_col().alias("rev")
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = _t(spark, sf_dir, "nation")
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(sn), sup["s_nationkey"] == sn["sn_key"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(cn), cust["c_nationkey"] == cn["cn_key"])
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("o_orderdate").alias("order_year"))
        .agg(F.sum("rev").cast("double").alias("revenue"))
    )


@register(
    "snapshot_diff",
    """
    WITH a AS (SELECT o_orderkey AS k,
                      md5(concat_ws('|', o_orderstatus, CAST(o_totalprice AS VARCHAR)))
                          AS payload
               FROM orders WHERE o_orderkey % 10 <> 0),
    b AS (SELECT o_orderkey AS k,
                 md5(concat_ws('|', o_orderstatus,
                     CAST(CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
                               ELSE o_totalprice END AS VARCHAR))) AS payload
          FROM orders WHERE o_orderkey % 7 <> 0)
    SELECT CASE WHEN a.k IS NULL THEN 'added'
                WHEN b.k IS NULL THEN 'removed'
                WHEN a.payload <> b.payload THEN 'changed'
                ELSE 'unchanged' END AS status,
           count(*) AS cnt
    FROM a FULL OUTER JOIN b ON a.k = b.k
    GROUP BY 1
    """,
    "relational", "cdc", "reconciliation",
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (the lakehouse CDC-between-snapshots
    op): FULL OUTER join of two table versions on the key, payloads
    compared as md5 digests so arbitrarily wide rows diff with one
    string compare — added / removed / changed / unchanged counts in
    one shuffle on the key. The deterministic 'snapshots' here derive
    from orders by modulus filters and a price perturbation."""
    orders = _t(spark, sf_dir, "orders")
    pay_a = F.md5(
        F.concat_ws("|", "o_orderstatus", F.col("o_totalprice").cast("string"))
    )
    price_b = F.when(
        F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") * 2
    ).otherwise(F.col("o_totalprice"))
    pay_b = F.md5(F.concat_ws("|", "o_orderstatus", price_b.cast("string")))
    a = orders.where(F.col("o_orderkey") % 10 != 0).select(
        F.col("o_orderkey").alias("ka"), pay_a.alias("pa")
    )
    b = orders.where(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("kb"), pay_b.alias("pb")
    )
    joined = a.join(b, a["ka"] == b["kb"], "full_outer")
    status = (
        F.when(F.col("ka").isNull(), "added")
        .when(F.col("kb").isNull(), "removed")
        .when(F.col("pa") != F.col("pb"), "changed")
        .otherwise("unchanged")
    )
    return joined.groupBy(status.alias("status")).agg(F.count("*").alias("cnt"))


@register(
    "dq_audit",
    """
    SELECT 'orphan_lineitems' AS chk,
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT) AS violations
    UNION ALL
    SELECT 'null_ship_dates',
           CAST((SELECT count(*) FROM lineitem WHERE l_shipdate IS NULL) AS BIGINT)
    UNION ALL
    SELECT 'nonpositive_quantity',
           CAST((SELECT count(*) FROM lineitem WHERE l_quantity <= 0) AS BIGINT)
    UNION ALL
    SELECT 'discount_out_of_range',
           CAST((SELECT count(*) FROM lineitem
                 WHERE l_discount < 0 OR l_discount > 1) AS BIGINT)
    UNION ALL
    SELECT 'orders_without_customer',
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
    """,
    "relational", "data-quality",
)
def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit: referential-integrity orphans as LEFT ANTI
    joins (never row-multiplying), plus null/range checks folded into
    single-pass conditional counts — the pre-ingest gate a production
    pipeline runs before promoting a snapshot."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    # Pure lazy plan — one action runs all checks; nothing collects to
    # the driver before the report rows exist as a DataFrame.
    orphans = (
        li.join(
            orders.select("o_orderkey"),
            li["l_orderkey"] == orders["o_orderkey"],
            "left_anti",
        )
        .agg(F.count("*").alias("violations"))
        .select(F.lit("orphan_lineitems").alias("chk"), "violations")
    )
    no_cust = (
        orders.join(
            cust.select("c_custkey"),
            orders["o_custkey"] == cust["c_custkey"],
            "left_anti",
        )
        .agg(F.count("*").alias("violations"))
        .select(F.lit("orders_without_customer").alias("chk"), "violations")
    )
    scans = li.agg(
        F.sum(F.col("l_shipdate").isNull().cast("long")).alias("null_ship_dates"),
        F.sum((F.col("l_quantity") <= 0).cast("long")).alias("nonpositive_quantity"),
        F.sum(
            ((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).cast("long")
        ).alias("discount_out_of_range"),
    )
    scan_rows = scans.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("chk"), F.col(c).alias("violations"))
                    for c in (
                        "null_ship_dates",
                        "nonpositive_quantity",
                        "discount_out_of_range",
                    )
                ]
            )
        ).alias("r")
    ).select("r.chk", "r.violations")
    return orphans.unionByName(scan_rows).unionByName(no_cust)


@register(
    "value_deciles",
    """
    SELECT event_type, decile, count(*) AS cnt,
           min(value) AS lo, max(value) AS hi
    FROM (SELECT event_type, value,
                 CAST(ntile(10) OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS INT) AS decile
          -- NULL pin (round-10 ADVICE): Spark windows order NULLS
          -- FIRST, DuckDB ntile NULLS LAST — today events.value has
          -- no NULLs, but the mirrored filter makes the decile
          -- assignment generator-proof
          FROM events WHERE value IS NOT NULL) t
    GROUP BY 1, 2
    """,
    "analytics", "quantile-binning",
)
def q_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile binning (feature engineering): per-type value deciles
    with ntile semantics, computed WITHOUT any per-type sort of the
    corpus (round 10 — the round-9 verdict named the old per-type
    ntile window as the textbook key-skew funnel).

    How: values are 2-decimal amounts, so the per-(type, value)
    histogram is DOMAIN-bounded (~tens of k rows per type at any SF,
    vs corpus-cardinality). The CDF over that histogram gives each
    value group its global rank span [below+1, cum]; ntile(10) bucket
    boundaries are pure arithmetic on n (base = n DIV 10, rem = n MOD
    10, end_d = d*base + least(d, rem)), so each histogram row's
    overlap with each decile is computable row-locally after a 10-way
    explode of the BOUNDED histogram. The oracle's (value, event_id)
    tiebreak only decides WHICH equal-valued rows land on a boundary —
    cnt/lo/hi per decile are tiebreak-invariant, so the rebuild is
    hash-exact against the unchanged ntile oracle.

    Scale: one hash-agg histogram shuffle + one bounded-histogram
    window + a 10x explode of the histogram. The corpus is scanned
    once and never sorted; no window orders corpus-scale rows within a
    low-cardinality key."""
    from flink_scala_spark import tables

    ev = (
        tables.load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())  # mirrored in the oracle
        .select("event_type", "value")
    )
    from pyspark.sql import Window as W

    h = ev.groupBy("event_type", "value").agg(F.count("*").alias("cnt"))
    wc = W.partitionBy("event_type").orderBy("value").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wn = W.partitionBy("event_type")
    hc = (
        h.withColumn("cum", F.sum("cnt").over(wc))
        .withColumn("n", F.sum("cnt").over(wn))
        .withColumn("below", F.col("cum") - F.col("cnt"))
    )
    dec = hc.select(
        "event_type",
        "value",
        "cum",
        "below",
        F.expr("n DIV 10").alias("base"),
        F.expr("n % 10").alias("rem"),
        F.explode(F.sequence(F.lit(1), F.lit(10))).alias("decile"),
    )
    end_d = F.col("decile") * F.col("base") + F.least(
        F.col("decile").cast("long"), F.col("rem")
    )
    start_d = (F.col("decile") - 1) * F.col("base") + F.least(
        (F.col("decile") - 1).cast("long"), F.col("rem")
    ) + F.lit(1)
    ov = F.least(end_d, F.col("cum")) - F.greatest(start_d, F.col("below") + 1) + 1
    return (
        dec.withColumn("ov", ov)
        .where(F.col("ov") > 0)
        .groupBy("event_type", "decile")
        .agg(
            F.sum("ov").cast("long").alias("cnt"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


@register(
    "copurchase_pairs",
    """
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pair AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                    count(*) AS support
             FROM items a JOIN items b
               ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             GROUP BY 1, 2),
    pc AS (SELECT l_partkey, count(*) AS n_orders FROM items GROUP BY 1)
    SELECT part_a, part_b, support,
           CAST(support AS DOUBLE) / CAST(ca.n_orders AS DOUBLE) AS confidence_a,
           CAST(support AS DOUBLE) / CAST(cb.n_orders AS DOUBLE) AS confidence_b
    FROM pair JOIN pc ca ON ca.l_partkey = pair.part_a
              JOIN pc cb ON cb.l_partkey = pair.part_b
    WHERE support >= 2
    """,
    "analytics", "market-basket",
)
def q_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-purchase pairs (the A-priori first pass):
    within-order part pairs from a basket-local self-join — basket
    size bounds the fan-out (~k^2 per order, k ~ lineitems/order), so
    the pair stream scales with the scan, not the part catalog.
    Support plus both directional confidences; ratios divide exact
    integer counts, so the oracle is exact."""
    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_b"))
    pair = (
        a.join(b, "k")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= 2)
    )
    pc = items.groupBy("l_partkey").agg(F.count("*").alias("n_orders"))
    ca = pc.select(F.col("l_partkey").alias("pa"), F.col("n_orders").alias("na"))
    cb = pc.select(F.col("l_partkey").alias("pb"), F.col("n_orders").alias("nb"))
    return (
        pair.join(ca, pair["part_a"] == ca["pa"])
        .join(cb, pair["part_b"] == cb["pb"])
        .select(
            "part_a",
            "part_b",
            "support",
            (F.col("support").cast("double") / F.col("na").cast("double")).alias(
                "confidence_a"
            ),
            (F.col("support").cast("double") / F.col("nb").cast("double")).alias(
                "confidence_b"
            ),
        )
    )


@register(
    "value_outliers",
    """
    WITH q AS (SELECT event_type, event_id, value,
                      CAST(floor(value * 1000000.0) AS BIGINT) AS qv
               FROM events),
    m AS (SELECT event_type,
                 count(*) AS n,
                 CAST(sum(qv) AS DOUBLE) AS sq,
                 CAST(sum(CAST(qv AS HUGEINT) * qv) AS DOUBLE) AS sqq
          FROM q GROUP BY 1),
    s AS (SELECT event_type, n,
                 sq / (1000000.0 * n) AS mean,
                 sqrt(sqq / (1e12 * n) - (sq / (1000000.0 * n)) * (sq / (1000000.0 * n)))
                     AS std
          FROM m)
    SELECT q.event_type, q.event_id, q.value,
           (CAST(q.qv AS DOUBLE) / 1000000.0 - s.mean) / s.std AS zscore
    FROM q JOIN s ON q.event_type = s.event_type
    WHERE abs((CAST(q.qv AS DOUBLE) / 1000000.0 - s.mean) / s.std) > 2.5
    """,
    "analytics", "anomaly",
)
def q_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly detection with EXACT cross-engine moments: the
    per-group sum and sum-of-squares accumulate fixed-point BIGINTs
    (associative, partition-invariant — double sums are not), and
    mean/std derive from those exact integers by identical double
    expressions. One stats pass broadcast back onto one scan pass."""
    ev = _t(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        "event_id",
        "value",
        F.floor(F.col("value") * 1_000_000.0).cast("long").alias("qv"),
    )
    m = q.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("qv").cast("double").alias("sq"),
        F.sum(F.col("qv").cast("decimal(38,0)") * F.col("qv")).cast("double").alias("sqq"),
    )
    mean = F.col("sq") / (F.lit(1_000_000.0) * F.col("n"))
    std = F.sqrt(
        F.col("sqq") / (F.lit(1e12) * F.col("n")) - mean * mean
    )
    s = m.select("event_type", mean.alias("mean"), std.alias("std"))
    z = (F.col("qv").cast("double") / 1_000_000.0 - F.col("mean")) / F.col("std")
    return (
        q.join(F.broadcast(s), "event_type")
        .where(F.abs(z) > 2.5)
        .select("event_type", "event_id", "value", z.alias("zscore"))
    )


@register(
    "local_supplier_volume",
    f"""
    SELECT n.n_name AS nation,
           CAST(sum({_REV}) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1997-01-01'
    GROUP BY 1
    """,
    "relational", "q5",
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: local-supplier revenue — the 6-table join whose
    distinguishing constraint is a NON-key equi-condition between two
    dimension sides (customer's nation == supplier's nation). The fact
    table streams once; nation/region broadcast, customer/supplier
    join unhinted (AQE-sized); the
    date filter is pushed to the orders scan and DECIMAL sums keep the
    oracle exact."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    ).select("o_orderkey", "o_custkey")
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    joined = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(
            s,
            (l["l_suppkey"] == s["s_suppkey"])
            & (s["s_nationkey"] == c["c_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.sum(_rev_col()).cast("double").alias("revenue")
    )


@register(
    "bracketed_revenue",
    f"""
    SELECT CAST(sum({_REV}) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
    "relational", "q19",
)
def q_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: discounted revenue under a DISJUNCTION of
    (brand, size, quantity) brackets. The part-side conjuncts of each
    bracket are pushable to the dimension scan and the residual OR
    evaluates post-join inside codegen — the canonical test that
    complex boolean predicates don't break pushdown or force a
    cartesian. part joins unhinted (AQE broadcasts it while small);
    one pass over lineitem."""
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = l.join(p, l["l_partkey"] == p["p_partkey"])
    q = F.col("l_quantity")
    bracket = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & (q >= 20) & (q <= 30))
    )
    return j.where(bracket).agg(F.sum(_rev_col()).cast("double").alias("revenue"))


@register(
    "forecast_revenue_change",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue_delta,
           count(*) AS qualifying_lineitems
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    "relational", "q6",
)
def q_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: the pure scan-predicate aggregate — every filter
    (date range, discount band, quantity cap) must reach the parquet
    scan as a pushed data filter, and the whole query is one
    map-side-combinable agg with no shuffle key at all (the final
    combine is a single tiny reduce)."""
    l = _t(spark, sf_dir, "lineitem")
    f = l.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    delta = F.col("l_extendedprice").cast("decimal(12,2)") * F.col(
        "l_discount"
    ).cast("decimal(4,2)")
    return f.agg(
        F.sum(delta).cast("double").alias("revenue_delta"),
        F.count("*").alias("qualifying_lineitems"),
    )


@register(
    "small_quantity_part_revenue",
    """
    WITH bp AS (SELECT p_partkey FROM part WHERE p_brand IN ('Brand#1', 'Brand#2')),
    bl AS (
        SELECT l.l_partkey, CAST(l.l_quantity AS DECIMAL(12,2)) AS qty,
               CAST(l.l_extendedprice AS DECIMAL(12,2)) AS price
        FROM lineitem l JOIN bp ON bp.p_partkey = l.l_partkey
    ),
    pq AS (
        SELECT l_partkey, count(*) AS n_lines, sum(qty) AS sum_qty
        FROM bl GROUP BY 1
    )
    SELECT CAST(sum(bl.price) AS DOUBLE) AS small_lot_revenue,
           count(*) AS small_lot_lines
    FROM bl JOIN pq ON pq.l_partkey = bl.l_partkey
    WHERE bl.qty * 2 * pq.n_lines < pq.sum_qty
    """,
    "relational", "q17",
)
def q_small_quantity_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue locked in small-lot orders — lineitems whose
    quantity is below half their part's average. The correlated AVG
    subquery decorrelates into per-part WINDOW aggregates (count/sum
    over an unordered partkey partition): one scan of the pruned fact
    and ONE shuffle, versus the textbook agg-plus-join-back which
    scans twice and shuffles for the join anyway (the per-part
    aggregate has a row per part — not broadcastable at 100 TB part
    cardinality). The avg threshold is CROSS-MULTIPLIED
    (qty * 2 * n < sum) so the whole comparison stays in DECIMAL — no
    division, no float, exact oracle. The brand filter prunes through
    the part dim BEFORE the window (restricting parts cannot
    change any surviving part's own average)."""
    p = _t(spark, sf_dir, "part").where(
        F.col("p_brand").isin("Brand#1", "Brand#2")
    ).select("p_partkey")
    bl = (
        _t(spark, sf_dir, "lineitem")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_partkey",
            F.col("l_quantity").cast("decimal(12,2)").alias("qty"),
            F.col("l_extendedprice").cast("decimal(12,2)").alias("price"),
        )
    )
    w = Window.partitionBy("l_partkey")
    stats = bl.select(
        "qty",
        "price",
        F.count("*").over(w).alias("n_lines"),
        F.sum("qty").over(w).alias("sum_qty"),
    )
    small = stats.where(F.col("qty") * 2 * F.col("n_lines") < F.col("sum_qty"))
    return small.agg(
        F.sum("price").cast("double").alias("small_lot_revenue"),
        F.count("*").alias("small_lot_lines"),
    )


@register(
    "idle_high_balance_customers",
    """
    WITH t AS (
        SELECT count(*) AS n_pos, sum(CAST(c_acctbal AS DECIMAL(12,2))) AS s_pos
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment AS segment,
           count(*) AS n_customers,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
    FROM customer c, t
    WHERE CAST(c.c_acctbal AS DECIMAL(12,2)) * t.n_pos > t.s_pos
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= DATE '2001-01-01')
    GROUP BY 1
    """,
    "relational", "q22",
)
def q_idle_high_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: high-balance customers gone quiet (no order since
    the cutoff) — sales leads. Two decorrelations in one query: the
    global scalar AVG subquery becomes a 1-row aggregate cross-joined
    (broadcast) onto the scan with a cross-multiplied DECIMAL
    threshold (bal * n > sum, division-free), and NOT EXISTS becomes a
    LEFT ANTI join whose probe side is date-pruned at the orders scan
    before probing only o_custkey. Nothing here shuffles the customer
    table except the final tiny segment rollup."""
    c = _t(spark, sf_dir, "customer")
    bal = F.col("c_acctbal").cast("decimal(12,2)")
    t = c.where(F.col("c_acctbal") > 0).agg(
        F.count("*").alias("n_pos"), F.sum(bal).alias("s_pos")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2001-01-01").cast("date"))
        .select("o_custkey")
    )
    rich = c.join(F.broadcast(t)).where(bal * F.col("n_pos") > F.col("s_pos"))
    idle = rich.join(o, rich["c_custkey"] == o["o_custkey"], "left_anti")
    return idle.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n_customers"),
        F.sum(bal).cast("double").alias("total_balance"),
    )


@register(
    "sole_late_supplier_waits",
    """
    WITH per AS (
        SELECT l.l_orderkey, l.l_suppkey,
               max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                        THEN 1 ELSE 0 END) AS is_late
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY 1, 2
    ),
    culprit AS (
        SELECT l_orderkey,
               count(*) AS n_supp,
               sum(is_late) AS n_late,
               max(CASE WHEN is_late = 1 THEN l_suppkey END) AS late_supp
        FROM per GROUP BY 1
    )
    SELECT s.s_name AS supplier, count(*) AS numwait
    FROM culprit c JOIN supplier s ON s.s_suppkey = c.late_supp
    WHERE c.n_supp >= 2 AND c.n_late = 1
    GROUP BY 1
    """,
    "relational", "q21",
)
def q_sole_late_supplier_waits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who single-handedly held up multi-supplier
    orders. The textbook form is a semi-join (another supplier exists)
    chained with an anti-join (no OTHER late supplier) back onto the
    same fact table — three passes. Here both collapse into ONE
    per-order aggregate (n_supp >= 2 AND n_late = 1 AND the sole late
    supplier), after a per-(order, supplier) pre-agg that is itself
    map-side combinable: two shuffles total on the pruned fact, no
    self-joins at all. max(CASE) picks the late supplier exactly
    because n_late = 1 filters to single-culprit orders."""
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
        F.lit(1),
    ).otherwise(F.lit(0))
    per = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("is_late"))
    )
    culprit = per.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("is_late").alias("n_late"),
        F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias("late_supp"),
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    hit = culprit.where((F.col("n_supp") >= 2) & (F.col("n_late") == 1)).join(
        s, F.col("late_supp") == F.col("s_suppkey")
    )
    return hit.groupBy(F.col("s_name").alias("supplier")).agg(
        F.count("*").alias("numwait")
    )


@register(
    "ship_latency_priority_counts",
    """
    SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 30
                THEN 'fast' ELSE 'slow' END AS latency_class,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_lines,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_priority_lines
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
    """,
    "relational", "q12",
)
def q_ship_latency_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: did slow shipping hit urgent orders? Lineitems
    classified by ship latency, priorities counted with conditional
    aggregation (sum(CASE ...)) — the pivot-free way to produce
    side-by-side counts in ONE pass over the join, shuffled only on
    the 2-value class key. Latency compares DATE-granularity diffs so
    Spark's datediff and DuckDB's date_diff('day') agree exactly."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    j = l.join(o, l["l_orderkey"] == o["o_orderkey"])
    cls = F.when(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) <= 30, "fast"
    ).otherwise("slow")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy(cls.alias("latency_class")).agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_lines"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_priority_lines"),
    )


@register(
    "nation_market_share",
    f"""
    WITH base AS (
        SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS yr,
               {_REV} AS rev,
               sn.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = cn.n_regionkey AND r.r_name = 'ASIA'
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
    )
    SELECT yr,
           CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN rev
                         ELSE CAST(0.00 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(sum(rev) AS DOUBLE) AS mkt_share,
           CAST(sum(rev) AS DOUBLE) AS total_revenue
    FROM base GROUP BY 1
    """,
    "relational", "q8",
)
def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one nation's share of a region x part-type market per
    year — the conditional-share pattern (numerator = CASE-gated sum,
    denominator = total) computed in ONE pass; both sums stay DECIMAL
    (order-independent) and the single double division happens on the
    exact aggregates, so the ratio is bit-identical across engines.
    Seven-table join: the fact streams once; nation/region broadcast,
    part/customer/supplier join unhinted (AQE-sized); the part-type
    and region filters prune their dim scans before the join."""
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    j = (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(cn), c["c_nationkey"] == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r["r_regionkey"])
        .join(s, l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), s["s_nationkey"] == F.col("sn_key"))
    )
    rev = _rev_col()
    zero = F.lit("0.00").cast("decimal(12,2)")
    agg = j.groupBy(F.year("o_orderdate").alias("yr")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_7", rev).otherwise(zero))
        .cast("double")
        .alias("num"),
        F.sum(rev).cast("double").alias("total_revenue"),
    )
    return agg.select(
        "yr",
        (F.col("num") / F.col("total_revenue")).alias("mkt_share"),
        "total_revenue",
    )


@register(
    "part_supplier_diversity",
    """
    SELECT p.p_brand, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type IN ('SMALL', 'MEDIUM')
    WHERE l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000
    )
    GROUP BY 1, 2
    """,
    "relational", "q16",
)
def q_part_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: how many distinct (credit-worthy) suppliers serve
    each (brand, size) segment — supplier-base diversity. NOT IN
    becomes a LEFT ANTI join against the low-balance supplier set
    (AQE-sized; no NULL-semantics trap since keys are non-null), the
    part filter prunes through the dim scan, and
    count(DISTINCT) runs as Catalyst's two-stage expand/agg — both
    stages map-side combinable."""
    low = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 1000)
        .select("s_suppkey")
    )
    p = _t(spark, sf_dir, "part").where(
        F.col("p_type").isin("SMALL", "MEDIUM")
    ).select("p_partkey", "p_brand", "p_size")
    l = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    j = l.join(p, l["l_partkey"] == p["p_partkey"]).join(
        low, l["l_suppkey"] == low["s_suppkey"], "left_anti"
    )
    return j.groupBy("p_brand", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


@register(
    "range_join_binned",
    """
    WITH err AS (SELECT event_id, ts FROM events WHERE event_type = 'error')
    SELECT e.event_id AS left_id,
           CAST(count(a.ts) AS BIGINT) AS n_in_window
    FROM err e LEFT JOIN events a
      ON a.ts >= e.ts - INTERVAL 6 HOUR AND a.ts <= e.ts
    GROUP BY 1
    """,
    "join", "range", "scale",
)
def q_range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYLESS range correlation: for each error event, how many
    events of ANY user landed in the preceding 6 hours (global
    activity at failure time). Without an equi-key Catalyst would plan
    BroadcastNestedLoop — O(|L|x|R|), dead at 100 TB — so the operator
    bins both sides by the window width and joins on the bin: see
    operators/joins.py:binned_range_join_count (plan pinned: no BNLJ,
    no cartesian). Note the self-match: an error event is inside its
    own window, exactly as the oracle's inclusive bounds count it."""
    from flink_scala_spark import tables
    from flink_scala_spark.operators.joins import binned_range_join_count

    ev = tables.load(spark, sf_dir, "events")
    err = ev.where(F.col("event_type") == "error")
    return binned_range_join_count(
        err, ev, ts_col="ts", left_id="event_id", lookback_seconds=21_600
    )


@register(
    "bloom_semi_join",
    f"""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum({_REV}) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                         WHERE o_orderpriority = '1-URGENT')
    GROUP BY 1
    """,
    "join", "semi", "scale", "bloom",
)
def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter semi join (X169): revenue of lineitems
    whose order is URGENT. The urgent-order keys build an 8 KiB bloom
    bitmap (distributed bit_or fold — only the fixed-size word table
    reaches the driver), which broadcasts into the fact scan and
    prunes non-matching rows BEFORE the join shuffle; the trailing
    exact leftsemi join removes the bloom's false positives, so the
    result is identical to the plain IN-subquery oracle — only the
    shuffled volume changes. This is the manual form of the runtime
    filters Spark injects for DPP-able keys, applicable to ANY join
    key; at 100 TB it is the difference between shuffling the full
    fact table and shuffling ~the matching fraction.
    See operators/joins.py:bloom_semi_join."""
    from flink_scala_spark.operators.joins import bloom_semi_join

    li = _t(spark, sf_dir, "lineitem")
    urgent = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    hits = bloom_semi_join(li, urgent, "l_orderkey", "o_orderkey")
    return hits.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"),
        F.sum(_rev_col()).cast("double").alias("revenue"),
    )


@register(
    "pareto_frontier",
    """
    WITH g AS (SELECT p_retailprice AS price, max(p_size) AS gmax
               FROM part GROUP BY 1),
    pm AS (SELECT price, gmax,
                  max(gmax) OVER (ORDER BY price
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS prevmax
           FROM g)
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p JOIN pm ON pm.price = p.p_retailprice
    WHERE p.p_size = pm.gmax
      AND (pm.prevmax IS NULL OR p.p_size > pm.prevmax)
    """,
    "skyline", "analytics",
)
def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (X170): the Pareto frontier of parts minimizing
    p_retailprice and maximizing p_size — "the biggest part for the
    money"; a part survives when nothing is both cheaper-or-equal and
    bigger-or-equal with one strict. Runs as the distributive two-pass
    local-sweep (skyline(S) = skyline(∪ skyline(P_i)) — scan-parallel
    local frontiers, then one sweep over their tiny union), so the
    corpus is never globally sorted; the oracle is the window form
    over per-price group maxima. Ties on BOTH dims keep both rows
    (domination needs a strict inequality).
    See operators/skyline.py."""
    from flink_scala_spark.operators.skyline import pareto_frontier_2d

    return pareto_frontier_2d(
        _t(spark, sf_dir, "part"), "p_partkey", "p_retailprice", "p_size"
    )


@register(
    "revenue_grouping_sets",
    f"""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS order_year,
           count(*) AS cnt, CAST(sum({_REV}) AS DOUBLE) AS revenue,
           CAST(grouping(n.n_name) * 2 + grouping(year(o.o_orderdate)) AS BIGINT)
               AS gid
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY GROUPING SETS ((n.n_name), (year(o.o_orderdate)))
    """,
    "relational", "grouping-sets",
)
def q_revenue_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (X174): BOTH one-dimension margins —
    revenue by nation and revenue by order year — and NOTHING else, a
    set combination neither ROLLUP (X18) nor CUBE (`revenue_cube`) can
    express without computing unwanted sets. One shuffle: Catalyst
    expands the sets map-side and partial aggs still combine; the
    grouping_id column disambiguates which margin a row belongs to
    (NULL nation rows are the year margin, not a NULL data value)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", _rev_col().alias("rev"))
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("order_year"),
            "rev",
        )
    )
    return joined.groupingSets(
        [["nation"], ["order_year"]], "nation", "order_year"
    ).agg(
        F.count("*").alias("cnt"),
        F.sum("rev").cast("double").alias("revenue"),
        (F.grouping("nation") * 2 + F.grouping("order_year"))
        .cast("long")
        .alias("gid"),
    )


# ---------------------------------------------------------------------------
# X190: CUSUM changepoint scan over daily revenue
# ---------------------------------------------------------------------------

@register(
    "revenue_cusum_changepoint",
    """
    WITH daily AS (
        SELECT CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS order_day,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS day_cents
        FROM orders GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(day_cents) AS BIGINT) AS total,
                   CAST(count(*) AS BIGINT) AS n FROM daily),
    idx AS (
        SELECT order_day, day_cents,
               row_number() OVER (ORDER BY order_day) AS t,
               sum(day_cents) OVER (ORDER BY order_day
                   ROWS UNBOUNDED PRECEDING) AS cum_cents
        FROM daily
    ),
    cs AS (
        SELECT order_day, day_cents,
               CAST(cum_cents AS BIGINT) AS cum_cents,
               CAST(cum_cents - t * (tot.total // tot.n) AS BIGINT)
                 AS cusum_cents
        FROM idx CROSS JOIN tot
    )
    SELECT order_day, day_cents, cum_cents, cusum_cents,
           CAST(row_number() OVER (ORDER BY abs(cusum_cents) DESC, order_day)
                AS INT) AS dev_rank
    FROM cs
    """,
    "analytics", "changepoint", "timeseries",
)
def q_revenue_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan (X190): daily revenue in exact cents
    (per-order floor BEFORE summing, so the aggregate is BIGINT-exact
    and partitioning-proof), then the cumulative deviation from the
    floored-cents daily mean — s_t = cum_t - t*(total DIV n) — ranked
    by |s_t|: dev_rank 1 is the maximum-likelihood single changepoint
    of a mean-shift model. The floored mean keeps every term in BIGINT
    (the n*cum - t*total scaling overflows int64 near 100 TB totals;
    total DIV n never does).

    Scale: the corpus-sized work is ONE map-side-combinable daily agg;
    every window runs over the day-cardinality table (bounded by the
    calendar — ~2.4k rows at ANY scale factor), which is the same
    metadata-cardinality justification as corpus_token_budget's global
    window."""
    from flink_scala_spark.pipeline.behavior import cusum_over_daily

    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_format("o_orderdate", "yyyyMMdd").cast("int").alias("order_day")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("day_cents")
    )
    return cusum_over_daily(daily, "order_day", "day_cents")


# ---------------------------------------------------------------------------
# X192: incremental maintenance of a JOIN view (delta propagation)
# ---------------------------------------------------------------------------

@register(
    "incremental_join_maintenance",
    """
    WITH a_old AS (SELECT * FROM orders   WHERE o_orderkey % 10 <> 0),
    d_a   AS (SELECT * FROM orders   WHERE o_orderkey % 10 =  0),
    b_old AS (SELECT * FROM customer WHERE c_custkey  % 100 <> 0),
    d_b   AS (SELECT * FROM customer WHERE c_custkey  % 100 =  0),
    v_old AS (
        SELECT c_nationkey, count(*) AS cnt,
               sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS cents
        FROM a_old JOIN b_old ON o_custkey = c_custkey GROUP BY 1
    ),
    v_new AS (
        SELECT c_nationkey, count(*) AS cnt,
               sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1
    )
    SELECT n.c_nationkey,
           CAST(n.cnt - COALESCE(o.cnt, 0) AS BIGINT) AS delta_orders,
           CAST(n.cents - COALESCE(o.cents, 0) AS BIGINT) AS delta_cents
    FROM v_new n LEFT JOIN v_old o ON o.c_nationkey = n.c_nationkey
    WHERE n.cnt - COALESCE(o.cnt, 0) > 0
    """,
    "maintenance", "ivm", "join",
)
def q_incremental_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a JOIN view (X192) — the
    delta-propagation identity every materialized enriched-fact table
    runs on: with inserts ΔA (new orders) and ΔB (new customers), the
    view delta is EXACTLY ΔA⋈B_old ∪ A_new⋈ΔB (the two legs are
    disjoint because B_old ∩ ΔB = ∅), so the view is maintained
    without ever recomputing A⋈B. The Spark side computes ONLY the
    delta legs; the oracle computes the SEMANTIC SPEC — full new view
    minus full old view — so the gate proves the identity itself, not
    a shared formula.

    Scale: leg 1 joins the small insert batch against the dim (cost ∝
    |ΔA|); leg 2 scans the fact once filtered to the changed-dim keys
    (a semi-joinable predicate — at 100 TB the ΔB key set rides a
    runtime filter, cf. bloom_semi_join). Complements
    incremental_agg_maintenance (X-agg twin) on the JOIN axis; X172's
    complement: the companion that keeps enriched facts fresh at delta
    cost. Splits partition on o_orderkey/c_custkey, so replays/retries
    land rows in the same side deterministically."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    a_old = orders.where(F.col("o_orderkey") % 10 != 0)
    d_a = orders.where(F.col("o_orderkey") % 10 == 0)
    b_old = cust.where(F.col("c_custkey") % 100 != 0)
    d_b = cust.where(F.col("c_custkey") % 100 == 0)
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    leg1 = d_a.join(b_old, d_a["o_custkey"] == b_old["c_custkey"]).select(
        "c_nationkey", cents.alias("cents")
    )
    leg2 = orders.join(d_b, orders["o_custkey"] == d_b["c_custkey"]).select(
        "c_nationkey", cents.alias("cents")
    )
    return (
        leg1.unionByName(leg2)
        .groupBy("c_nationkey")
        .agg(
            F.count("*").cast("long").alias("delta_orders"),
            F.sum("cents").alias("delta_cents"),
        )
    )


# ---------------------------------------------------------------------------
# X197: join-cardinality planner (pre-join blowup detector)
# ---------------------------------------------------------------------------

@register(
    "join_cardinality_planner",
    """
    WITH a AS (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS na
               FROM orders GROUP BY 1),
    b AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS nb
          FROM lineitem GROUP BY 1),
    f AS (SELECT a.na, b.nb FROM a FULL JOIN b ON b.k = a.k)
    SELECT CAST(count(CASE WHEN na IS NOT NULL AND nb IS NOT NULL
                           THEN 1 END) AS BIGINT) AS matched_keys,
           CAST(coalesce(sum(na * nb), 0) AS BIGINT) AS exact_join_rows,
           CAST(max(na * nb) AS BIGINT) AS max_key_product,
           CAST(max(nb) AS BIGINT) AS max_fanout_b,
           CAST(count(na) AS BIGINT) AS keys_a,
           CAST(count(nb) AS BIGINT) AS keys_b
    FROM f
    """,
    "ops", "planning", "join",
)
def q_join_cardinality_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality planner (X197): the EXACT output size of
    orders ⋈ lineitem computed WITHOUT running the join — per-key
    count tables joined on the key, then sum/max of the count
    products. This is the pre-flight that catches a fan-out blowup
    (max_key_product) and sizes shuffle partitions for the real join;
    the skew/LSH planners' sibling on the join axis.

    Scale: two map-side-combinable aggs collapse both fact tables to
    their key cardinality, ONE full-outer join of the two count
    tables, ONE aggregate over it — each fact table is scanned exactly
    once (a separate keys_a/keys_b branch would re-scan both; the
    conditional counts recover every statistic from the single joined
    frame). max_fanout_b is the b-side histogram max over ALL keys,
    matched or not."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    a = orders.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count("*").alias("na")
    )
    b = li.groupBy(F.col("l_orderkey").alias("k")).agg(F.count("*").alias("nb"))
    f = a.join(b, "k", "full")
    prod = F.col("na") * F.col("nb")
    return f.agg(
        F.count(
            F.when(F.col("na").isNotNull() & F.col("nb").isNotNull(), 1)
        ).cast("long").alias("matched_keys"),
        F.coalesce(F.sum(prod), F.lit(0)).cast("long").alias("exact_join_rows"),
        F.max(prod).cast("long").alias("max_key_product"),
        F.max("nb").cast("long").alias("max_fanout_b"),
        F.count("na").cast("long").alias("keys_a"),
        F.count("nb").cast("long").alias("keys_b"),
    )


# ---------------------------------------------------------------------------
# X217: KMV join-size estimate (the sketch-cost planner)
# ---------------------------------------------------------------------------

from flink_scala_spark.functions.portable import duck_h60  # noqa: E402
from flink_scala_spark.pipeline import sampling as _sampling  # noqa: E402

_PLANNER_A_SQL = (
    "SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS na "
    "FROM orders GROUP BY 1"
)
_PLANNER_B_SQL = (
    "SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS nb "
    "FROM lineitem GROUP BY 1"
)


@register(
    "join_size_kmv_certified",
    _sampling.kmv_join_size_oracle_sql(_PLANNER_A_SQL, _PLANNER_B_SQL, duck_h60),
    "sketch", "kmv", "planning", "join",
)
def q_join_size_kmv_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimate at sketch cost (X217): X197's planner
    question — how many rows does orders ⋈ lineitem produce? — from
    two fixed-size KMV sketches whose retained key-hashes carry their
    key's count, merged into a bottom-k sample of the key union and
    Horvitz-Thompson-scaled by the KMV distinct-union estimate. The
    exact planner (X197's full-outer count-table join) rides along as
    the audit certificate — the branch a 100 TB run drops when even
    the key-grain count tables are too big to join. Deterministic h60
    makes the ESTIMATE hash-exact against the oracle. See
    pipeline/sampling.py:kmv_join_size for the estimator proof and
    scale shape."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    a = orders.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count("*").alias("na")
    )
    b = li.groupBy(F.col("l_orderkey").alias("k")).agg(F.count("*").alias("nb"))
    return _sampling.kmv_join_size(a, b)


# ---------------------------------------------------------------------------
# X200: customer-LTV cohort curves
# ---------------------------------------------------------------------------

@register(
    "customer_ltv_cohorts",
    """
    WITH o AS (
        SELECT o_custkey,
               CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
                 AS mon,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    first AS (SELECT o_custkey, min(mon) AS cohort_mon FROM o GROUP BY 1),
    j AS (SELECT o.o_custkey, f.cohort_mon,
                 o.mon - f.cohort_mon AS month_offset, o.cents
          FROM o JOIN first f USING (o_custkey)),
    cell AS (
        SELECT cohort_mon, month_offset,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_active,
               CAST(sum(cents) AS BIGINT) AS cents
        FROM j GROUP BY 1, 2
    )
    SELECT CAST(cohort_mon AS BIGINT) AS cohort_mon,
           CAST(month_offset AS BIGINT) AS month_offset,
           n_active, cents,
           CAST(sum(cents) OVER (PARTITION BY cohort_mon ORDER BY month_offset
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_cents
    FROM cell
    """,
    "analytics", "cohort", "ltv",
)
def q_customer_ltv_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-LTV cohort curves (X200): customers grouped by
    first-order month; per (cohort, month offset) the active-customer
    count, revenue cents, and the cohort's CUMULATIVE revenue — the
    curve a lifetime-value model is fit to. Months as a linear index
    (y*12+m-1) so offsets subtract exactly; revenue floored to cents
    per order BEFORE summing (BIGINT-exact, partitioning-proof).

    Scale: one agg to the customer key space for cohort assignment,
    one fact-side join against it (AQE decides the strategy), one agg
    to the (cohort x offset) grid; the running window covers only that
    calendar-bounded grid. The cohort_retention twin on the ORDERS
    axis, extended with money."""
    orders = _t(spark, sf_dir, "orders")
    mon = (
        F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
    ).cast("long")
    o = orders.select(
        "o_custkey",
        mon.alias("mon"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    # Round 12 (guide §2.4 + §3.3): the cohort month is a same-key
    # WINDOW min over the order rows instead of the old customer-grain
    # agg + join-back, which referenced `o` twice and lazily re-scanned
    # orders per reference (the before plan scanned orders 2x). One
    # scan, one o_custkey exchange; min over the customer partition ==
    # the old groupBy min joined back, exactly.
    wc = Window.partitionBy("o_custkey")
    j = o.withColumn("cohort_mon", F.min("mon").over(wc)).select(
        "o_custkey",
        "cohort_mon",
        (F.col("mon") - F.col("cohort_mon")).alias("month_offset"),
        "cents",
    )
    cell = j.groupBy("cohort_mon", "month_offset").agg(
        F.countDistinct("o_custkey").alias("n_active"),
        F.sum("cents").alias("cents"),
    )
    w = (
        Window.partitionBy("cohort_mon")
        .orderBy("month_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cell.select(
        F.col("cohort_mon").cast("long").alias("cohort_mon"),
        F.col("month_offset").cast("long").alias("month_offset"),
        F.col("n_active").cast("long").alias("n_active"),
        F.col("cents").cast("long").alias("cents"),
        F.sum("cents").over(w).cast("long").alias("cum_cents"),
    )


# ---------------------------------------------------------------------------
# X203: RFM customer segmentation (exact quartile thresholds)
# ---------------------------------------------------------------------------

def _rfm_thresholds(metric: str) -> str:
    """Quartile thresholds for one RFM metric via integer histogram
    selection: pXX = smallest value whose cumulative customer count
    reaches ceil(q*n/4)."""
    return f"""
    h_{metric} AS (SELECT {metric} AS v, CAST(count(*) AS BIGINT) AS cnt
                   FROM rfm GROUP BY 1),
    c_{metric} AS (SELECT v, sum(cnt) OVER (ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cum
                   FROM h_{metric}),
    t_{metric} AS (SELECT
        (SELECT min(v) FROM c_{metric}, nc WHERE cum >= (nc.n + 3) // 4)
          AS p25,
        (SELECT min(v) FROM c_{metric}, nc WHERE cum >= (2 * nc.n + 3) // 4)
          AS p50,
        (SELECT min(v) FROM c_{metric}, nc WHERE cum >= (3 * nc.n + 3) // 4)
          AS p75)"""


@register(
    "customer_rfm_segments",
    f"""
    WITH maxd AS (
        SELECT CAST(max(epoch(o_orderdate)) // 86400 AS BIGINT) AS d
        FROM orders
    ),
    rfm AS (
        SELECT o_custkey,
               maxd.d - CAST(max(epoch(o_orderdate)) // 86400 AS BIGINT)
                 AS recency,
               CAST(count(*) AS BIGINT) AS frequency,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS monetary
        FROM orders, maxd GROUP BY 1, maxd.d
    ),
    nc AS (SELECT CAST(count(*) AS BIGINT) AS n FROM rfm),
    {_rfm_thresholds('recency')},
    {_rfm_thresholds('frequency')},
    {_rfm_thresholds('monetary')},
    seg AS (
        SELECT CAST(1 + CAST(recency > t_recency.p25 AS INT)
                      + CAST(recency > t_recency.p50 AS INT)
                      + CAST(recency > t_recency.p75 AS INT) AS INT) AS r_q,
               CAST(1 + CAST(frequency > t_frequency.p25 AS INT)
                      + CAST(frequency > t_frequency.p50 AS INT)
                      + CAST(frequency > t_frequency.p75 AS INT) AS INT) AS f_q,
               CAST(1 + CAST(monetary > t_monetary.p25 AS INT)
                      + CAST(monetary > t_monetary.p50 AS INT)
                      + CAST(monetary > t_monetary.p75 AS INT) AS INT) AS m_q,
               monetary
        FROM rfm CROSS JOIN t_recency CROSS JOIN t_frequency
                 CROSS JOIN t_monetary
    )
    SELECT r_q, f_q, m_q,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(monetary) AS BIGINT) AS sum_cents
    FROM seg GROUP BY 1, 2, 3
    """,
    "analytics", "segmentation", "rfm",
)
def q_customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (X203): per customer — recency (days since
    last order, against the corpus max day), frequency (orders), and
    monetary (exact cents) — each bucketed into quartiles by EXACT
    integer histogram selection (the winsorized-stats kernel shape:
    pXX = smallest value whose cumulative count reaches ceil(q*n/4),
    so the thresholds are data values, not interpolations), then the
    customer count and revenue of each (R,F,M) cell — the classic
    marketing segmentation grid.

    Scale: one orders agg to the customer key space, three
    domain-bounded histograms over it, ONE stacked 1-row threshold
    frame broadcast back, one agg to the <= 64-cell grid. No
    percentile window over the customer table."""
    orders = _t(spark, sf_dir, "orders")
    from flink_scala_spark.functions.portable import epoch_seconds

    oday = F.floor(epoch_seconds("o_orderdate") / 86400).cast("long")
    per = orders.select(
        "o_custkey",
        oday.alias("oday"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    # Round 12 (guide §3.3/§5 + §2.4): the per-customer rollup is
    # materialized once — it feeds the threshold CDF AND the final
    # segmentation pass, which lazily re-derived the orders scan+agg
    # each (the before plan scanned orders 6x). The corpus max day is
    # the max of the per-customer last days, so it now derives from
    # the rollup instead of a second orders scan (same value exactly).
    rfm0 = (
        per.groupBy("o_custkey")
        .agg(
            F.max("oday").alias("last_day"),
            F.count("*").alias("frequency"),
            F.sum("cents").alias("monetary"),
        )
        .transform(shared_bounded)
    )
    maxd = rfm0.agg(F.max("last_day").alias("d"))
    rfm = rfm0.crossJoin(F.broadcast(maxd)).select(
        "o_custkey",
        (F.col("d") - F.col("last_day")).alias("recency"),
        "frequency",
        "monetary",
    )

    # Quartile thresholds by two-level exact rank selection (round 10
    # — the round-9 verdict flagged the old single-level form: for
    # monetary the value histogram is ~customer-cardinality at test
    # scale, so its unpartitioned cum window funneled an unbounded
    # frame through one task). All THREE metrics stack into ONE keyed
    # CDF lineage (value_cdf_over_bins partitioned by metric — two
    # windows total instead of three separate histogram branches, and
    # no SinglePartition window at all): level 1 runs over per-metric
    # BIN tables (recency: calendar days ~2.5k; frequency:
    # orders/customer ~50; monetary: $1,000-wide cents bins, <=
    # domain/1e5 rows) — hard-bounded regardless of customer count;
    # level 2 is (metric, bin)-partitioned (<= 1e5 distinct integer
    # values per partition by construction). Selected p25/p50/p75 are
    # byte-identical to the one-level form, so the oracle is
    # unchanged.
    from flink_scala_spark.operators.aggregations import value_cdf_over_bins

    stacked = rfm.select(
        F.expr(
            "stack(3, 'recency', recency, 'frequency', frequency,"
            " 'monetary', monetary) AS (metric, v)"
        )
    ).withColumn(
        "b",
        F.when(F.col("metric") == "monetary", F.expr("v DIV 100000")).otherwise(
            F.col("v")
        ),
    )
    cdf = value_cdf_over_bins(stacked, keys=("metric",))
    pick = lambda m, expr_n: F.min(
        F.when(
            (F.col("metric") == m) & (F.col("cum") >= F.expr(expr_n)), F.col("v")
        )
    )
    thresholds = cdf.agg(
        *[
            pick(m, e).alias(f"{m}_{p}")
            for m in ("recency", "frequency", "monetary")
            for p, e in (
                ("p25", "(n + 3) DIV 4"),
                ("p50", "(2 * n + 3) DIV 4"),
                ("p75", "(3 * n + 3) DIV 4"),
            )
        ]
    )
    seg = rfm.crossJoin(F.broadcast(thresholds))
    bucket = lambda m: (
        F.lit(1)
        + (F.col(m) > F.col(f"{m}_p25")).cast("int")
        + (F.col(m) > F.col(f"{m}_p50")).cast("int")
        + (F.col(m) > F.col(f"{m}_p75")).cast("int")
    ).cast("int")
    return (
        seg.select(
            bucket("recency").alias("r_q"),
            bucket("frequency").alias("f_q"),
            bucket("monetary").alias("m_q"),
            "monetary",
        )
        .groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("monetary").cast("long").alias("sum_cents"),
        )
    )


@register(
    "product_type_profit",
    f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(sum({_REV}
                    - CAST(p.p_retailprice AS DECIMAL(12,2))
                      * CAST(l.l_quantity AS INT)
                      * CAST(0.6 AS DECIMAL(2,1))) AS DOUBLE) AS profit
    FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    "relational", "q9",
)
def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (adapted: no partsupp table in the driver testdata, so
    supply cost is the 60%-of-retail proxy priced from part): profit on
    'red' parts by supplier nation x order year — the 5-table profit
    rollup whose planning hazards are (a) the p_name filter must reach
    the part scan BEFORE the join and (b) only nation may broadcast
    (part/supplier/orders all scale with SF — round-9 broadcast
    policy). All money arithmetic stays DECIMAL until the final cast,
    so the sum is exact in both engines."""
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cost = (
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("int")
        * F.lit(0.6).cast("decimal(2,1)")
    )
    return (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .join(s, l["l_suppkey"] == s["s_suppkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(_rev_col() - cost).cast("double").alias("profit"))
    )


@register(
    "large_volume_customers",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(floor(epoch(o.o_orderdate)) AS BIGINT) AS o_date_s,
           CAST(floor(o.o_totalprice * 100) AS BIGINT) AS total_cents,
           CAST(q.total_qty AS BIGINT) AS total_qty
    FROM (SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                   AS total_qty
          FROM lineitem GROUP BY 1
          HAVING sum(CAST(l_quantity AS BIGINT)) > 250) q
      JOIN orders o ON o.o_orderkey = q.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
    """,
    "relational", "q18",
)
def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: customers who placed very-large-volume orders
    (order's summed quantity > 250). The classic HAVING-subquery plan:
    ONE map-side-combinable lineitem aggregate produces the qualifying
    order keys WITH their quantity (no second lineitem scan, no IN
    subquery re-evaluation); the survivors (~1% of orders) then join
    orders and customer. Quantities are integer-valued, so the
    BIGINT sum and threshold are exact."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_quantity").cast("long").alias("qty")
    )
    q = (
        li.groupBy("l_orderkey")
        .agg(F.sum("qty").alias("total_qty"))
        .where(F.col("total_qty") > 250)
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    from flink_scala_spark.functions.portable import epoch_seconds

    return (
        q.join(o, q["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            epoch_seconds("o_orderdate").alias("o_date_s"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("total_cents"),
            F.col("total_qty").cast("long").alias("total_qty"),
        )
    )


@register(
    "revenue_gini",
    """
    WITH per AS (
        SELECT o_custkey,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS v
        FROM orders GROUP BY 1
    ),
    h AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM per GROUP BY 1),
    c AS (SELECT v, cnt,
                 CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum,
                 CAST(sum(cnt) OVER () AS BIGINT) AS n
          FROM h),
    tot AS (
        SELECT max(n) AS n,
               CAST(sum(CAST(v AS HUGEINT) * cnt) AS HUGEINT) AS t,
               CAST(sum(CAST(v AS HUGEINT) * cnt
                        * (2 * (cum - cnt) + cnt + 1)) AS HUGEINT) AS s2,
               CAST(sum(CAST(v AS HUGEINT)
                        * least(cnt, greatest(0, cum - (n - n // 10))))
                    AS HUGEINT) AS stp
        FROM c
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           CAST(t AS BIGINT) AS total_cents,
           CAST((s2 - (n + 1) * t) * 1000000 // (n * t) AS BIGINT) AS gini_ppm,
           CAST(stp * 1000000 // t AS BIGINT) AS top_decile_share_ppm
    FROM tot
    """,
    "analytics", "concentration", "gini",
)
def q_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (X207): exact Gini coefficient and
    top-decile revenue share of customer lifetime spend, in ppm —
    computed WITHOUT sorting the customer table. The rank sum of a
    tied-value group is closed-form (cnt*(2*below + cnt + 1) = twice
    the rank sum), so Gini's S = sum(i * v_i) needs only each distinct
    value's strictly-below count — which comes from the same two-level
    (fixed-width bin, value) histogram CDF as customer_rfm_segments:
    the only unpartitioned windows run over hard-bounded bin tables.

    Exactness across engines: products reach ~n^2*v, past BIGINT at
    scale, so the Spark side accumulates DECIMAL(38,0) and the DuckDB
    oracle HUGEINT; the final ratios use integral `div` (exact in both,
    all operands non-negative: ranks and values sorted ascending give
    2S >= (n+1)T by the Chebyshev sum inequality). Outputs are plain
    BIGINT ppm."""
    from flink_scala_spark.operators.aggregations import binned_value_cdf

    orders = _t(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("v")
    )
    j = binned_value_cdf(per, "v", 100_000)
    vd = F.col("v").cast("decimal(38,0)")
    agg = j.agg(
        F.max("n").alias("n"),
        F.sum(vd * F.col("cnt")).alias("t"),
        F.sum(
            vd * F.col("cnt") * (2 * F.col("below") + F.col("cnt") + 1)
        ).alias("s2"),
        F.sum(
            vd
            * F.least(
                F.col("cnt"),
                F.greatest(
                    F.lit(0).cast("long"),
                    F.col("cum") - F.expr("n - n DIV 10"),
                ),
            )
        ).alias("stp"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n_customers"),
        F.col("t").cast("long").alias("total_cents"),
        F.expr(
            "CAST((s2 - (n + 1) * t) * 1000000 div (n * t) AS LONG)"
        ).alias("gini_ppm"),
        F.expr("CAST(stp * 1000000 div t AS LONG)").alias(
            "top_decile_share_ppm"
        ),
    )
