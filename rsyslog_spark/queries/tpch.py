"""Analytics queries over the TPC-H-ish driver tables — the engine's
general aggregation/join surface exercised at benchmark scale
(these are also the headline bench.py queries)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rsyslog_spark.queries import Query, load

QUERIES: list[Query] = []


def q(name, oracle, doc=""):
    def deco(fn):
        QUERIES.append(Query(name=name, spark=fn, oracle=oracle, doc=doc))
        return fn
    return deco


@q(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2024-11-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary (scan-heavy partial agg; "
        "the bench headline).",
)
def pricing_summary(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-11-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@q(
    "top_revenue_orders",
    """
    SELECT o.o_orderkey, c.c_mktsegment,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'O'
    GROUP BY o.o_orderkey, c.c_mktsegment
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3-style: broadcast dim join + shuffle join + top-k "
        "(TakeOrderedAndProject).",
)
def top_revenue_orders(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o.filter(F.col("o_orderstatus") == "O"),
                li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("o_orderkey", "c_mktsegment")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@q(
    "supplier_part_volume",
    """
    SELECT s.s_name, p.p_brand,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size >= 25
    GROUP BY s.s_name, p.p_brand
    """,
    doc="Two broadcast dim joins with a pushed-down dim filter "
        "(partition-pruning/pushdown showcase).",
)
def supplier_part_volume(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    p = load(spark, sf_dir, "part").filter(F.col("p_size") >= 25)
    return (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("s_name", "p_brand")
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("total_qty"),
             F.count(F.lit(1)).alias("n_lines"))
    )


@q(
    "order_priority_timing",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-09-01 00:00:00'
    GROUP BY o_orderpriority
    """,
    doc="Time-range filter + conditional aggregation (predicate "
        "pushdown to parquet scan).",
)
def order_priority_timing(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.filter((F.col("o_orderdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
                 & (F.col("o_orderdate") < F.lit("1996-09-01 00:00:00").cast("timestamp")))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"),
             F.sum(F.when(F.col("o_totalprice") > 150000, 1).otherwise(0))
             .cast("long").alias("n_big"))
    )
