"""Bucketed co-located joins: the write-once-shuffle-never layout for
fact-to-fact joins at 100 TB (SCALE.md dial). Plan-asserted: a join of
two tables bucketed on their join keys has ZERO Exchange nodes."""

from __future__ import annotations

from pyspark.sql import functions as F

from rsyslog_spark.session import write_bucketed


def test_bucketed_join_no_exchange(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.range(10_000).select(
            F.col("id").alias("o_orderkey"),
            (F.col("id") % 7).alias("o_pri"))
        items = spark.range(40_000).select(
            (F.col("id") % 10_000).alias("l_orderkey"),
            (F.col("id") % 50).cast("double").alias("l_qty"))
        write_bucketed(orders, "b_orders_t", "o_orderkey", 8)
        write_bucketed(items, "b_items_t", "l_orderkey", 8)

        bo = spark.table("b_orders_t")
        bi = spark.table("b_items_t")
        joined = bo.join(bi, bo.o_orderkey == bi.l_orderkey) \
            .groupBy("o_pri").agg(F.sum("l_qty").alias("qty"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself is exchange-free: both sides read bucketed.
        # (the post-join groupBy on o_pri still shuffles — that key
        # isn't the bucket key; assert exactly that one remains)
        n_exchange = plan.count("Exchange")
        assert "SortMergeJoin" in plan
        assert n_exchange == 1, plan
        # and the answer is right
        total = joined.agg(F.sum("qty")).first()[0]
        assert total == sum(i % 50 for i in range(40_000))

        # contrast: the same join over plain (unbucketed) frames
        # shuffles BOTH sides
        plain = orders.join(items,
                            orders.o_orderkey == items.l_orderkey) \
            .groupBy("o_pri").agg(F.sum("l_qty").alias("qty"))
        plan2 = plain._jdf.queryExecution().executedPlan().toString()
        assert plan2.count("Exchange") >= 3
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders_t")
        spark.sql("DROP TABLE IF EXISTS b_items_t")


def test_bucketed_groupby_no_exchange(spark):
    """An aggregation keyed on the bucket key also skips its
    Exchange — bucketing amortizes the shuffle for BOTH join and
    groupBy consumers."""
    try:
        ev = spark.range(20_000).select(
            (F.col("id") % 500).alias("sender"),
            F.col("id").alias("event_id"))
        write_bucketed(ev, "b_events_t", "sender", 8)
        agg = spark.table("b_events_t").groupBy("sender").agg(
            F.count(F.lit(1)).alias("n"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 0, plan
        assert agg.count() == 500
    finally:
        spark.sql("DROP TABLE IF EXISTS b_events_t")
