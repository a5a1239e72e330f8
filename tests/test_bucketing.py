"""Bucketed co-located joins: same bucketing on both sides of a join key
eliminates the exchange entirely (the 100 TB recurring-join layout)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tf_idf_using_mapreduce_spark.sources.corpus import load_table, write_bucketed_table


def test_bucketed_join_has_no_exchange(spark):
    # managed tables land in the session's default warehouse; DROP TABLE in
    # the finally block removes the files (gitignored regardless)
    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    lineitem = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed_table(orders, "b_orders", ["o_orderkey"], sort_cols=["o_orderkey"])
    write_bucketed_table(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", ["o_orderkey"], sort_cols=["o_orderkey"],
    )
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
        joined = bo.join(bl, "o_orderkey").groupBy("o_orderkey").agg(
            F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("qty")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # a sort-merge join with NO shuffle exchange on either side: the
        # bucketing supplied the hash partitioning at write time
        assert "SortMergeJoin" in plan, plan
        assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan, plan
        # and the result must equal the unbucketed join
        plain = (
            orders.join(lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
            .groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("qty"))
        )
        got = {(r["o_orderkey"], r["n"], r["qty"]) for r in joined.collect()}
        want = {(r["o_orderkey"], r["n"], r["qty"]) for r in plain.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
