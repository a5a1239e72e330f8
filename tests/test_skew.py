"""Salting utilities must be result-identical to their plain counterparts."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tf_idf_using_mapreduce_spark.functions.skew import (
    salted_broadcast_left,
    salted_count,
    salted_count_distinct,
)
from tf_idf_using_mapreduce_spark.sources.corpus import load_table


def test_salted_count_matches_plain(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    plain = {(r["l_returnflag"], r["cnt"]) for r in
             li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    salted = {(r["l_returnflag"], r["cnt"]) for r in
              salted_count(li, "l_returnflag").collect()}
    assert plain == salted


def test_salted_count_distinct_matches_plain(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    plain = {(r["l_returnflag"], r["df"]) for r in
             li.groupBy("l_returnflag").agg(F.countDistinct("l_orderkey").alias("df")).collect()}
    salted = {(r["l_returnflag"], r["df"]) for r in
              salted_count_distinct(li, "l_returnflag", "l_orderkey").collect()}
    assert plain == salted


def test_salted_join_matches_plain(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    cust = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = sorted((r["o_orderkey"], r["c_name"]) for r in
                   orders.join(cust, "o_custkey").select("o_orderkey", "c_name").collect())
    salted = sorted((r["o_orderkey"], r["c_name"]) for r in
                    salted_broadcast_left(orders, cust, "o_custkey")
                    .select("o_orderkey", "c_name").collect())
    assert plain == salted
