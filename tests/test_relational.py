"""Relational query surface: oracle parity for every query + physical-plan
assertions (broadcasts where dimensions join facts, filter pushdown to the
parquet scan, top-k without a global sort)."""

from __future__ import annotations

import re

import pytest

from tests.conftest import SF_SMOKE, assert_query_matches_oracle
from tf_idf_using_mapreduce_spark.operators import relational as rel

RELATIONAL_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "topk_orders",
    "rollup_customer_geo",
    "cube_lineitem_flags",
    "top3_orders_per_customer",
    "running_customer_spend",
    "customers_without_orders",
    "order_status_symmetric_difference",
    "suppliers_intersect_customer_nations",
    "monthly_order_revenue",
    "events_json_stats",
    "lineitem_price_stats",
    "events_json_schema_stats",
    "user_event_unpivot",
    "customer_order_cadence",
    "events_hourly_tumbling",
]


@pytest.mark.parametrize("name", RELATIONAL_QUERIES)
def test_oracle_parity(spark, name):
    assert_query_matches_oracle(spark, name)


def test_q1_filter_pushed_to_scan(spark):
    plan = rel.q1_pricing_summary(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "l_shipdate" in m.group(1), plan[:2000]


def test_q3_broadcasts_customer(spark):
    plan = rel.q3_shipping_priority(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_topk_uses_take_ordered(spark):
    plan = rel.topk_orders(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_q1_scan_prunes_columns(spark):
    plan = rel.q1_pricing_summary(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"ReadSchema: struct<([^\n>]*)", plan)
    assert m, plan[:2000]
    cols = {c.split(":")[0] for c in m.group(1).split(",") if ":" in c}
    # exactly the columns q1 touches — nothing else leaves the scan
    assert cols == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    }, cols


def test_price_stats_approx_tracks_exact(spark):
    """The GK-sketch quantiles (the 100 TB path) must sit within 2% relative
    error of the exact interpolated quantiles at accuracy=1000."""
    exact = {r["l_returnflag"]: r for r in rel.lineitem_price_stats(spark, SF_SMOKE).collect()}
    approx = {r["l_returnflag"]: r for r in rel.lineitem_price_stats_approx(spark, SF_SMOKE).collect()}
    assert exact.keys() == approx.keys()
    for flag, a in approx.items():
        e = exact[flag]
        for col in ("p25", "median", "p95"):
            assert abs(a[col] - e[col]) / e[col] < 0.02, (flag, col, a[col], e[col])


def test_unpivot_roundtrips_pivot(spark):
    """melt(pivot(x)) == x: the reshape pair is lossless on nonzero cells."""
    long_form = {
        (r["user_id"], r["event_type"], r["n"])
        for r in rel.user_event_unpivot(spark, SF_SMOKE).collect()
    }
    from tf_idf_using_mapreduce_spark.sources.corpus import load_table
    from pyspark.sql import functions as F

    direct = {
        (r["user_id"], r["event_type"], r["n"])
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert long_form == direct


def test_lineitem_price_stats_approx_err_oracle_parity(spark):
    """GK rank-error gate: every approx percentile's rank interval within
    eps of target — the round-5 value check for lineitem_price_stats_approx."""
    assert_query_matches_oracle(spark, "lineitem_price_stats_approx_err")
