"""Extended TPC-H shapes (operators/tpch_extra.py): oracle parity for all 12
queries + physical-plan assertions for the optimizer exercises each shape
exists to prove (full predicate pushdown, scalar-subquery broadcast, anti
join, single-scan HAVING reuse)."""

from __future__ import annotations

import re

import pytest

from tests.conftest import SF_SMOKE, assert_query_matches_oracle
from tf_idf_using_mapreduce_spark.operators import tpch_extra as tpch

TPCH_EXTRA_QUERIES = [
    "q2_cheapest_supplier",
    "q6_forecast_revenue",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q22_idle_customers",
]


@pytest.mark.parametrize("name", TPCH_EXTRA_QUERIES)
def test_oracle_parity(spark, name):
    assert_query_matches_oracle(spark, name)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_all_predicates_pushed(spark):
    """Q6's whole WHERE clause is range predicates on scanned columns — all
    three must reach the parquet reader."""
    plan = _plan(tpch.q6_forecast_revenue(spark, SF_SMOKE))
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m, plan[:2000]
    pushed = m.group(1)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, (col, pushed)


def test_q2_no_extra_shuffle(spark):
    """The correlated-MIN rewrite is ONE window over the partkey shuffle —
    no join of an aggregate back onto the fact table."""
    plan = _plan(tpch.q2_cheapest_supplier(spark, SF_SMOKE))
    assert "SortMergeJoin" not in plan, plan[:3000]
    assert plan.count("BroadcastHashJoin") == 1, plan[:3000]


def test_q15_single_fact_scan(spark):
    """The scalar-max subquery must reuse the aggregated revenue CTE, not
    rescan lineitem: exactly one lineitem scan in the plan."""
    plan = _plan(tpch.q15_top_supplier(spark, SF_SMOKE))
    assert plan.count("lineitem.parquet") <= 2  # scan node + its reuse/exchange
    assert "BroadcastHashJoin" in plan, plan[:3000]


def test_q16_exclusion_is_anti_join(spark):
    plan = _plan(tpch.q16_supplier_part_counts(spark, SF_SMOKE))
    assert "LeftAnti" in plan, plan[:3000]


def test_q10_topk_without_global_sort(spark):
    plan = _plan(tpch.q10_returned_items(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan, plan[:3000]


def test_q17_cutoff_joined_broadcast(spark):
    """The decorrelated per-part average must come back as a broadcast join
    (the agg is bounded by part count), never a shuffle join."""
    plan = _plan(tpch.q17_small_quantity_revenue(spark, SF_SMOKE))
    assert "SortMergeJoin" not in plan, plan[:3000]
