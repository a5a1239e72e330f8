"""Time-range join (interval bucketing) + hypertable-style time rollup."""

from __future__ import annotations

from tests.conftest import SF_SMOKE, assert_query_matches_oracle
from tf_idf_using_mapreduce_spark.operators.rangejoin import (
    clicks_before_purchase_5min,
    events_time_rollup,
)


def test_range_join_oracle_parity(spark):
    assert_query_matches_oracle(spark, "clicks_before_purchase_5min")


def test_time_rollup_oracle_parity(spark):
    assert_query_matches_oracle(spark, "events_time_rollup")


def test_range_join_is_bucketed_equi_join(spark):
    """The whole point: the interval predicate must ride an equi-join on the
    time bin, never a nested-loop over all pairs."""
    plan = clicks_before_purchase_5min(spark, SF_SMOKE)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan


def test_range_join_window_edges(spark):
    """Boundary semantics: a click exactly at the purchase instant counts;
    one exactly W before does not (strict >)."""
    rows = {r["purchase_id"]: r for r in clicks_before_purchase_5min(spark, SF_SMOKE).collect()}
    # spot-check totals against a local recomputation over the raw events
    from tf_idf_using_mapreduce_spark.sources.corpus import load_table

    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "ts", "event_type").collect()
    purchases = [(r["event_id"], r["ts"]) for r in ev if r["event_type"] == "purchase"]
    clicks = [(r["event_id"], r["ts"]) for r in ev if r["event_type"] == "click"]
    import datetime

    w = datetime.timedelta(seconds=300)
    for pid, pts in purchases:
        within = [cid for cid, cts in clicks if pts - w < cts <= pts]
        if within:
            assert rows[pid]["n_clicks"] == len(within), pid
            assert rows[pid]["last_click_id"] == max(within), pid
        else:
            assert pid not in rows


def test_rollup_has_grand_total(spark):
    out = events_time_rollup(spark, SF_SMOKE).collect()
    totals = [r for r in out if r["day"] is None and r["hour"] is None and r["event_type"] is None]
    assert len(totals) == 1 and totals[0]["n"] == 1000  # sf0.001 events
