"""Time-range join (SURVEY custom-operator surface, alongside the as-of join
in ``operators/sessions.py``): match rows whose timestamps fall inside an
interval anchored at the probe row, WITHOUT an equi-key.

Spark has no native range join (Databricks' range-join hint is not OSS), and
the naive formulation is a BroadcastNestedLoopJoin — every probe row against
every candidate row. The scalable shape is INTERVAL BUCKETING, the standard
trick (same family as the bucketed LSH joins in ``operators/dedup.py``):

1. quantize time into bins of the window width W;
2. each candidate row keys by its ONE bin; each probe row explodes to the
   ⌈W/bin⌉+1 = 2 bins its lookback interval can touch — fan-out rides the
   PROBE side only;
3. an ordinary equi-join on the bin co-locates all possible matches (a pair
   at distance ≤ W can differ by at most one bin), then the exact interval
   predicate filters within the bucket.

One grouping shuffle on uniform bin keys instead of an n×m nested loop. At
100 TB the levers are the bin width (fan-out vs bucket size) and hot bins
(flash-crowd seconds): shrink bins or salt the hot keys — the same
mitigation as LSH hot buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tf_idf_using_mapreduce_spark.sources.corpus import load_table

WINDOW_SECONDS = 300  # 5-minute lookback


def clicks_before_purchase_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(purchase_id, n_clicks, last_click_id): for every purchase event, the
    number of click events — by ANY user, no equi-key — in the 5 minutes up
    to and including the purchase, plus the max click id for a deterministic
    secondary output. Purchases with no clicks in range are absent (inner
    semantics), mirrored by the oracle."""
    W = WINDOW_SECONDS
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    bin_expr = f"floor(unix_timestamp(ts) / {W})"
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        F.explode(F.expr(f"array({bin_expr} - 1, {bin_expr})")).alias("bin"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
        F.expr(bin_expr).alias("bin"),
    )
    return (
        purchases.join(clicks, "bin")
        .where(F.expr(f"c_ts > p_ts - INTERVAL {W} SECOND AND c_ts <= p_ts"))
        .groupBy("purchase_id")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.max("click_id").alias("last_click_id"),
        )
    )


RANGE_JOIN_ORACLE = f"""
WITH p AS (SELECT event_id AS purchase_id, ts AS p_ts FROM events
           WHERE event_type = 'purchase'),
c AS (SELECT event_id AS click_id, ts AS c_ts FROM events
      WHERE event_type = 'click')
SELECT purchase_id, count(*) AS n_clicks, max(click_id) AS last_click_id
FROM p JOIN c ON c_ts > p_ts - INTERVAL {WINDOW_SECONDS} SECOND AND c_ts <= p_ts
GROUP BY purchase_id
"""


def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, hour, event_type, n, sum_value): the hypertable-style TIME
    hierarchy rollup — subtotals at (day, hour, type), (day, hour),
    (day) and grand total in ONE pass (`ROLLUP`), the continuous-aggregate
    cascade (hour → day → total) a time-series store materializes. Spark
    plans rollup as a single Expand + aggregate: each input row fans to its
    grouping sets map-side, still one shuffle."""
    ev = load_table(spark, sf_dir, "events")
    src = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.date_format("ts", "HH").alias("hour"),
        "event_type",
        "value",
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    ]
    # empty-input grand-total row (NULL keys, n=0, NULL sum) per the SQL
    # standard — same limit-1 probe as relational.rollup_customer_geo; the
    # non-empty single-Expand plan is untouched
    if src.isEmpty():
        return src.agg(*aggs).select(
            F.lit(None).cast("string").alias("day"),
            F.lit(None).cast("string").alias("hour"),
            F.lit(None).cast("string").alias("event_type"),
            "n", "sum_value",
        )
    return src.rollup("day", "hour", "event_type").agg(*aggs)


TIME_ROLLUP_ORACLE = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       strftime(ts, '%H') AS hour,
       event_type,
       count(*) AS n,
       round(sum(value), 6) AS sum_value
FROM events
GROUP BY ROLLUP (day, hour, event_type)
"""
