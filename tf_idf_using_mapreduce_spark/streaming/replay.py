"""Rate-limited replay of a static event table as a live stream (SURVEY.md
§7.2 #7 "rate-limited replay source") — the standard way to exercise a
streaming pipeline against historical data at a controlled events/sec.

Spark's built-in ``rate`` source emits (timestamp, value=tick) rows at
``rowsPerSecond``; each tick is joined (broadcast, tick == batch index) to a
pre-indexed slice of the events table, releasing ``events_per_tick`` events
per tick in event-time order. The result is a genuine unbounded streaming
DataFrame — watermarks, windows, and stateful ops behave exactly as they
would on a live feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tf_idf_using_mapreduce_spark.sources.corpus import load_table


def indexed_events(spark: SparkSession, sf_dir: str, events_per_tick: int = 100) -> DataFrame:
    """Static side: events with a replay tick index (event-time order).

    The global event-time rank runs as the two-phase distributed form —
    bin by day, rank WITHIN each bin, add broadcast per-bin offsets (a
    window over the tiny bin-totals table only) — never a bare
    ``Window.orderBy`` that would drag the whole events table through ONE
    task (same discipline as ``operators/packing.token_offsets_of`` and
    ``operators/rangejoin``)."""
    ev = load_table(spark, sf_dir, "events")
    binned = ev.withColumn("_bin", F.date_trunc("day", "ts"))
    totals = binned.groupBy("_bin").agg(F.count(F.lit(1)).alias("_n"))
    w_bins = Window.orderBy("_bin").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_n").over(w_bins), F.lit(0))
    ).select("_bin", "_off")
    w_in = Window.partitionBy("_bin").orderBy("ts", "event_id")
    return (
        binned.join(F.broadcast(offsets), "_bin")
        .withColumn(
            "tick",
            ((F.col("_off") + F.row_number().over(w_in) - 1) / events_per_tick).cast("long"),
        )
        .drop("_bin", "_off")
    )


def replay_events_stream(spark: SparkSession, sf_dir: str,
                         events_per_tick: int = 100,
                         ticks_per_second: int = 10) -> DataFrame:
    """Streaming DataFrame replaying the fixture events at
    ``events_per_tick × ticks_per_second`` events/sec."""
    ticks = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(ticks_per_second))
        .load()
        .select(F.col("value").alias("tick"))
    )
    indexed = indexed_events(spark, sf_dir, events_per_tick)
    return ticks.join(indexed, "tick").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
