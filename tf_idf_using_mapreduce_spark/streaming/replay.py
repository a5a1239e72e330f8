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
    """Static side: events with a replay tick index (event-time order)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.orderBy("ts", "event_id")
    return ev.withColumn(
        "tick", ((F.row_number().over(w) - 1) / events_per_tick).cast("long")
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
