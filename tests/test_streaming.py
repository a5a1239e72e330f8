"""Structured Streaming: real stream == batch twin == oracle; watermark +
session-window state paths."""

from __future__ import annotations

from tests.conftest import SF_SMOKE, assert_query_matches_oracle
from tf_idf_using_mapreduce_spark.streaming import events as se


def test_streaming_matches_oracle(spark):
    assert_query_matches_oracle(spark, "events_hourly_streaming")


def test_sliding_windows_match_oracle(spark):
    assert_query_matches_oracle(spark, "events_sliding_windows")


def test_stream_equals_batch(spark):
    from tf_idf_using_mapreduce_spark.operators.relational import events_hourly_tumbling

    stream_rows = {
        tuple(r) for r in se.events_hourly_streaming(spark, SF_SMOKE).collect()
    }
    batch_rows = {tuple(r) for r in events_hourly_tumbling(spark, SF_SMOKE).collect()}
    assert stream_rows == batch_rows


def test_stateful_running_counts(spark, duck):
    """applyInPandasWithState totals must equal the batch per-user aggregates
    once the finite stream drains."""
    stream = se.read_events_stream(spark, SF_SMOKE)
    out = se.user_running_counts_stateful(stream)
    q = (
        out.writeStream.format("memory").queryName("stateful_result")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.table("stateful_result").collect()
    # update mode may emit a row per user per batch; keep the final (max) count
    final = {}
    for r in rows:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (r["n_events"], r["total_value"])
    expected = {
        u: (n, round(v, 6))
        for u, n, v in duck.execute(
            "SELECT user_id, count(*), sum(value) FROM events GROUP BY 1"
        ).fetchall()
    }
    assert {u: f[0] for u, f in final.items()} == {u: e[0] for u, e in expected.items()}
    for u in expected:
        assert abs(final[u][1] - expected[u][1]) < 1e-4, (u, final[u], expected[u])


def test_session_windows_stream(spark):
    """Session-window aggregation (30 min gap) through a real stream — the
    stateful-window surface DuckDB cannot express (rows-only by design)."""
    from pyspark.sql import functions as F

    stream = se.read_events_stream(spark, SF_SMOKE)
    sessions = (
        stream.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    se.run_stream_to_memory(sessions, "session_result")
    rows = spark.table("session_result").collect()
    assert rows
    # sessions are per-user, disjoint, and each holds >= 1 event
    for r in rows:
        assert r["n"] >= 1
        assert r["w"]["end"] > r["w"]["start"]


def test_stream_dedup_matches_batch_distinct(spark):
    assert_query_matches_oracle(spark, "events_stream_dedup")


def test_stream_parquet_sink_exactly_once(spark, tmp_path):
    """Native parquet streaming sink with a checkpoint: all rows land once,
    and re-running the same stream against the same checkpoint writes
    NOTHING new (offset-log replay protection) — the exactly-once contract a
    production ingest pipeline relies on."""
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def run_once():
        q = (
            se.read_events_stream(spark, SF_SMOKE)
            .select("event_id", "user_id", "event_type")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got = spark.read.parquet(out)
    assert got.count() == 1000
    assert got.select("event_id").distinct().count() == 1000
    run_once()  # replay: same source files, same checkpoint
    assert spark.read.parquet(out).count() == 1000


def test_stream_stream_interval_join_matches_batch(spark):
    assert_query_matches_oracle(spark, "events_stream_stream_join")


def test_user_running_totals_oracle_parity(spark):
    assert_query_matches_oracle(spark, "events_user_running_totals")


def test_user_running_totals_across_micro_batches(spark, tmp_path):
    """The max_by final-state collapse must hold when the stream arrives in
    MANY micro-batches (the fixture file yields just one): split events
    into 4 files, force one file per trigger, and the per-user finals must
    still equal the batch aggregate."""
    from pyspark.sql import functions as F
    from tf_idf_using_mapreduce_spark.sources.corpus import load_table

    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "value", "ts")
    src = str(tmp_path / "src")
    # round-robin repartition: every user's rows spread across all 4 files
    ev.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema("user_id long, value double, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = se.user_running_counts_stateful(stream)
    q = (
        out.writeStream.format("memory").queryName("multi_batch_stateful")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    snap = spark.table("multi_batch_stateful")
    n_batches = snap.groupBy("user_id").count().agg(F.max("count")).collect()[0][0]
    assert n_batches > 1, "expected the same user across multiple micro-batches"
    final = (
        snap.groupBy("user_id")
        .agg(F.max("n_events").alias("n"), F.expr("max_by(total_value, n_events)").alias("v"))
        .collect()
    )
    expected = {
        r["user_id"]: (r["n"], r["v"])
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("v"))
        .collect()
    }
    got = {r["user_id"]: (r["n"], round(r["v"], 6)) for r in final}
    assert {u: g[0] for u, g in got.items()} == {u: e[0] for u, e in expected.items()}
    for u in expected:
        assert abs(got[u][1] - expected[u][1]) < 1e-4, (u, got[u], expected[u])


def test_session_stream_oracle_parity(spark):
    assert_query_matches_oracle(spark, "events_session_stream")


def test_documents_stream_curation_matches_batch(spark):
    """Ingest-time curation: the streaming run must produce the exact same
    keep/drop decisions as the batch cascade (same expression tree, same
    oracle) — the batch↔stream portability contract."""
    from tf_idf_using_mapreduce_spark.operators.curation import curation_filter
    from tf_idf_using_mapreduce_spark.streaming.corpus import documents_stream_curation

    batch = sorted(map(tuple, curation_filter(spark, SF_SMOKE).collect()))
    stream = sorted(map(tuple, documents_stream_curation(spark, SF_SMOKE).collect()))
    assert stream == batch and batch


def test_documents_stream_curation_oracle_parity(spark):
    assert_query_matches_oracle(spark, "documents_stream_curation")


def test_documents_stream_pii_matches_batch(spark):
    """Ingest-time PII scrub: the streaming run must produce the exact same
    redactions and counts as the batch operator."""
    from tf_idf_using_mapreduce_spark.operators.curation import pii_redaction
    from tf_idf_using_mapreduce_spark.streaming.corpus import documents_stream_pii

    batch = sorted(map(tuple, pii_redaction(spark, SF_SMOKE).collect()))
    stream = sorted(map(tuple, documents_stream_pii(spark, SF_SMOKE).collect()))
    assert stream == batch and batch


def test_documents_stream_pii_oracle_parity(spark):
    assert_query_matches_oracle(spark, "documents_stream_pii")
