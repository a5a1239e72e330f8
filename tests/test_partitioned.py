"""Date-partitioned fact layout: oracle parity, plan-asserted partition
pruning (static ``PartitionFilters`` and the runtime ``dynamicpruning``
subquery), and the directory contract MEASURED from the written layout with
``os.listdir`` — the partitioned twin of test_persisted.py's
``SelectedBucketsCount`` discipline."""

from __future__ import annotations

import os
import re

from tests.conftest import SF_SMOKE, assert_query_matches_oracle
from tf_idf_using_mapreduce_spark.operators import partitioned, persisted


def _executed_plan(df) -> str:
    df.collect()  # finalize AQE so the plan shows the real scan nodes
    return df._jdf.queryExecution().executedPlan().toString()


def _table_location(spark, name: str) -> str:
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
    loc = next(r["data_type"] for r in rows if r["col_name"] == "Location")
    return loc.removeprefix("file:")


def _fact_table_name() -> str:
    return next(n for n in persisted._BUILT
                if n.startswith("graft_idx_events_by_date_"))


def test_static_query_matches_oracle(spark):
    assert_query_matches_oracle(spark, "events_daily_partitioned")


def test_dpp_query_matches_oracle(spark):
    assert_query_matches_oracle(spark, "events_daily_partitioned_dpp")


def test_partitioned_layout_directory_contract(spark):
    """The written layout IS one directory per day: 30 ``event_date=`` dirs
    for the 30-day fixture, each holding parquet files only for its day."""
    partitioned._events_fact(spark, SF_SMOKE)  # ensure built
    loc = _table_location(spark, _fact_table_name())
    part_dirs = sorted(d for d in os.listdir(loc) if d.startswith("event_date="))
    assert len(part_dirs) == 30, part_dirs
    assert part_dirs[0] == "event_date=2024-01-01"
    assert part_dirs[-1] == "event_date=2024-01-30"


def test_static_partition_pruning_in_plan_and_file_index(spark):
    """A literal day window resolves at PLAN time: the scan node carries
    PartitionFilters on event_date and its file index lists exactly the 7
    matching directories — out of the 30 that exist on disk."""
    df = partitioned.events_daily_partitioned(spark, SF_SMOKE)
    assert df.count() > 0
    plan = _executed_plan(df)
    scan = next(l for l in plan.splitlines()
                if "FileScan" in l and "events_by_date" in l)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", scan)
    assert m and "event_date" in m.group(1), scan
    assert ">=" in m.group(1) and "<=" in m.group(1), m.group(1)
    # the measured skip: 7 of 30 partition directories in the file index
    assert "InMemoryFileIndex(7 paths)" in scan, scan
    # and no row-level date filtering remains — the directories did the work
    assert re.search(r"DataFilters: \[\]", scan), scan


def test_dynamic_partition_pruning_in_plan_and_file_index(spark):
    """The dim-driven day set exists only at RUN time: the fact scan's
    partition filters carry a ``dynamicpruning`` subquery fed by the join's
    reused broadcast, and the post-execution file index holds the 4
    directories the dim selected (day-of-month % 7 == 3 → 3/10/17/24)."""
    df = partitioned.events_daily_partitioned_dpp(spark, SF_SMOKE)
    assert df.count() > 0
    plan = _executed_plan(df)
    assert "dynamicpruning" in plan, plan
    assert re.search(r"Subquery(Adaptive)?Broadcast dynamicpruning", plan), plan
    scan = next(l for l in plan.splitlines()
                if "FileScan" in l and "events_by_date" in l)
    assert "InMemoryFileIndex(4 paths)" in scan, scan


def test_unknown_identity_falls_back_in_plan(spark, tmp_path):
    """A corpus with no readable identity (no events.parquet) derives the
    same expressions in-plan... and a KNOWN corpus at a fresh path builds a
    fresh table whose results match the in-plan derivation exactly."""
    d = str(tmp_path)
    rows = [(1, "2024-01-03 10:00:00", 7, "view", 1.25, "{}"),
            (2, "2024-01-10 11:00:00", 7, "click", 2.50, "{}"),
            (3, "2024-01-11 12:00:00", 8, "view", 4.00, "{}")]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string,"
              " value double, props string"
    ).selectExpr("event_id", "cast(ts as timestamp) ts", "user_id",
                 "event_type", "value", "props")
    df.coalesce(1).write.parquet(f"{d}/events.parquet")
    out = {tuple(r) for r in
           partitioned.events_daily_partitioned_dpp(spark, d).collect()}
    # only the two day%7==3 dates (3rd and 10th) survive the dim filter
    assert out == {("view", 1, 1, 1.25), ("click", 1, 1, 2.5)}


def test_stream_partitioned_sink_matches_oracle(spark):
    """The ingest-time partitioned layout (writeStream.partitionBy) feeds the
    same rollup to the same oracle as the batch twin."""
    assert_query_matches_oracle(spark, "events_stream_daily_partitioned")


def test_stream_partitioned_sink_lays_out_directories(spark, tmp_path):
    """The streamed sink really is one directory per day — measured from the
    written layout, and value-identical to the batch source."""
    from pyspark.sql import functions as F

    from tf_idf_using_mapreduce_spark.streaming.events import (
        read_events_stream,
        run_stream_to_partitioned_sink,
    )

    sink = str(tmp_path / "stream_part")
    part = (read_events_stream(spark, SF_SMOKE, watermark=None)
            .select("ts", "event_type", "value")
            .withColumn("event_date", F.to_date("ts")))
    run_stream_to_partitioned_sink(part, sink, ["event_date"])
    dirs = sorted(d for d in os.listdir(sink) if d.startswith("event_date="))
    assert len(dirs) == 30, dirs
    n = spark.read.parquet(sink).count()
    from tf_idf_using_mapreduce_spark.sources.corpus import load_table

    assert n == load_table(spark, SF_SMOKE, "events").count()


def test_partition_overwrite_matches_oracle(spark):
    assert_query_matches_oracle(spark, "events_daily_partition_overwrite")


def test_overwrite_touches_only_target_partition(spark, tmp_path):
    """Dynamic partition overwrite is SURGICAL: the corrected day's directory
    is rewritten, every other directory's files are byte-for-byte untouched
    (same names, same mtimes) — snapshotted across the overwrite."""
    from pyspark.sql import functions as F

    from tf_idf_using_mapreduce_spark.operators.partitioned import (
        overwrite_day_partitions,
    )
    from tf_idf_using_mapreduce_spark.sources.corpus import table_location

    name = "graft_test_overwrite_tbl"
    rows = [(i, f"2024-01-{d:02d} 10:00:00", 1.0 * i, "view")
            for i, d in enumerate([3, 3, 4, 5, 5, 5], start=1)]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, value double, event_type string"
    ).selectExpr("event_id", "cast(ts as timestamp) ts", "value",
                 "event_type", "to_date(ts) event_date")
    (df.repartition("event_date").write.mode("overwrite").format("parquet")
     .partitionBy("event_date").saveAsTable(name))
    try:
        loc = table_location(spark, name)

        def snapshot():
            out = {}
            for d in os.listdir(loc):
                if not d.startswith("event_date="):
                    continue
                p = os.path.join(loc, d)
                out[d] = sorted(
                    (f, os.stat(os.path.join(p, f)).st_mtime_ns)
                    for f in os.listdir(p) if not f.startswith(("_", "."))
                )
            return out

        before = snapshot()
        assert set(before) == {"event_date=2024-01-03", "event_date=2024-01-04",
                               "event_date=2024-01-05"}
        corr = df.where(F.col("event_date") == "2024-01-04") \
                 .withColumn("value", F.col("value") * 2)
        overwrite_day_partitions(spark, name, corr)
        after = snapshot()
        # untouched days: identical file names AND mtimes
        for d in ("event_date=2024-01-03", "event_date=2024-01-05"):
            assert after[d] == before[d], d
        # the corrected day was rewritten
        assert after["event_date=2024-01-04"] != before["event_date=2024-01-04"]
        got = {(r["event_id"], r["value"]) for r in spark.table(name).collect()}
        assert got == {(1, 1.0), (2, 2.0), (3, 6.0), (4, 4.0), (5, 5.0), (6, 6.0)}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


# --------------------------------------------------------------------------- #
# schema evolution (round 14)
# --------------------------------------------------------------------------- #


def test_schema_evolution_matches_oracle(spark):
    assert_query_matches_oracle(spark, "events_daily_schema_evolution")


def test_schema_evolution_null_channel_shape(spark):
    """Channel is populated for exactly the post-cut days plus the
    backfilled day, NULL for all other history — per-day, from the table."""
    rows = {r["event_date"]: r for r in
            partitioned.events_daily_schema_evolution(spark, SF_SMOKE).collect()}
    assert len(rows) == 30
    for day, r in rows.items():
        if day >= partitioned.EVO_DATE or day == partitioned.EVO_BACKFILL_DATE:
            assert r["n_with_channel"] == r["n_events"], r
            assert 0 < r["n_web"] < r["n_events"], r  # both channels occur
        else:
            assert r["n_with_channel"] == 0, r
            assert r["n_web"] == 0, r


def test_alter_add_columns_is_metadata_only_and_backfill_is_surgical(spark, tmp_path):
    """The lifecycle's physical contract, measured: (1) ALTER TABLE ADD
    COLUMNS rewrites NO files (every pre-cut directory identical by name AND
    mtime), (2) appending post-cut days touches no pre-cut directory,
    (3) the backfill rewrites exactly its own day."""
    from pyspark.sql import functions as F

    from tf_idf_using_mapreduce_spark.operators.partitioned import (
        overwrite_day_partitions,
    )
    from tf_idf_using_mapreduce_spark.sources.corpus import table_location

    name = "graft_test_evo_tbl"
    rows = [(i, f"2024-01-{d:02d} 10:00:00", i * 1.0, "view", i)
            for i, d in enumerate([3, 4, 5, 16, 17], start=1)]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, value double, event_type string,"
              " user_id long"
    ).selectExpr("event_id", "cast(ts as timestamp) ts", "value",
                 "event_type", "user_id", "to_date(ts) event_date")
    pre = df.where(F.col("event_date") < "2024-01-16")
    post = df.where(F.col("event_date") >= "2024-01-16")
    (pre.repartition("event_date").write.mode("overwrite").format("parquet")
     .partitionBy("event_date").saveAsTable(name))
    try:
        loc = table_location(spark, name)

        def snapshot():
            out = {}
            for d in os.listdir(loc):
                if not d.startswith("event_date="):
                    continue
                p = os.path.join(loc, d)
                out[d] = sorted(
                    (f, os.stat(os.path.join(p, f)).st_mtime_ns)
                    for f in os.listdir(p) if not f.startswith(("_", "."))
                )
            return out

        base = snapshot()
        assert set(base) == {"event_date=2024-01-03", "event_date=2024-01-04",
                             "event_date=2024-01-05"}
        # (1) the ALTER is metadata-only
        spark.sql(f"ALTER TABLE {name} ADD COLUMNS (channel STRING)")
        assert snapshot() == base
        # (2) appending post-cut days leaves every pre-cut dir untouched
        (post.withColumn("channel", F.lit("web"))
         .select(*spark.table(name).columns)
         .write.mode("append").insertInto(name))
        after_append = snapshot()
        for d in base:
            assert after_append[d] == base[d], d
        assert "event_date=2024-01-16" in after_append
        # old rows read back with NULL channel under the evolved schema
        got = {(r["event_id"], r["channel"])
               for r in spark.table(name).collect()}
        assert (1, None) in got and (4, "web") in got
        # (3) the backfill rewrites exactly its own day
        backfill = (pre.where(F.col("event_date") == "2024-01-04")
                    .withColumn("channel", F.lit("app")))
        overwrite_day_partitions(spark, name, backfill)
        after_backfill = snapshot()
        for d in ("event_date=2024-01-03", "event_date=2024-01-05",
                  "event_date=2024-01-16", "event_date=2024-01-17"):
            assert after_backfill[d] == after_append[d], d
        assert after_backfill["event_date=2024-01-04"] != \
            after_append["event_date=2024-01-04"]
        got = {(r["event_id"], r["channel"])
               for r in spark.table(name).collect()}
        assert (2, "app") in got and (1, None) in got
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


# --------------------------------------------------------------------------- #
# CDC MERGE (round 14)
# --------------------------------------------------------------------------- #


def test_merge_upsert_matches_oracle(spark):
    assert_query_matches_oracle(spark, "events_daily_merge_upsert")


def test_merge_rewrites_only_touched_partitions(spark, tmp_path):
    """The merge's physical contract: partitions outside the change batch
    keep their exact files (names AND mtimes); touched partitions are
    rewritten with survivors + upserts − deletes; a partition whose every
    row the batch deletes disappears entirely (the dynamic-overwrite
    pitfall handled via partition DDL)."""
    from pyspark.sql import functions as F

    from tf_idf_using_mapreduce_spark.operators.partitioned import (
        merge_into_partitions,
    )
    from tf_idf_using_mapreduce_spark.sources.corpus import table_location

    name = "graft_test_merge_tbl"
    rows = [(1, "2024-01-03", "view", 1.0), (2, "2024-01-03", "click", 2.0),
            (3, "2024-01-04", "view", 3.0), (4, "2024-01-04", "view", 4.0),
            (5, "2024-01-05", "click", 5.0),
            (6, "2024-01-06", "view", 6.0)]
    df = spark.createDataFrame(
        rows, "event_id long, day string, event_type string, value double"
    ).selectExpr("event_id", "event_type", "value",
                 "cast(day as date) event_date")
    (df.repartition("event_date").write.mode("overwrite").format("parquet")
     .partitionBy("event_date").saveAsTable(name))
    try:
        loc = table_location(spark, name)

        def snapshot():
            out = {}
            for d in os.listdir(loc):
                if not d.startswith("event_date="):
                    continue
                p = os.path.join(loc, d)
                out[d] = sorted(
                    (f, os.stat(os.path.join(p, f)).st_mtime_ns)
                    for f in os.listdir(p) if not f.startswith(("_", "."))
                )
            return out

        before = snapshot()
        # batch: update id 3 (day 04), delete id 4 (day 04), insert id 99
        # (day 04), delete id 5 — day 05's ONLY row; days 03/06 untouched
        changes = spark.createDataFrame(
            [(3, "view", 30.0, "2024-01-04", "U"),
             (4, "view", 4.0, "2024-01-04", "D"),
             (99, "click", 99.0, "2024-01-04", "I"),
             (5, "click", 5.0, "2024-01-05", "D")],
            "event_id long, event_type string, value double, day string,"
            " _op string",
        ).selectExpr("event_id", "event_type", "value",
                     "cast(day as date) event_date", "_op")
        merge_into_partitions(spark, name, changes, ["event_id"], "event_date")
        after = snapshot()
        for d in ("event_date=2024-01-03", "event_date=2024-01-06"):
            assert after[d] == before[d], d
        assert after["event_date=2024-01-04"] != before["event_date=2024-01-04"]
        assert "event_date=2024-01-05" not in after  # fully-deleted partition
        got = {(r["event_id"], r["value"]) for r in spark.table(name).collect()}
        assert got == {(1, 1.0), (2, 2.0), (3, 30.0), (99, 99.0), (6, 6.0)}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_merge_plan_broadcasts_change_keys_and_prunes_base(spark, tmp_path):
    """The merge read side: the base scan is partition-pruned to the
    affected days and the change-key anti-join broadcasts the SMALL side —
    the base is never reshuffled."""
    import re as _re

    from pyspark.sql import functions as F

    from tf_idf_using_mapreduce_spark.operators import persisted

    # build via the registered route on the smoke corpus
    partitioned.events_daily_merge_upsert(spark, SF_SMOKE).collect()
    name = next(n for n in persisted._BUILT
                if n.startswith("graft_idx_events_by_date_merged_"))
    base = spark.table(name).where(
        F.dayofmonth("event_date").isin(*partitioned.MERGE_DAYS))
    keys = spark.range(5).selectExpr("id as event_id")
    j = base.join(F.broadcast(keys), "event_id", "left_anti")
    j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert not _re.search(r"hashpartitioning\(event_id#", plan), plan
    scan = next(l for l in plan.splitlines()
                if "FileScan" in l and "events_by_date_merged" in l)
    m = _re.search(r"InMemoryFileIndex\((\d+) paths\)", scan)
    assert m and int(m.group(1)) == 3, scan  # 3 of the 30 day dirs
