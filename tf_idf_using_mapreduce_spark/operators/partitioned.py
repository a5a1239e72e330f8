"""Date-partitioned fact layout: directory-partition pruning, static and
dynamic — the first read lever a 100 TB deployment reaches for.

The reference's unit of scan IS a directory (``DocumentFreq.java:145`` /
``IDF.java:201`` point a job at an input dir; ``README.md:12-18`` chains jobs
through output directories) — Hive-style partitioning is that idea made
declarative: the writer lays the fact table out as one directory per
partition value (``DataFrameWriter.partitionBy``), and the reader's planner
— not its tasks — decides which directories exist for a query. Two levers,
one per query here:

- **static pruning** (:func:`events_daily_partitioned`): a LITERAL predicate
  on the partition column resolves at plan time; the scan's file index lists
  only the matching ``event_date=...`` directories (``PartitionFilters`` on
  the scan node, partition-directory count measured in
  tests/test_partitioned.py with plain ``os.listdir`` — the house rule:
  measured, not assumed). At 100 TB a day-window query reads days, not the
  table.

- **dynamic partition pruning** (:func:`events_daily_partitioned_dpp`): the
  partition filter is NOT known at plan time — it is the join-key set of a
  filtered DIMENSION (the TPC-DS ``date_dim`` shape). Catalyst inserts a
  ``dynamicpruning`` subquery into the fact scan's partition filters and
  REUSES the join's broadcast of the dim side to evaluate it
  (``SubqueryBroadcast dynamicpruning#N`` in the executed plan, pinned by
  the tests), so the fact side still reads only the matching directories —
  the one Catalyst read-path feature the repo had not yet exercised
  (r12 verdict #1).

Layout tables are materialized once per corpus identity through the same
write-once machinery as the persisted dedup indexes
(``persisted._ensure_index`` keyed on ``events.parquet``'s file signature);
unknown identity falls back to deriving the same expressions in-plan —
results identical, only the pruning evidence disappears (correctness over
convenience). Both rollups use the exact decimal(18,6) sum basis (the r12
ADVICE rule): order-independent across partitionings and engines.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tf_idf_using_mapreduce_spark.operators.persisted import _ensure_index
from tf_idf_using_mapreduce_spark.sources.corpus import load_table

# the static query's literal day window (the driver fixtures' events span
# 2024-01-01..2024-01-30 at every SF; 7 of the 30 partition directories)
PART_DATE_LO = "2024-01-08"
PART_DATE_HI = "2024-01-14"
# the DPP dim filter: day-of-month % 7 == 3 → dates 3/10/17/24 (4 of 30).
# Pure integer arithmetic on day(…) — identical in Spark and DuckDB (unlike
# dayofweek, whose numbering differs between the engines).
DPP_DOM_MOD = 7
DPP_DOM_EQ = 3

def _sum_value():
    # built lazily: Column construction needs an active SparkContext
    return (
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 6)
        .cast("double").alias("sum_value")
    )


def _fact_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact expression the partitioned table materializes: events plus
    its partition column ``event_date = to_date(ts)`` (NULL ts → NULL date →
    the Hive default partition, dropped by every date predicate on both
    engines)."""
    return load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts"))


def _events_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The date-partitioned events fact — from the write-once partitioned
    table when corpus identity is known, else the in-plan expression."""
    name = _ensure_index(
        spark, sf_dir, "events_by_date", lambda: _fact_df(spark, sf_dir),
        source_table="events.parquet", partition_cols=["event_date"],
    )
    return spark.table(name) if name is not None else _fact_df(spark, sf_dir)


def _date_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_date): the date dimension, persisted as a plain table (tens of
    rows per month of data — metadata-scale, broadcast whole). Production
    ships a ``date_dim`` with calendar attributes; deriving it from the fact
    at build time keeps the fixture self-contained."""
    build = lambda: _fact_df(spark, sf_dir).select("event_date").distinct()  # noqa: E731
    name = _ensure_index(spark, sf_dir, "date_dim", build, bucketed=False,
                         source_table="events.parquet")
    return spark.table(name) if name is not None else build()


def daily_window_rollup(fact: DataFrame) -> DataFrame:
    """(event_date, event_type, n_events, sum_value) over the literal day
    window — shared by the batch partitioned query and its streaming-sink
    twin (streaming/events.py), so the two cannot drift from the one
    oracle."""
    return (
        fact.where(F.col("event_date").between(PART_DATE_LO, PART_DATE_HI))
        .groupBy(
            F.date_format("event_date", "yyyy-MM-dd").alias("event_date"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"), _sum_value())
    )


def events_daily_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_date, event_type, n_events, sum_value): daily rollup over a
    LITERAL day window, read from the date-partitioned fact — the planner
    lists only the 7 matching ``event_date=...`` directories
    (``PartitionFilters`` on the scan; directory count measured in the
    tests). The rollup itself is one partial-aggregated hash aggregation;
    the scan does no row-level filtering at all — every surviving row is in
    the window by virtue of its directory."""
    return daily_window_rollup(_events_fact(spark, sf_dir))


EVENTS_DAILY_PARTITIONED_ORACLE = f"""
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date, event_type,
       count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE) AS sum_value
FROM events
WHERE CAST(ts AS DATE) BETWEEN DATE '{PART_DATE_LO}' AND DATE '{PART_DATE_HI}'
GROUP BY 1, 2
"""


def events_daily_partitioned_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_events, n_days, sum_value): the same fact, but the day
    set comes from a FILTERED DIMENSION (day-of-month % 7 == 3), so the
    partition filter exists only at run time — dynamic partition pruning:
    the executed plan carries a ``dynamicpruning`` subquery inside the fact
    scan's partition filters, fed by the REUSED broadcast of the dim side,
    and the fact reads 4 of the 30 directories (both pinned in
    tests/test_partitioned.py). This is the TPC-DS fact ⨝ date_dim shape —
    at 100 TB it is the difference between scanning the quarter the
    dashboard asked about and scanning the decade the table holds."""
    fact = _events_fact(spark, sf_dir)
    sel = _date_dim(spark, sf_dir).where(
        F.dayofmonth("event_date") % DPP_DOM_MOD == DPP_DOM_EQ)
    return (
        fact.join(sel, "event_date")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_date").alias("n_days"),
            _sum_value(),
        )
    )


EVENTS_DAILY_PARTITIONED_DPP_ORACLE = f"""
WITH dim AS (SELECT DISTINCT CAST(ts AS DATE) AS event_date
             FROM events WHERE ts IS NOT NULL),
sel AS (SELECT event_date FROM dim
        WHERE day(event_date) % {DPP_DOM_MOD} = {DPP_DOM_EQ})
SELECT e.event_type, count(*) AS n_events,
       count(DISTINCT CAST(e.ts AS DATE)) AS n_days,
       CAST(round(sum(CAST(e.value AS DECIMAL(18,6))), 6) AS DOUBLE) AS sum_value
FROM events e JOIN sel s ON CAST(e.ts AS DATE) = s.event_date
GROUP BY 1
"""


# --------------------------------------------------------------------------- #
# dynamic partition overwrite: the surgical single-day backfill
# --------------------------------------------------------------------------- #

# the day whose facts arrive corrected after the backfill (doubling is EXACT
# in IEEE doubles — a power-of-two scale only moves the exponent — so the
# corrected values carry zero float noise into either engine)
CORR_DATE = "2024-01-10"


def overwrite_day_partitions(spark: SparkSession, table: str,
                             corrected: DataFrame) -> None:
    """Replace ONLY the partitions present in ``corrected`` inside the
    date-partitioned ``table`` — ``partitionOverwriteMode=dynamic``, the
    lake maintenance primitive for late corrections: at 100 TB a one-day
    fix rewrites one directory, not the table (every other directory's
    files are untouched on disk — tests/test_partitioned.py snapshots
    file names AND mtimes across the overwrite to prove it). The session
    conf is scoped to the write and restored."""
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        # insertInto is POSITIONAL: align to the table's column order
        # (saveAsTable moved the partition column last)
        corrected.select(*spark.table(table).columns) \
            .write.mode("overwrite").insertInto(table)
    finally:
        spark.conf.set(key, prev)


def _corrected_expr(fact: DataFrame) -> DataFrame:
    """The correction as a plain expression (the in-plan fallback and the
    oracle's CASE): CORR_DATE's values doubled, every other day untouched."""
    return fact.withColumn(
        "value",
        F.when(F.col("event_date") == CORR_DATE, F.col("value") * 2)
        .otherwise(F.col("value")),
    )


def _events_fact_corrected(spark: SparkSession, sf_dir: str):
    """The partitioned fact AFTER the single-day backfill: full write, then
    ``overwrite_day_partitions`` with CORR_DATE's corrected rows — built
    once per corpus identity so the query measures the READ, while the
    write-path surgery itself is exercised (and physically asserted) by the
    tests."""

    def writer(df: DataFrame, name: str) -> None:
        (df.repartition("event_date")
         .write.mode("overwrite").format("parquet")
         .partitionBy("event_date").saveAsTable(name))
        corr = _corrected_expr(df.where(F.col("event_date") == CORR_DATE))
        overwrite_day_partitions(spark, name, corr)

    return _ensure_index(spark, sf_dir, "events_by_date_corr",
                         lambda: _fact_df(spark, sf_dir),
                         source_table="events.parquet", writer=writer)


def events_daily_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_date, event_type, n_events, sum_value): the daily rollup read
    AFTER a dynamic-partition-overwrite backfill corrected one day in place
    — same literal window as :func:`events_daily_partitioned`, so the green
    row proves the overwrite changed EXACTLY the corrected day's numbers
    and left every other day bit-identical (the oracle applies the
    correction as a CASE on the pristine events view)."""
    name = _events_fact_corrected(spark, sf_dir)
    fact = (spark.table(name) if name is not None
            else _corrected_expr(_fact_df(spark, sf_dir)))
    return daily_window_rollup(fact)


EVENTS_DAILY_PARTITION_OVERWRITE_ORACLE = f"""
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date, event_type,
       count(*) AS n_events,
       CAST(round(sum(CAST(CASE WHEN CAST(ts AS DATE) = DATE '{CORR_DATE}'
                                THEN value * 2 ELSE value END
                           AS DECIMAL(18,6))), 6) AS DOUBLE) AS sum_value
FROM events
WHERE CAST(ts AS DATE) BETWEEN DATE '{PART_DATE_LO}' AND DATE '{PART_DATE_HI}'
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------- #
# schema evolution: ADD COLUMNS on a partitioned fact — the remaining lake
# maintenance primitive after overwrite + compaction (r13 verdict #5)
# --------------------------------------------------------------------------- #

# the schema cut: days before this were ingested WITHOUT the ``channel``
# column; days from this one on carry it
EVO_DATE = "2024-01-16"
# the one historical day backfilled WITH the new column after the evolution
# (via the same dynamic-partition-overwrite surgery as the correction tier)
EVO_BACKFILL_DATE = "2024-01-05"


def _channel_col():
    """The evolved column's derivation — deterministic from row data so the
    oracle can replay it as a CASE on the pristine view. A NULL user_id
    falls to 'app' on both engines (NULL % 2 = 0 is NULL → otherwise/ELSE)."""
    return (
        F.when(F.col("user_id") % 2 == 0, F.lit("web"))
        .otherwise(F.lit("app"))
    )


def _evolved_expr(fact: DataFrame) -> DataFrame:
    """The evolved table as a plain expression (the in-plan fallback and the
    oracle's CASE): channel exists for post-cut days and the backfilled day,
    NULL for every other historical day."""
    return fact.withColumn(
        "channel",
        F.when(
            (F.col("event_date") >= EVO_DATE)
            | (F.col("event_date") == EVO_BACKFILL_DATE),
            _channel_col(),
        ),
    )


def _events_fact_evolved(spark: SparkSession, sf_dir: str):
    """The partitioned fact across a SCHEMA CUT, built once per corpus
    identity: (1) pre-cut days land under the original schema, (2)
    ``ALTER TABLE ... ADD COLUMNS (channel STRING)`` evolves the table —
    metadata only, ZERO files rewritten (the surgical assertion in the
    tests snapshots every pre-cut directory's files + mtimes across the
    ALTER and the append), (3) post-cut days append WITH the column, (4)
    one historical day is backfilled through the existing
    :func:`overwrite_day_partitions` surgery. Readers see NULL channel for
    un-backfilled history — parquet's missing-column semantics under the
    evolved table schema, the exact contract a 100 TB lake relies on to
    add a column without a table rewrite."""

    def writer(df: DataFrame, name: str) -> None:
        is_post = F.coalesce(F.col("event_date") >= EVO_DATE, F.lit(False))
        (df.where(~is_post)
         .repartition("event_date")
         .write.mode("overwrite").format("parquet")
         .partitionBy("event_date").saveAsTable(name))
        spark.sql(f"ALTER TABLE {name} ADD COLUMNS (channel STRING)")
        (df.where(is_post).withColumn("channel", _channel_col())
         .select(*spark.table(name).columns)
         .repartition("event_date")
         .write.mode("append").insertInto(name))
        backfill = (
            df.where(F.col("event_date") == EVO_BACKFILL_DATE)
            .withColumn("channel", _channel_col())
        )
        overwrite_day_partitions(spark, name, backfill)

    return _ensure_index(spark, sf_dir, "events_by_date_evo",
                         lambda: _fact_df(spark, sf_dir),
                         source_table="events.parquet", writer=writer)


def events_daily_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_date, n_events, n_with_channel, n_web): per-day audit of the
    fact table across the schema cut — row counts are unchanged by the
    evolution (the ALTER moved no data), ``channel`` is populated for
    post-cut days and the backfilled day and NULL elsewhere, and the
    populated days split web/app by the derivation. The oracle replays the
    whole lifecycle as a CASE on the pristine events view, so the green row
    proves ADD COLUMNS + append + backfill produced exactly the rows a
    from-scratch build would."""
    name = _events_fact_evolved(spark, sf_dir)
    fact = (spark.table(name) if name is not None
            else _evolved_expr(_fact_df(spark, sf_dir)))
    return (
        fact.where(F.col("event_date").isNotNull())
        .groupBy(F.date_format("event_date", "yyyy-MM-dd").alias("event_date"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("channel").alias("n_with_channel"),
            F.coalesce(
                F.sum(F.when(F.col("channel") == "web", 1).otherwise(0)),
                F.lit(0),
            ).cast("long").alias("n_web"),
        )
    )


# --------------------------------------------------------------------------- #
# CDC MERGE (upsert/delete) into the partitioned fact — the last lake
# maintenance primitive after overwrite + compaction + schema evolution
# --------------------------------------------------------------------------- #

# the fixture change batch touches exactly these days-of-month (3 of the 30
# partition directories — the surgical contract the tests snapshot)
MERGE_DAYS = (5, 12, 21)


def merge_into_partitions(spark: SparkSession, table: str, changes: DataFrame,
                          key_cols: list[str], part_col: str) -> None:
    """MERGE a CDC change batch (rows tagged ``_op`` ∈ {'U','I','D'}) into a
    date-partitioned parquet ``table`` by rewriting ONLY the partitions the
    batch touches — the Hive-style merge a plain-parquet lake runs (a
    transactional format replaces this with MERGE INTO; the partition-
    granular rewrite shape is the same). Affected-partition list is ONE
    bounded collect (calendar-scale by construction); within those
    partitions, survivors = base anti-join change keys (the SMALL change
    batch broadcasts — the 100 TB side is scanned once, partition-pruned,
    never reshuffled), then upserts union in and the existing
    :func:`overwrite_day_partitions` surgery swaps the directories.

    Contract: an update that MOVES a row across partitions must be shipped
    as D(old partition) + I(new partition) — standard CDC practice, since a
    single-partition rewrite cannot see the row's old home. A batch that
    deletes a partition's every row empties it via partition DDL (dynamic
    overwrite alone cannot delete a directory it writes no rows into — the
    classic pitfall, handled instead of documented away)."""
    all_days = [r[0] for r in changes.select(part_col).distinct().collect()]
    if any(d is None for d in all_days):
        # A NULL partition key cannot be merged partition-granularly: NULL
        # days are invisible to the affected-partition scan (base rows in the
        # default partition never enter `survivors`), yet non-delete NULL
        # upserts would still flow into `merged` and dynamic overwrite would
        # then REPLACE the whole __HIVE_DEFAULT_PARTITION__ directory with
        # only those rows — silently deleting pre-existing NULL-key base
        # rows (r14 ADVICE). Ship NULL-key changes as explicit full-partition
        # rewrites instead.
        raise ValueError(
            f"merge_into_partitions: change batch contains NULL {part_col!r} "
            "rows; NULL partition keys are not mergeable partition-granularly"
        )
    days = all_days
    if not days:
        return
    base = spark.table(table).where(F.col(part_col).isin(days))
    keys = changes.select(*key_cols).distinct()
    survivors = base.join(F.broadcast(keys), key_cols, "left_anti")
    upserts = changes.where(F.col("_op") != "D").drop("_op")
    merged = survivors.unionByName(upserts.select(*survivors.columns))
    merged = merged.localCheckpoint(eager=False)  # lineage cut: days collect + write
    merged_days = {r[0] for r in merged.select(part_col).distinct().collect()}
    overwrite_day_partitions(spark, table, merged)
    for day in sorted(set(days) - merged_days):
        # every row of this partition was deleted: drop the directory.
        # The partition value is interpolated into DDL text, so restrict it
        # to date-like/identifier characters (r14 ADVICE: a string partition
        # value containing a quote would produce malformed/injectable SQL) —
        # the helper's contract is date-typed partition columns.
        day_s = str(day)
        if not re.fullmatch(r"[0-9A-Za-z_.:\- ]+", day_s):
            raise ValueError(
                f"merge_into_partitions: partition value {day_s!r} is not "
                "DDL-safe; this helper supports date-typed (or date-like "
                "string) partition columns only"
            )
        spark.sql(f"ALTER TABLE {table} DROP IF EXISTS "
                  f"PARTITION ({part_col}='{day_s}')")


def _merge_change_batch(fact: DataFrame) -> DataFrame:
    """The fixture CDC batch, derived deterministically from the pristine
    fact so the oracle can replay it: on MERGE_DAYS days, ``event_id % 10``
    picks the op — 3 → update (value doubled: exact in IEEE doubles),
    5 → delete, 7 → insert (a novel negative key ``-event_id - 1``, same
    day, same value)."""
    in_days = F.col("event_date").isNotNull() & \
        F.dayofmonth("event_date").isin(*MERGE_DAYS)
    upd = (fact.where(in_days & (F.col("event_id") % 10 == 3))
           .withColumn("value", F.col("value") * 2)
           .withColumn("_op", F.lit("U")))
    dele = fact.where(in_days & (F.col("event_id") % 10 == 5)) \
        .withColumn("_op", F.lit("D"))
    ins = (fact.where(in_days & (F.col("event_id") % 10 == 7))
           .withColumn("event_id", -F.col("event_id") - F.lit(1))
           .withColumn("_op", F.lit("I")))
    return upd.unionByName(dele).unionByName(ins)


def _events_fact_merged(spark: SparkSession, sf_dir: str):
    """The partitioned fact AFTER a CDC merge batch: full write, then
    :func:`merge_into_partitions` with the fixture change batch — built
    once per corpus identity so the registered query measures the READ
    while the merge surgery itself is exercised (and physically asserted)
    by the tests."""

    def writer(df: DataFrame, name: str) -> None:
        (df.repartition("event_date")
         .write.mode("overwrite").format("parquet")
         .partitionBy("event_date").saveAsTable(name))
        merge_into_partitions(spark, name, _merge_change_batch(df),
                              ["event_id"], "event_date")

    return _ensure_index(spark, sf_dir, "events_by_date_merged",
                         lambda: _fact_df(spark, sf_dir),
                         source_table="events.parquet", writer=writer)


def _merged_expr(fact: DataFrame) -> DataFrame:
    """The merged table as a plain expression (in-plan fallback and the
    oracle's replay): updates as a CASE, deletes as a filter, inserts as a
    union."""
    in_days = F.col("event_date").isNotNull() & \
        F.dayofmonth("event_date").isin(*MERGE_DAYS)
    kept = (
        fact.where(~(in_days & (F.col("event_id") % 10 == 5)))
        .withColumn(
            "value",
            F.when(in_days & (F.col("event_id") % 10 == 3),
                   F.col("value") * 2).otherwise(F.col("value")),
        )
    )
    ins = (fact.where(in_days & (F.col("event_id") % 10 == 7))
           .withColumn("event_id", -F.col("event_id") - F.lit(1)))
    return kept.unionByName(ins)


def events_daily_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_events, min_event_id, sum_value): rollup over the fact
    AFTER the CDC merge — n_events reflects deletes and inserts, the
    negative min_event_id proves the inserts landed, sum_value reflects the
    doubled updates; the oracle replays the identical batch as
    CASE/filter/union on the pristine events view, so the green row proves
    the partition-granular merge produced exactly the state a from-scratch
    build would."""
    name = _events_fact_merged(spark, sf_dir)
    fact = (spark.table(name) if name is not None
            else _merged_expr(_fact_df(spark, sf_dir)))
    return (
        fact.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("event_id").alias("min_event_id"),
            _sum_value(),
        )
    )


EVENTS_DAILY_MERGE_UPSERT_ORACLE = f"""
WITH fact AS (
  SELECT event_id, CAST(ts AS DATE) AS event_date, event_type, value
  FROM events
),
tagged AS (
  SELECT *, (event_date IS NOT NULL
             AND day(event_date) IN ({", ".join(str(d) for d in MERGE_DAYS)}))
         AS in_days
  FROM fact
),
kept AS (
  SELECT event_id, event_type,
         CASE WHEN in_days AND event_id % 10 = 3 THEN value * 2
              ELSE value END AS value
  FROM tagged
  WHERE NOT (in_days AND event_id % 10 = 5)
),
ins AS (
  SELECT -event_id - 1 AS event_id, event_type, value
  FROM tagged WHERE in_days AND event_id % 10 = 7
),
merged AS (SELECT * FROM kept UNION ALL SELECT * FROM ins)
SELECT event_type, count(*) AS n_events,
       CAST(min(event_id) AS BIGINT) AS min_event_id,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE) AS sum_value
FROM merged
GROUP BY 1
"""


EVENTS_DAILY_SCHEMA_EVOLUTION_ORACLE = f"""
WITH fact AS (
  SELECT CAST(ts AS DATE) AS event_date, user_id
  FROM events WHERE ts IS NOT NULL
),
evolved AS (
  SELECT event_date,
         CASE WHEN event_date >= DATE '{EVO_DATE}'
                OR event_date = DATE '{EVO_BACKFILL_DATE}'
              THEN (CASE WHEN user_id % 2 = 0 THEN 'web' ELSE 'app' END)
         END AS channel
  FROM fact
)
SELECT strftime(event_date, '%Y-%m-%d') AS event_date,
       count(*) AS n_events,
       count(channel) AS n_with_channel,
       CAST(coalesce(sum(CASE WHEN channel = 'web' THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_web
FROM evolved
GROUP BY 1
"""
