"""Snapshot versioning / time travel on the partitioned fact — the lake
primitive that makes every physical mutation in this tier (append, overwrite,
merge, compaction) REVERSIBLE and auditable.

The reference already versions by accretion: each chained job writes a NEW
output directory and the previous job's output stays on disk, readable
(``README.md:12-18`` chains TermFreq → DocumentFreq → IDF through output
dirs; ``IDF.java:201`` points the next job at the previous output). That is
mapreduce-era snapshotting — every run is a frozen, replayable version. This
module makes that contract transactional, the Delta/Iceberg core, built from
first principles on plain parquet + a JSON commit log:

- a table's LIVE state is defined by a MANIFEST (``_version_log/v{k}.json``
  listing the data files of snapshot k), never by "whatever files are in the
  directory";
- a commit writes data files first, then publishes the manifest via
  write-to-temp + ``os.rename`` (atomic on POSIX) — readers either see the
  old snapshot or the new one, never a torn file list;
- DELETE is a manifest edit: the removed day's files simply leave the file
  list. Nothing is erased from disk, so **every older snapshot stays
  readable after the delete** — time travel. At 100 TB this is also why
  deletes are O(metadata): dropping a day touches zero data bytes;
- a partition-granular REWRITE (drop one user cohort out of one day) writes
  the surviving rows as new files and swaps them into the manifest; the old
  files again stay behind for older snapshots (vacuum is a separate,
  deliberate act — not modeled here);
- the CHANGE DATA FEED between two snapshots is computed from the manifest
  diff at FILE granularity: read only the files one manifest has and the
  other doesn't — at 100 TB you read the commit's touched files, never the
  table — then ``EXCEPT ALL`` in both directions turns the file diff into
  exact row-level deletes/inserts (multiset identity: surviving rows appear
  on both sides and cancel).

Fixture lifecycle (three commits on the date-partitioned events fact, built
once per corpus identity through ``persisted._ensure_index`` — the same
write-once machinery as every other physical layout in the repo):

- **v0 "bulk"**: days of month ≤ 20 (plus NULL-date rows — the Hive default
  partition).
- **v1 "append"**: the remaining days land as an add-files-only commit
  (``v0.files ⊆ v1.files``, test-pinned).
- **v2 "delete-rewrite"**: day ``TT_DELETE_DATE`` (a v0 day) leaves the
  manifest whole; day ``TT_REWRITE_DATE`` (a v1 day) is rewritten without
  the ``user_id % 10 == 3`` cohort — the GDPR-shaped mutation.

Unknown corpus identity (the degenerate sweeps) falls back to deriving each
snapshot as a plain expression on the pristine events view — results
identical, only the physical evidence disappears. Both queries' oracles
replay the lifecycle as filters on the pristine view, so a green row proves
the manifest machinery reconstructs exactly the rows a from-scratch build
would.
"""

from __future__ import annotations

import json
import os
import re
import time
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tf_idf_using_mapreduce_spark.operators.partitioned import (
    _fact_df,
    _sum_value,
)
from tf_idf_using_mapreduce_spark.operators.persisted import _ensure_index

# the bulk-load cut: v0 = days of month <= TT_CUT_DOM (the events fixtures
# span 2024-01-01..2024-01-30 at every SF)
TT_CUT_DOM = 20
# v2 removes this v0-era day entirely — a manifest-only (O(metadata)) delete
TT_DELETE_DATE = "2024-01-09"
# v2 rewrites this v1-era day dropping the cohort below — partition-granular
TT_REWRITE_DATE = "2024-01-22"
TT_COHORT_MOD = 10
TT_COHORT_EQ = 3

_LOG_DIR = "_version_log"


def _is_post_cut():
    """Rows that arrive in the v1 append commit. NULL date → NULL > cut →
    False → bulk-loaded in v0 (the Hive default partition ships with the
    initial load)."""
    return F.coalesce(F.dayofmonth("event_date") > TT_CUT_DOM, F.lit(False))


def _is_deleted_day():
    return F.coalesce(F.col("event_date") == TT_DELETE_DATE, F.lit(False))


def _is_rewritten_cohort():
    """The rows the v2 rewrite drops. NULL user_id % m = e is NULL →
    coalesce False → the cohort never captures NULL users (mirrored in the
    oracle, where the bare ``=`` predicate drops NULLs the same way)."""
    return F.coalesce(
        (F.col("event_date") == TT_REWRITE_DATE)
        & (F.col("user_id") % TT_COHORT_MOD == TT_COHORT_EQ),
        F.lit(False),
    )


def _version_expr(fact: DataFrame, v: int) -> DataFrame:
    """Snapshot ``v`` as a plain expression on the fact — the in-plan
    fallback, the oracles' filters, and the tests' independent replay that
    the physical snapshots are compared against row-for-row."""
    if v == 0:
        return fact.where(~_is_post_cut())
    if v == 1:
        return fact
    if v == 2:
        return fact.where(~_is_deleted_day() & ~_is_rewritten_cohort())
    raise ValueError(f"no such snapshot: {v}")


def _table_location(spark: SparkSession, name: str) -> str:
    from tf_idf_using_mapreduce_spark.sources.corpus import table_location

    return table_location(spark, name)


def _data_files(loc: str) -> set[str]:
    """Relative paths of every data file under the table dir — commit-time
    file accounting (what Delta's transaction protocol collects from the
    job's committed tasks). Hidden/metadata names (``_version_log``,
    ``_SUCCESS``, ``.crc``) never enter a manifest."""
    out: set[str] = set()
    for root, dirs, files in os.walk(loc):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.add(os.path.relpath(os.path.join(root, f), loc))
    return out


def _commit(loc: str, version: int, op: str, files: set[str],
            parent: int | None) -> None:
    """Publish snapshot ``version`` atomically: the manifest is fully
    written to a dotfile, fsynced, then ``os.rename``d into place — a
    reader concurrently resolving ``v{k}.json`` sees the whole file list or
    none of it, never a prefix."""
    log = os.path.join(loc, _LOG_DIR)
    os.makedirs(log, exist_ok=True)
    man = {
        "version": version,
        "op": op,
        "parent": parent,
        "committed_at": time.time(),
        "n_files": len(files),
        "files": sorted(files),
    }
    tmp = os.path.join(log, f".v{version}.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(man, fh, indent=1)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, os.path.join(log, f"v{version}.json"))


def _manifest(loc: str, version: int) -> dict:
    with open(os.path.join(loc, _LOG_DIR, f"v{version}.json")) as fh:
        return json.load(fh)


def _read_files(spark: SparkSession, name: str, loc: str,
                files: list[str]) -> DataFrame:
    """Read an explicit file list under the table's schema. ``basePath``
    makes Spark parse the ``event_date=`` partition values out of each
    file's directory; the scan's file index holds EXACTLY these files
    (``df.inputFiles()``-asserted in the tests) — a snapshot read never
    lists, let alone reads, files outside its manifest."""
    schema = spark.table(name).schema
    if not files:
        return spark.createDataFrame([], schema)
    return (
        spark.read.schema(schema).option("basePath", loc)
        .parquet(*[os.path.join(loc, f) for f in files])
    )


def _read_snapshot(spark: SparkSession, name: str, loc: str,
                   version: int) -> DataFrame:
    return _read_files(spark, name, loc, _manifest(loc, version)["files"])


def _write_versioned(spark: SparkSession, df: DataFrame, name: str) -> str:
    """The three-commit lifecycle, shared by the time-travel layout and its
    vacuumed twin; returns the table location."""
    (df.where(~_is_post_cut())
     .repartition("event_date")
     .write.mode("overwrite").format("parquet")
     .partitionBy("event_date").saveAsTable(name))
    loc = _table_location(spark, name)
    files0 = _data_files(loc)
    _commit(loc, 0, "bulk", files0, parent=None)

    (df.where(_is_post_cut())
     .select(*spark.table(name).columns)
     .repartition("event_date")
     .write.mode("append").insertInto(name))
    files1 = _data_files(loc)
    _commit(loc, 1, "append", files1, parent=0)

    # v2: the delete is pure manifest arithmetic (zero data bytes
    # touched); the rewrite appends the surviving rows as new files —
    # nothing is removed from disk, which is exactly why v0/v1 remain
    # readable afterwards
    (df.where(F.col("event_date") == TT_REWRITE_DATE)
     .where(~_is_rewritten_cohort())
     .select(*spark.table(name).columns)
     .repartition("event_date")
     .write.mode("append").insertInto(name))
    new_files = _data_files(loc) - files1
    dropped = {
        f for f in files1
        if f.startswith((f"event_date={TT_DELETE_DATE}/",
                         f"event_date={TT_REWRITE_DATE}/"))
    }
    _commit(loc, 2, "delete-rewrite", (files1 - dropped) | new_files,
            parent=1)
    return loc


def _events_fact_versioned(spark: SparkSession, sf_dir: str):
    """The versioned events fact, built once per corpus identity: three
    commits, each publishing a manifest over the files then on disk. After
    v2 the TABLE DIRECTORY deliberately contains more files than any one
    manifest lists (the deleted day, the rewritten day's originals) — the
    directory is a file store; snapshots, not listings, define table state."""
    return _ensure_index(
        spark, sf_dir, "events_versioned",
        lambda: _fact_df(spark, sf_dir),
        source_table="events.parquet",
        writer=lambda df, name: _write_versioned(spark, df, name))


def _version_agg(df: DataFrame, v: int) -> DataFrame:
    return (
        df.agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_date").alias("n_days"),
            _sum_value(),
        )
        .select(F.lit(v).cast("int").alias("version"),
                "n_events", "n_days", "sum_value")
    )


def events_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(version, n_events, n_days, sum_value): the SAME audit aggregate read
    AS OF each of the three snapshots — v1 and v0 read AFTER the v2
    delete-rewrite was committed, so the green row proves older snapshots
    survive later mutations intact (the time-travel contract). Each
    snapshot read scans exactly its manifest's files; the oracle replays
    every version as filters on the pristine events view."""
    name = _events_fact_versioned(spark, sf_dir)
    if name is not None:
        loc = _table_location(spark, name)
        parts = [_version_agg(_read_snapshot(spark, name, loc, v), v)
                 for v in (0, 1, 2)]
    else:
        fact = _fact_df(spark, sf_dir)
        parts = [_version_agg(_version_expr(fact, v), v) for v in (0, 1, 2)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_V_AGG_SQL = """
SELECT {v} AS version, count(*) AS n_events,
       count(DISTINCT CAST(ts AS DATE)) AS n_days,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE) AS sum_value
FROM events{where}
"""

EVENTS_TIME_TRAVEL_ORACLE = " UNION ALL ".join([
    _V_AGG_SQL.format(
        v=0,
        where=f"\nWHERE NOT COALESCE(day(CAST(ts AS DATE)) > {TT_CUT_DOM},"
              " FALSE)"),
    _V_AGG_SQL.format(v=1, where=""),
    _V_AGG_SQL.format(
        v=2,
        where=f"""
WHERE NOT COALESCE(CAST(ts AS DATE) = DATE '{TT_DELETE_DATE}', FALSE)
  AND NOT COALESCE(CAST(ts AS DATE) = DATE '{TT_REWRITE_DATE}'
                   AND user_id % {TT_COHORT_MOD} = {TT_COHORT_EQ}, FALSE)"""),
])


def _diff_agg(df: DataFrame, label: str) -> DataFrame:
    return (
        df.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_rows"), _sum_value())
        .select(F.lit(label).alias("change"), "event_type",
                "n_rows", "sum_value")
    )


def events_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(change, event_type, n_rows, sum_value): the change data feed of the
    v1 → v2 commit, computed from the MANIFEST diff — the reads touch only
    the files one manifest lists and the other doesn't (``inputFiles``
    test-asserted), then ``EXCEPT ALL`` both ways converts the file-level
    diff into exact row-level changes: removed ⊖ added = the deleted day
    plus the rewritten-out cohort (surviving rows appear on both sides and
    cancel, multiset-exactly); added ⊖ removed = inserts (none in this
    commit — a groupBy over an empty frame emits no rows, matching the
    oracle). At 100 TB this is the CDC read path: commit-touched files,
    never the table."""
    name = _events_fact_versioned(spark, sf_dir)
    if name is not None:
        loc = _table_location(spark, name)
        f1 = set(_manifest(loc, 1)["files"])
        f2 = set(_manifest(loc, 2)["files"])
        removed = _read_files(spark, name, loc, sorted(f1 - f2))
        added = _read_files(spark, name, loc, sorted(f2 - f1))
        deleted_rows = removed.exceptAll(added)
        inserted_rows = added.exceptAll(removed)
    else:
        fact = _fact_df(spark, sf_dir)
        deleted_rows = fact.where(_is_deleted_day() | _is_rewritten_cohort())
        inserted_rows = fact.where(F.lit(False))
    return _diff_agg(deleted_rows, "delete").unionByName(
        _diff_agg(inserted_rows, "insert"))


EVENTS_SNAPSHOT_DIFF_ORACLE = f"""
SELECT 'delete' AS change, event_type, count(*) AS n_rows,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE) AS sum_value
FROM events
WHERE COALESCE(CAST(ts AS DATE) = DATE '{TT_DELETE_DATE}', FALSE)
   OR COALESCE(CAST(ts AS DATE) = DATE '{TT_REWRITE_DATE}'
               AND user_id % {TT_COHORT_MOD} = {TT_COHORT_EQ}, FALSE)
GROUP BY event_type
"""


# --------------------------------------------------------------------------- #
# VACUUM: retention-based physical GC — the deliberate act that trades old
# snapshots for reclaimed storage (Delta VACUUM / Iceberg expire_snapshots)
# --------------------------------------------------------------------------- #


def vacuum(loc: str, retain: list[int], spark: SparkSession | None = None,
           table: str | None = None) -> dict:
    """Physically delete every data file not referenced by any RETAINED
    snapshot, and prune emptied partition directories. The inverse bargain
    of the manifest-delete: v2's manifest edit cost zero bytes and kept
    history; vacuum reclaims the bytes and forfeits the un-retained
    snapshots (their manifests stay in the log as a record of what was
    expired — resolving one now raises, by design). Returns the report the
    operation is judged by: files/bytes removed and retained — measured
    from the filesystem, not assumed.

    Pass ``spark`` + ``table`` when the layout is also a catalog table:
    fully-emptied partition directories are then ALSO dropped from the
    metastore (r14 ADVICE — without the DDL the catalog keeps registering
    partitions whose directories vacuum removed, and a direct
    ``spark.table(...)`` scan would hit missing paths; manifest reads are
    unaffected either way)."""
    keep: set[str] = set()
    for v in retain:
        keep |= set(_manifest(loc, v)["files"])
    on_disk = _data_files(loc)
    doomed = sorted(on_disk - keep)
    n_bytes = 0
    emptied_parts: list[str] = []
    for f in doomed:
        p = os.path.join(loc, f)
        n_bytes += os.path.getsize(p)
        os.remove(p)
        parent = os.path.dirname(p)
        if not os.listdir(parent):
            os.rmdir(parent)
            emptied_parts.append(os.path.basename(parent))
    if spark is not None and table is not None:
        for part in emptied_parts:
            if "=" not in part:
                continue
            col, _, val = part.partition("=")
            # Hive URL-escapes special characters in partition DIRECTORY
            # names (%3A for ':', ...), so the raw basename can mismatch the
            # CATALOG value and the DROP would silently no-op, leaving the
            # exact catalog drift this DDL exists to fix (r15 ADVICE).
            # Unescape first, then apply the same DDL-safety guard as
            # merge_into_partitions — loud, never injectable.
            val = unquote(val)
            if not re.fullmatch(r"[0-9A-Za-z_.:\- ]+", val):
                raise ValueError(
                    f"vacuum: partition value {val!r} is not DDL-safe; "
                    "catalog partition drop supports date-like/identifier "
                    "partition values only"
                )
            spark.sql(f"ALTER TABLE {table} DROP IF EXISTS "
                      f"PARTITION ({col}='{val}')")
    return {
        "retained_versions": sorted(retain),
        "n_removed": len(doomed),
        "bytes_removed": n_bytes,
        "n_retained": len(keep & on_disk),
    }


def _events_fact_vacuumed(spark: SparkSession, sf_dir: str):
    """A SECOND versioned layout (own copy — vacuuming the shared
    time-travel table would destroy the history its tests and queries rely
    on) built by the same three-commit writer, then vacuumed down to the
    head snapshot: only v2's files survive on disk."""

    def writer(df: DataFrame, name: str) -> None:
        loc = _write_versioned(spark, df, name)
        vacuum(loc, retain=[2], spark=spark, table=name)

    return _ensure_index(spark, sf_dir, "events_versioned_vac",
                         lambda: _fact_df(spark, sf_dir),
                         source_table="events.parquet", writer=writer)


def events_vacuum_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_events, sum_value): the head snapshot read AFTER the
    layout was vacuumed to retain only v2 — the green row proves vacuum
    removed exactly the unreferenced files and not one byte the head still
    needs (the oracle replays v2's filters on the pristine view; the tests
    assert the physical side: the expired days' files are GONE here while
    the unvacuumed twin still holds them)."""
    name = _events_fact_vacuumed(spark, sf_dir)
    if name is not None:
        loc = _table_location(spark, name)
        head = _read_snapshot(spark, name, loc, 2)
    else:
        head = _version_expr(_fact_df(spark, sf_dir), 2)
    return (
        head.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), _sum_value())
    )


EVENTS_VACUUM_ROUNDTRIP_ORACLE = f"""
SELECT event_type, count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE) AS sum_value
FROM events
WHERE NOT COALESCE(CAST(ts AS DATE) = DATE '{TT_DELETE_DATE}', FALSE)
  AND NOT COALESCE(CAST(ts AS DATE) = DATE '{TT_REWRITE_DATE}'
                   AND user_id % {TT_COHORT_MOD} = {TT_COHORT_EQ}, FALSE)
GROUP BY event_type
"""
