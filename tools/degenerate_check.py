"""Degenerate-corpus robustness sweep: run every queries() entry AND its
oracle on a corpus where all ten tables are EMPTY (and optionally single-row),
and report any engine/oracle divergence — wrong answers, one-sided exceptions,
or value mismatches.

Motivation (round-8 advisor): the kNN-LSH oracle's in-SQL width law raised
``log2(0)`` on an empty embeddings table while the Spark route returned an
empty frame — an engine/oracle behavioral split invisible at every driver SF
because the fixtures are never empty. Empty inputs are not hypothetical at
100 TB: a partition-pruned scan, a filter that matches nothing, or a fresh
daily drop all hand operators zero rows. Every operator must agree with its
oracle there too.

Usage:

    python tools/degenerate_check.py            # empty corpus, all queries
    python tools/degenerate_check.py name ...   # subset

Exit 0 = every query either matches its oracle or both sides raise the same
way (a both-sides raise is reported for visibility but not a failure — the
driver never runs on empty corpora; a ONE-sided raise or a value mismatch is).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from tf_idf_using_mapreduce_spark.session import get_spark
from tools.canon import canon_rows

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")
SCHEMA_SRC = "/root/testdata/sf0.001"


def build_empty_corpus(out_dir: str) -> None:
    """Empty twins of the driver tables: same parquet schema, zero rows.
    Written as single FILES named ``{table}.parquet`` — the driver fixture
    layout the streaming readers' ``pathGlobFilter`` expects (a
    part-file-in-directory layout silently gives every stream source ZERO
    input files, which made the first sweep's stream rows vacuous)."""
    for t in TABLES:
        src = pq.read_schema(_first_part(f"{SCHEMA_SRC}/{t}.parquet"))
        pq.write_table(src.empty_table(), f"{out_dir}/{t}.parquet")


def build_tiny_corpus(out_dir: str, n_rows: int = 1) -> None:
    """``n_rows``-row twins (first rows of the sf0.001 fixtures) — the
    single-row corpus exercises a different failure class than the empty
    one: n-1 denominators, one-point variance, single-member windows, and
    joins whose first rows don't satisfy the FK they'd need (the OUTPUT may
    be trivially empty; the point is that both engines agree on it)."""
    for t in TABLES:
        tab = pq.read_table(_first_part(f"{SCHEMA_SRC}/{t}.parquet"))
        pq.write_table(tab.slice(0, n_rows), f"{out_dir}/{t}.parquet")


# heuristic: integer id/key columns stay, every payload column goes NULL
_KEY_SUFFIXES = ("_id", "key", "_idx")


def build_null_corpus(out_dir: str, n_rows: int = 8) -> None:
    """``n_rows``-row twins with every NON-KEY column nulled — the third
    failure class: NULL payloads reaching tokenizers, date formatting,
    arithmetic, and aggregation, where the two engines' NULL-propagation
    rules must agree row for row (e.g. Spark and DuckDB both tokenize NULL
    text to NULL, but a downstream ``size()``/``len()`` disagreement or a
    NULL-group split would silently diverge). Ids keep their fixture values
    so joins and groupings still fire."""
    for t in TABLES:
        tab = pq.read_table(_first_part(f"{SCHEMA_SRC}/{t}.parquet")).slice(0, n_rows)
        arrays, fields = [], []
        for field in tab.schema:
            col = tab.column(field.name)
            keep = field.name.endswith(_KEY_SUFFIXES)
            if keep:
                arrays.append(col)
                fields.append(field)
            else:
                nullable = pa.field(field.name, field.type, nullable=True)
                arrays.append(pa.nulls(len(tab), field.type))
                fields.append(nullable)
        pq.write_table(pa.table(arrays, schema=pa.schema(fields)),
                       f"{out_dir}/{t}.parquet")


def _first_part(path: str) -> str:
    if os.path.isfile(path):
        return path
    parts = [p for p in os.listdir(path) if p.endswith(".parquet")]
    return os.path.join(path, sorted(parts)[0])


def run_one(name: str, spark, con, sf_dir: str, fn, sql: str | None) -> str:
    """Returns one of: 'ok', 'both-raise', 'spark-raise', 'duck-raise',
    'mismatch', 'rows-only'."""
    s_err = d_err = None
    spdf = ddf = None
    try:
        spdf = fn(spark, sf_dir).toPandas()
    except Exception as ex:  # noqa: BLE001 — survey sweep, report everything
        s_err = f"{type(ex).__name__}: {str(ex).splitlines()[0][:160]}"
    if sql is None:
        if s_err:
            print(f"  {name}: SPARK RAISED (rows-only) — {s_err}")
            return "spark-raise"
        print(f"  {name}: rows={len(spdf)} (rows-only)")
        return "rows-only"
    try:
        ddf = con.sql(sql).df()
    except Exception as ex:  # noqa: BLE001
        d_err = f"{type(ex).__name__}: {str(ex).splitlines()[0][:160]}"
    if s_err and d_err:
        print(f"  {name}: both raise (spark: {s_err} | duck: {d_err})")
        return "both-raise"
    if s_err:
        print(f"  {name}: SPARK RAISED, oracle fine — {s_err}")
        return "spark-raise"
    if d_err:
        print(f"  {name}: ORACLE RAISED, spark fine — {d_err}")
        return "duck-raise"
    if sorted(spdf.columns) != sorted(ddf.columns) or len(spdf) != len(ddf) \
            or canon_rows(spdf) != canon_rows(ddf):
        print(f"  {name}: MISMATCH spark_rows={len(spdf)} duck_rows={len(ddf)}")
        return "mismatch"
    print(f"  {name}: OK rows={len(spdf)}")
    return "ok"


def main() -> int:
    import __spark_entry__ as e

    args = sys.argv[1:]
    mode = "empty"
    if args and args[0] in ("--empty", "--tiny", "--nulls"):
        mode = args.pop(0).lstrip("-")
    names = args or list(e.queries())
    spark = get_spark("degenerate-check")
    qs, os_ = e.queries(), e.oracle_sql()
    builders = {"empty": build_empty_corpus, "tiny": build_tiny_corpus,
                "nulls": build_null_corpus}
    with tempfile.TemporaryDirectory() as d:
        builders[mode](d)
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
            )
        verdicts = {n: run_one(n, spark, con, d, qs[n], os_.get(n)) for n in names}
    bad = {n: v for n, v in verdicts.items()
           if v in ("spark-raise", "duck-raise", "mismatch")}
    both = [n for n, v in verdicts.items() if v == "both-raise"]
    print(f"\n{mode}-corpus sweep: {len(verdicts)} queries, "
          f"{sum(v == 'ok' for v in verdicts.values())} ok, "
          f"{len(both)} both-raise {both}, {len(bad)} DIVERGENT")
    if bad:
        for n, v in bad.items():
            print(f"  DIVERGENT {n}: {v}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
