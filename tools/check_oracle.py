"""Local replica of the driver's correctness gate: run each queries() entry on
Spark and its oracle_sql() on DuckDB at a given SF, compare row count, column
names, and an order-insensitive value multiset. Usage:

    python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from tf_idf_using_mapreduce_spark.session import get_spark
from tools.canon import assert_hashable, canon_rows


def compare(name: str, spark, con, sf_dir: str, fn, sql: str | None) -> bool:
    t0 = time.time()
    sdf = fn(spark, sf_dir)
    spdf = sdf.toPandas()  # through pandas, like the driver
    scols = sorted(spdf.columns)
    t_spark = time.time() - t0
    if sql is None:
        # the driver still canonicalizes rows-only results — probe hashability
        try:
            assert_hashable(spdf)
        except TypeError as ex:
            print(f"  {name}: ROWS-ONLY UNHASHABLE ({ex}) — driver will record err")
            return False
        print(f"  {name}: rows={len(spdf)} (rows-only, {t_spark:.1f}s)")
        return True
    t0 = time.time()
    rel = con.sql(sql)
    ddf = rel.df()  # through pandas, like the driver (HUGEINT -> float64 etc.)
    dcols = sorted(ddf.columns)
    t_duck = time.time() - t0
    ok = True
    if scols != dcols:
        print(f"  {name}: SCHEMA MISMATCH spark={scols} duck={dcols}")
        ok = False
    if len(spdf) != len(ddf):
        print(f"  {name}: ROWCOUNT MISMATCH spark={len(spdf)} duck={len(ddf)}")
        ok = False
    if ok:
        try:
            s_set = canon_rows(spdf)
            d_set = canon_rows(ddf)
        except TypeError as ex:
            print(f"  {name}: UNHASHABLE COLUMN ({ex}) — driver will record err")
            return False
        if s_set != d_set:
            diffs = [(a, b) for a, b in zip(s_set, d_set) if a != b][:5]
            print(f"  {name}: VALUE MISMATCH (first diffs: {diffs})")
            ok = False
    status = "OK" if ok else "FAIL"
    print(f"  {name}: {status} rows={len(spdf)} spark={t_spark:.1f}s duck={t_duck:.1f}s")
    return ok


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as e

    names = sys.argv[2:] or list(e.queries())
    unknown = [n for n in names if n not in e.queries()]
    if unknown:
        print(f"unknown queries: {unknown}; available: {sorted(e.queries())}")
        return 2
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    qs, os_ = e.queries(), e.oracle_sql()
    failed = []
    for name in names:
        if not compare(name, spark, con, sf_dir, qs[name], os_.get(name)):
            failed.append(name)
    print("FAILED:" if failed else "ALL OK", failed if failed else "")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
