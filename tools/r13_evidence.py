"""Round-13 measurement session (verdict items 3 and 5), one quiet
sequential Spark session, two sections:

1. TRIAGE — the five cells the round-12 driver bench read >= 1.45x their
   round-11 values, re-measured min-of-5 at sf0.1 with every raw pass
   recorded (the r12 protocol: "host noise" must be re-earned each round,
   not asserted).

2. DECADES — sf1.0 -> sf10 rows for the persisted-index probes, the
   skew-join twins, and the round-13 operators (partitioned-layout pair,
   compaction round trip, persisted phash). Documents-shaped queries run on
   the 10x/100x documents-only corpora (tools/sf10_spot.py machinery);
   events-shaped queries on 10x/100x key-shifted events copies
   (tools/make_sf1._shift_copies — referential integrity and per-hour
   density preserved, so the partition layout keeps its 30 directories with
   100x the rows each: growth in DATA, not in partition count, which is
   exactly the 100 TB shape). Write-once state (persisted indexes,
   partitioned tables) builds during the warm pass; min-of-3 then measures
   the PROBE — the recurring daily cost the tier exists to bound.

Usage: python tools/r13_evidence.py  (writes r13_evidence.json, ~15 min)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from tools import make_sf1
from tools.sf10_spot import _gen_docs

TRIAGE = [
    "doc_freq_top100",
    "pos_counts_penn",
    "dedup_embedding_ivf",
    "pretraining_shards",
    "dedup_minhash_lsh",
]

DOCS_DECADE = [
    "dedup_incremental_persisted",
    "dedup_incremental_bloom_persisted",
    "dedup_image_phash_incremental_persisted",
    "compaction_roundtrip",
]

EVENTS_DECADE = [
    "events_segment_revenue",
    "events_segment_revenue_salted",
    "events_daily_partitioned",
    "events_daily_partitioned_dpp",
]


def _gen_events(dst: str, copies: int) -> None:
    """Events-only k-shifted copies (make_sf1's machinery, one table)."""
    if os.path.isfile(os.path.join(dst, "events.parquet")):
        return
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def keyspace(col: str) -> int:
        return con.sql(
            f"SELECT max({col}) + 1 FROM read_parquet('{make_sf1.SRC}/events.parquet')"
        ).fetchone()[0]

    old_dst = make_sf1.DST
    make_sf1.DST = dst
    try:
        make_sf1._shift_copies(
            con, "events",
            {"event_id": keyspace("event_id"), "user_id": keyspace("user_id")},
            copies,
        )
    finally:
        make_sf1.DST = old_dst
    con.close()


def _measure(spark, qs, names, sf_dirs: dict[str, str], passes: int) -> dict:
    out: dict[str, dict] = {}
    for name in names:
        row: dict = {}
        for label, sf_dir in sf_dirs.items():
            qs[name](spark, sf_dir).collect()  # warm: codegen/listing/builds
            times = []
            for _ in range(passes):
                t0 = time.time()
                qs[name](spark, sf_dir).collect()
                times.append(round(time.time() - t0, 3))
            row[label] = {"min": min(times), "passes": times}
        if len(sf_dirs) == 2:
            a, b = list(sf_dirs)
            row["ratio"] = round(row[b]["min"] / max(row[a]["min"], 1e-9), 2)
        out[name] = row
        print(f"  {name}: " + " ".join(
            f"{k}={v['min']}s" for k, v in row.items() if isinstance(v, dict)
        ) + (f" ratio={row['ratio']}x" if "ratio" in row else ""),
            file=sys.stderr)
    return out


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    d_docs1 = os.path.join(repo, ".localdata", "sf1_docs")
    d_docs10 = os.path.join(repo, ".localdata", "sf10_docs")
    d_ev1 = os.path.join(repo, ".localdata", "sf1_events")
    d_ev10 = os.path.join(repo, ".localdata", "sf10_events")
    _gen_docs(d_docs1, 10)
    _gen_docs(d_docs10, 100)
    _gen_events(d_ev1, 10)
    _gen_events(d_ev10, 100)

    import __spark_entry__ as e
    from tf_idf_using_mapreduce_spark.session import get_spark

    spark = get_spark("r13-evidence")
    qs = e.queries()

    print("== triage: min-of-5 at sf0.1 ==", file=sys.stderr)
    triage = _measure(spark, qs, TRIAGE,
                      {"sf0.1": "/root/testdata/sf0.1"}, passes=5)
    print("== decades: documents 10x -> 100x ==", file=sys.stderr)
    docs = _measure(spark, qs, DOCS_DECADE,
                    {"sf1.0": d_docs1, "sf10": d_docs10}, passes=3)
    print("== decades: events 10x -> 100x ==", file=sys.stderr)
    ev = _measure(spark, qs, EVENTS_DECADE,
                  {"sf1.0": d_ev1, "sf10": d_ev10}, passes=3)

    # verdict item 5's plan re-assert AT sf10: the bloom probe still bucket-
    # prunes the persisted index and never rescans/reshuffles the historical
    # side even at 100x the corpus
    import re as _re

    df = qs["dedup_incremental_bloom_persisted"](spark, d_docs10)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = _re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    plan_sf10 = {
        "selected_buckets": m.group(0) if m else None,
        "pruning_bites": bool(m) and int(m.group(1)) < int(m.group(2)),
        "no_index_key_reshuffle": not _re.search(r"hashpartitioning\(h#", plan),
        "broadcast_probe": "BroadcastHashJoin" in plan,
    }
    print(f"  sf10 plan: {plan_sf10}", file=sys.stderr)

    result = {"metric": "r13_evidence", "triage_min_of_5_sf0.1": triage,
              "docs_decade": docs, "events_decade": ev,
              "bloom_persisted_plan_at_sf10": plan_sf10}
    with open(os.path.join(repo, "r13_evidence.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({"ok": True}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
