"""sf10 spot-decade for the fastest-growing sf1.0 cells (round-11 verdict
item 5): `doc_chunk_dedup` (4.4x on 10x), `multimodal_video_frames` (4.2x),
`source_quality_rollup` (3.9x) are scan-shaped DOCUMENTS-table operators —
one more decade confirms they stay linear and nothing superlinear hides
above sf1.0.

All three read only documents.parquet, so the harness generates ONLY that
table: 10 copies (sf1.0-docs) and 100 copies (sf10-docs) of the driver's
sf0.1 documents via make_sf1's deterministic copy machinery (copy 0
verbatim, copies k>0 per-document seeded word shuffles — dup structure
linear, shingle mass linear). Measures each query min-of-3 at both scales
and prints one JSON line with the 10x-decade ratios; ratio <= ~10 is the
pass bar (linear in data), >> 10 is a scaling bug.

Usage: python tools/sf10_spot.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from tools import make_sf1

QUERIES = ["doc_chunk_dedup", "multimodal_video_frames", "source_quality_rollup"]


def _gen_docs(dst: str, copies: int) -> None:
    if os.path.isfile(os.path.join(dst, "documents.parquet")):
        return
    os.makedirs(dst, exist_ok=True)
    make_sf1.DST = dst
    con = duckdb.connect()
    make_sf1._documents(con, copies)
    con.close()


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    d1 = os.path.join(repo, ".localdata", "sf1_docs")
    d10 = os.path.join(repo, ".localdata", "sf10_docs")
    _gen_docs(d1, 10)
    _gen_docs(d10, 100)

    import __spark_entry__ as e
    from tf_idf_using_mapreduce_spark.session import get_spark

    spark = get_spark("sf10-spot")
    qs = e.queries()
    out: dict[str, dict] = {}
    for name in QUERIES:
        row: dict[str, float] = {}
        for label, sf_dir in (("sf1.0", d1), ("sf10", d10)):
            qs[name](spark, sf_dir).collect()  # warm: codegen + file listing
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                qs[name](spark, sf_dir).collect()
                best = min(best, time.time() - t0)
            row[label] = round(best, 3)
        row["ratio"] = round(row["sf10"] / row["sf1.0"], 2)
        out[name] = row
        print(f"  {name}: sf1.0={row['sf1.0']}s sf10={row['sf10']}s "
              f"ratio={row['ratio']}x", file=sys.stderr)
    print(json.dumps({"metric": "sf10_spot_decade", "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
