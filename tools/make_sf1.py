"""Generate a 10×-scale measurement dataset (sf1.0) from the driver's sf0.1.

PURPOSE: SCALING MEASUREMENT ONLY (round-8 verdict item 5 — one more decade
of data as direct evidence for the "linear beyond saturation" / "fixed cost"
claims). Correctness stays pinned to the driver-generated fixtures; nothing
in the engine or its oracles reads this data.

Design — growth must be REALISTIC, not degenerate:
- region/nation: unchanged (TPC-H dimensions don't scale).
- customer/supplier/part/orders/lineitem/events: 10 copies with all keys
  shifted by k·(max_key+1), preserving referential integrity, value
  distributions, and date/hour densities (events get 10× the rows per hour,
  which is what growth looks like).
- documents: 10 copies; copy 0 is verbatim, copies 1-9 get a DETERMINISTIC
  per-document word shuffle (seeded by (doc_id, k)). Exact-duplicate
  STRUCTURE scales linearly (each original dup-pair appears once per copy)
  without making every document a 10-way near-duplicate of itself —
  shuffling destroys shingle n-grams, so MinHash/containment candidate mass
  grows with data, not quadratically with copies.
- embeddings: 10 copies; copies 1-9 are fresh near-orthogonal unit vectors
  (seeded per copy) with the SAME label distribution, matching the fixture
  geometry (neighbor cosines ≈ 0.3-0.4) so LSH/IVF bucket occupancies grow
  the way a real embedding corpus grows.

Output: ``<repo>/.localdata/sf1.0/*.parquet`` (gitignored; ~170 MB).
Usage: ``python tools/make_sf1.py [copies]`` (default 10).
"""

from __future__ import annotations

import os
import random
import sys

import duckdb
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
DST = os.path.join(REPO, ".localdata", "sf1.0")


def _shift_copies(con, table: str, shifts: dict[str, int], copies: int) -> None:
    """UNION of `copies` key-shifted copies, written as one parquet file.

    ``shifts`` maps column → shift amount; FOREIGN keys must use the PARENT
    table's shift (e.g. o_custkey shifts by customer's key-space size), so a
    copy-k order still points at its copy-k customer."""
    cols = [r[0] for r in con.sql(
        f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{table}.parquet')").fetchall()]
    selects = []
    for k in range(copies):
        exprs = []
        for c in cols:
            if c in shifts:
                exprs.append(f"{c} + {k} * {shifts[c]} AS {c}")
            else:
                exprs.append(c)
        selects.append(
            f"SELECT {', '.join(exprs)} FROM read_parquet('{SRC}/{table}.parquet')"
        )
    union = " UNION ALL ".join(selects)
    con.sql(f"COPY ({union}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")


def _documents(con, copies: int) -> None:
    rows = con.sql(
        f"SELECT doc_id, text, lang, source, n_chars FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchall()
    shift = max(r[0] for r in rows if r[0] is not None) + 1
    out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for k in range(copies):
        for doc_id, text, lang, source, n_chars in rows:
            if k == 0:
                new_id, new_text, nc = doc_id, text, n_chars
            else:
                new_id = None if doc_id is None else doc_id + k * shift
                if text is None:
                    new_text, nc = None, n_chars
                else:
                    words = text.split(" ")
                    rng = random.Random((doc_id or 0) * 1000003 + k)
                    rng.shuffle(words)
                    new_text = " ".join(words)
                    nc = len(new_text)
            out["doc_id"].append(new_id)
            out["text"].append(new_text)
            out["lang"].append(lang)
            out["source"].append(source)
            out["n_chars"].append(nc)
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "text": pa.array(out["text"], pa.string()),
            "lang": pa.array(out["lang"], pa.string()),
            "source": pa.array(out["source"], pa.string()),
            "n_chars": pa.array(out["n_chars"], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{DST}/documents.parquet")


def _embeddings(con, copies: int) -> None:
    rows = con.sql(
        f"SELECT vec_id, embedding, label FROM read_parquet('{SRC}/embeddings.parquet')"
    ).fetchall()
    dim = len(rows[0][1])
    shift = max(r[0] for r in rows) + 1
    ids, vecs, labels = [], [], []
    for k in range(copies):
        if k == 0:
            for vid, v, lab in rows:
                ids.append(vid); vecs.append(np.asarray(v, dtype=np.float32)); labels.append(lab)
        else:
            rng = np.random.default_rng(k * 7919)
            fresh = rng.standard_normal((len(rows), dim)).astype(np.float32)
            fresh /= np.linalg.norm(fresh, axis=1, keepdims=True)
            for (vid, _v, lab), nv in zip(rows, fresh):
                ids.append(vid + k * shift); vecs.append(nv); labels.append(lab)
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tbl, f"{DST}/embeddings.parquet")


def main() -> int:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation"):
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))"
            f" TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
    def keyspace(table: str, col: str) -> int:
        return con.sql(
            f"SELECT max({col}) + 1 FROM read_parquet('{SRC}/{table}.parquet')"
        ).fetchone()[0]

    custk = keyspace("customer", "c_custkey")
    suppk = keyspace("supplier", "s_suppkey")
    partk = keyspace("part", "p_partkey")
    ordk = keyspace("orders", "o_orderkey")
    evk = keyspace("events", "event_id")
    userk = keyspace("events", "user_id")
    _shift_copies(con, "customer", {"c_custkey": custk}, copies)
    _shift_copies(con, "supplier", {"s_suppkey": suppk}, copies)
    _shift_copies(con, "part", {"p_partkey": partk}, copies)
    _shift_copies(con, "orders", {"o_orderkey": ordk, "o_custkey": custk}, copies)
    _shift_copies(con, "lineitem",
                  {"l_orderkey": ordk, "l_partkey": partk, "l_suppkey": suppk},
                  copies)
    _shift_copies(con, "events", {"event_id": evk, "user_id": userk}, copies)
    _documents(con, copies)
    _embeddings(con, copies)
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        n = con.sql(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
        print(t, n)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
