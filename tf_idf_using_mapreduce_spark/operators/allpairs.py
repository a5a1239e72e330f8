"""Exact all-pairs cosine top-k via replication-based block matrix multiply —
the engine's generic dense-similarity operator (used by
``tfidf_doc_similarity`` and reusable over any bounded-dimension vector table).

Why not a join? Spark can express all-pairs cosine as (a) a term equi-join
(round 1: O(Σ per-term df²) pair-term rows — 112 s at sf0.1 because the
top-100 DF vocabulary is by construction the hottest terms), or (b) a
broadcast nested-loop self-join with a per-pair dot expression — but a
100-term unrolled dot falls out of whole-stage codegen (huge-method limit)
into interpreted eval (~40 µs/pair measured: ~530 s for the 12.5 M pairs at
sf0.1), and a higher-order-function fold pays a per-element closure. Dense
exact similarity is BLAS-shaped work, so this is one of the few places the
engine deliberately drops to Arrow-batched Python (`applyInPandas`), per the
"built-ins genuinely can't express it efficiently" rule.

Physical shape (the 100-TB design, not just the local one):

1. each (id, vec) row gets a block id ``b = crc32(id) % P``;
2. the row is REPLICATED to every tile it participates in: as the left operand
   of tiles (b, j≥b) and the right operand of tiles (i<b, b) — ONE shuffle of
   n × (P+1)/2 rows total, no n² intermediate;
3. ``groupBy(tile).applyInPandas`` multiplies the ≤(n/P)² tile with numpy
   (`A @ B.T` — vectorized, cache-blocked BLAS) and emits only the tile-local
   top-k pairs;
4. the global top-k over ≤ tiles×k candidate rows is a
   ``TakeOrderedAndProject``.

Wall-clock scales as n²·d/P FLOPs spread over P·(P+1)/2 independent tasks;
memory per task is two (n/P)×d tiles. Pick P ≈ n·d·8 / (executor-task
memory budget) — the operator stays exact at any corpus size, but beyond
~10⁶–10⁷ vectors quadratic FLOPs dominate and the LSH/IVF candidate routes
(``operators/dedup.py``, ``operators/similarity.py``) are the intended path;
this operator is their exact oracle and the bounded-n workhorse.
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BLOCKS = 8


def cosine_topk_pairs(
    vecs: DataFrame,
    top_pairs: int,
    id_col: str = "doc_id",
    vec_col: str = "vec",
    nrm_col: str = "nrm",
    n_blocks: int = DEFAULT_BLOCKS,
    round_dp: int = 4,
) -> DataFrame:
    """(id_a, id_b, cos_sim): the global ``top_pairs`` most-similar distinct
    pairs (id_a < id_b) by cosine, exact, over rows of (id, vector, norm).

    Pairs with an exactly-zero dot product (no shared nonzero dimension) are
    excluded, matching the sparse term-join semantics. ``cos_sim`` is rounded
    to ``round_dp`` BEFORE ranking; ties break on (id_a, id_b) ascending, so
    the result is deterministic and engine-portable.
    """
    P = n_blocks
    tagged = vecs.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), F.col(nrm_col).alias("nrm")
    ).withColumn("b", F.pmod(F.crc32(F.col("id").cast("string")), F.lit(P)).cast("int"))
    left = tagged.select(
        F.explode(
            F.expr(f"transform(sequence(b, {P - 1}), j -> named_struct('bi', b, 'bj', j))")
        ).alias("k"),
        "id", "v", "nrm", F.lit(True).alias("is_left"),
    )
    right = tagged.where(F.col("b") > 0).select(
        F.explode(
            F.expr("transform(sequence(0, b - 1), i -> named_struct('bi', i, 'bj', b))")
        ).alias("k"),
        "id", "v", "nrm", F.lit(False).alias("is_left"),
    )
    repl = left.unionByName(right).select(
        F.col("k.bi").alias("bi"), F.col("k.bj").alias("bj"), "id", "v", "nrm", "is_left"
    )

    def tile(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        bi, bj = int(key[0]), int(key[1])
        empty = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                              "id_b": pd.Series(dtype="int64"),
                              "cos_sim": pd.Series(dtype="float64")})
        lf = pdf[pdf["is_left"]]
        if bi == bj:
            rf = lf
        else:
            rf = pdf[~pdf["is_left"]]
        if lf.empty or rf.empty:
            return empty
        a_ids = lf["id"].to_numpy()
        b_ids = rf["id"].to_numpy()
        A = np.stack(lf["v"].to_numpy())
        B = A if bi == bj else np.stack(rf["v"].to_numpy())
        an = lf["nrm"].to_numpy()
        bn = an if bi == bj else rf["nrm"].to_numpy()
        # Tile-local top-k in ROW CHUNKS, never materializing the full
        # (n/P)² similarity matrix: the sf1.0 sweep measured the
        # full-matrix form at 7.4 s/tile (a 6250² tile is 312 MB — the
        # np.outer division, round, mask and partition each re-stream it
        # from DRAM, and 32 concurrent tasks saturate memory bandwidth)
        # vs 0.8 s chunked, where each 1024×(n/P) slab stays cache-warm.
        # Per-element math is UNCHANGED — dot/(na·nb), round at round_dp,
        # raw-S zero test — chunking only splits the GEMM's row dimension
        # (the summed k-dimension is intact), so parity is untouched.
        # Each chunk keeps its own >=threshold candidates (ties at the
        # cut included); any pair in the tile top-k is in its chunk's
        # top-k, so merging chunk candidates preserves exactness.
        parts = []
        chunk = 1024
        for i0 in range(0, len(a_ids), chunk):
            Sc = (A[i0:i0 + chunk] @ B.T) / np.outer(an[i0:i0 + chunk], bn)
            if bi == bj:
                # same row set on both sides: keep each unordered pair once
                mask = (a_ids[i0:i0 + chunk, None] < b_ids[None, :]) & (Sc != 0.0)
            else:
                # disjoint blocks: every unordered pair appears in exactly
                # this tile; order is normalized below
                mask = Sc != 0.0
            if not mask.any():
                continue
            C = np.round(Sc, round_dp)
            C[~mask] = -np.inf
            flat = C.ravel()
            k = min(top_pairs, flat.size)
            thr = np.partition(flat, flat.size - k)[flat.size - k]
            if thr == -np.inf:
                cand = mask  # fewer than k real pairs: take them all
            else:
                cand = C >= thr
            ia, ib = np.nonzero(cand)
            if ia.size == 0:
                continue
            parts.append((a_ids[i0:i0 + chunk][ia], b_ids[ib], C[ia, ib]))
        if not parts:
            return empty
        ga = np.concatenate([p[0] for p in parts])
        gb = np.concatenate([p[1] for p in parts])
        cos = np.concatenate([p[2] for p in parts])
        id_a = np.minimum(ga, gb)
        id_b = np.maximum(ga, gb)
        order = np.lexsort((id_b, id_a, -cos))[:top_pairs]
        return pd.DataFrame(
            {"id_a": id_a[order], "id_b": id_b[order], "cos_sim": cos[order]}
        )

    candidates = repl.groupBy("bi", "bj").applyInPandas(
        tile, "id_a long, id_b long, cos_sim double"
    )
    return (
        candidates.orderBy(F.desc("cos_sim"), F.asc("id_a"), F.asc("id_b"))
        .limit(top_pairs)
    )


def cosine_nn1(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    nrm_col: str = "nrm",
    n_blocks: int = DEFAULT_BLOCKS,
    round_dp: int = 4,
) -> DataFrame:
    """(id, nn_id, cos_sim): each row's EXACT nearest neighbor by cosine
    (excluding self; zero-dot pairs excluded per the file's sparse-join
    convention; rows with no nonzero-dot neighbor are absent). Same
    replication/tile machinery as :func:`cosine_topk_pairs`, but each tile
    emits the tile-local best neighbor FOR EVERY ROW on both of its sides
    (O(n·P) candidate rows total, not O(n²)), and the global argmax is a
    per-id window over ≤ P candidates. Deterministic: cosine rounded
    before ranking, ties break on nn_id ascending."""
    from pyspark.sql import Window

    P = n_blocks
    tagged = vecs.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), F.col(nrm_col).alias("nrm")
    ).withColumn("b", F.pmod(F.crc32(F.col("id").cast("string")), F.lit(P)).cast("int"))
    left = tagged.select(
        F.explode(
            F.expr(f"transform(sequence(b, {P - 1}), j -> named_struct('bi', b, 'bj', j))")
        ).alias("k"),
        "id", "v", "nrm", F.lit(True).alias("is_left"),
    )
    right = tagged.where(F.col("b") > 0).select(
        F.explode(
            F.expr("transform(sequence(0, b - 1), i -> named_struct('bi', i, 'bj', b))")
        ).alias("k"),
        "id", "v", "nrm", F.lit(False).alias("is_left"),
    )
    repl = left.unionByName(right).select(
        F.col("k.bi").alias("bi"), F.col("k.bj").alias("bj"), "id", "v", "nrm", "is_left"
    )

    def tile(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        bi, bj = int(key[0]), int(key[1])
        empty = pd.DataFrame({"id": pd.Series(dtype="int64"),
                              "nn_id": pd.Series(dtype="int64"),
                              "cos_sim": pd.Series(dtype="float64")})
        lf = pdf[pdf["is_left"]]
        rf = lf if bi == bj else pdf[~pdf["is_left"]]
        if lf.empty or rf.empty:
            return empty
        a_ids = lf["id"].to_numpy()
        b_ids = rf["id"].to_numpy()
        A = np.stack(lf["v"].to_numpy())
        B = A if bi == bj else np.stack(rf["v"].to_numpy())
        an = lf["nrm"].to_numpy()
        bn = an if bi == bj else rf["nrm"].to_numpy()

        def best_per_row(row_ids, M, col_ids):
            # vectorized argmax with (cos desc, id asc) tie-break: among
            # max-cos columns pick the smallest neighbor id
            mx = M.max(axis=1)
            ok = mx != -np.inf
            if not ok.any():
                return [], [], []
            tie = M[ok] == mx[ok][:, None]
            nb = np.where(tie, col_ids[None, :], np.iinfo(np.int64).max).min(axis=1)
            return row_ids[ok].tolist(), nb.tolist(), mx[ok].tolist()

        # Row-chunked like cosine_topk_pairs' tile (see the comment there:
        # cache-resident slabs instead of a full 312 MB tile matrix; the
        # per-element math is unchanged). A row's tile-local best is the
        # (cos desc, id asc)-max over its chunk results, folded below; for
        # off-diagonal tiles the right side's per-row best needs the
        # column view, so each chunk also scans M.T.
        ids, nns, coss = [], [], []
        chunk = 1024
        for i0 in range(0, len(a_ids), chunk):
            Sc = (A[i0:i0 + chunk] @ B.T) / np.outer(an[i0:i0 + chunk], bn)
            valid = (Sc != 0.0) & (a_ids[i0:i0 + chunk, None] != b_ids[None, :])
            C = np.round(Sc, round_dp)
            C[~valid] = -np.inf
            i1, n1, c1 = best_per_row(a_ids[i0:i0 + chunk], C, b_ids)
            ids += i1; nns += n1; coss += c1
            if bi != bj:
                i2, n2, c2 = best_per_row(b_ids, C.T, a_ids[i0:i0 + chunk])
                ids += i2; nns += n2; coss += c2
        if not ids:
            return empty
        if bi != bj and len(a_ids) > chunk:
            # fold the per-chunk bests of the right side's rows (left-side
            # rows appear in exactly one chunk, right-side rows in all)
            df = pd.DataFrame({"id": np.array(ids, dtype="int64"),
                               "nn_id": np.array(nns, dtype="int64"),
                               "cos_sim": np.array(coss, dtype="float64")})
            df = (df.sort_values(["id", "cos_sim", "nn_id"],
                                 ascending=[True, False, True])
                  .drop_duplicates("id", keep="first"))
            ids = df["id"].tolist(); nns = df["nn_id"].tolist()
            coss = df["cos_sim"].tolist()
        return pd.DataFrame({"id": np.array(ids, dtype="int64"),
                             "nn_id": np.array(nns, dtype="int64"),
                             "cos_sim": np.array(coss, dtype="float64")})

    candidates = repl.groupBy("bi", "bj").applyInPandas(
        tile, "id long, nn_id long, cos_sim double"
    )
    w = Window.partitionBy("id").orderBy(F.desc("cos_sim"), F.asc("nn_id"))
    return (
        candidates.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("id", "nn_id", "cos_sim")
    )


__all__: Iterable[str] = ["cosine_topk_pairs", "cosine_nn1", "DEFAULT_BLOCKS"]
