"""Sequence packing / chunking (training-data extension): the step between a
curated corpus and training shards — split long documents to the model's
context length, and pack the token stream into fixed-length sequences.

Scale design (100 TB):
- ``doc_chunks`` is MAP-ONLY: chunking is per-document array math, no
  exchange at any corpus size.
- ``pack_sequences`` needs a GLOBAL prefix sum (each document's token offset
  in the concatenated corpus). A bare ``Window.orderBy`` with no partition
  key would drag the whole table into ONE task — the classic scale killer —
  so it runs the standard two-phase distributed prefix sum instead:
  range-partition by the pack order, per-partition token subtotals (one tiny
  row per partition) broadcast back as offsets, then a WITHIN-partition
  running sum. The only global state is the per-partition subtotal list —
  O(partitions), not O(rows). The DuckDB oracle is the plain window cumsum,
  which proves the two-phase plan computes the identical prefix sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tf_idf_using_mapreduce_spark.sources.corpus import load_table

_TOKENS = "regexp_extract_all(lower(text), '([a-z]+)', 1)"  # both dialects

CHUNK_LEN = 50    # tokens per document chunk (stand-in for context length)
MAX_SEQ = 256     # tokens per packed training sequence


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, chunk_idx, n_tokens, chunk_text): each document split into
    consecutive ``CHUNK_LEN``-token chunks — the split-to-context-length
    step. Map-only (per-row array math); documents with no tokens produce
    no chunks. The chunk expression is CASE-guarded (total) like the
    shingle/bigram expressions."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    k = CHUNK_LEN
    return (
        docs.select("doc_id", F.expr(_TOKENS).alias("toks"))
        .select(
            "doc_id",
            "toks",
            F.explode(
                F.expr(
                    "CASE WHEN size(toks) > 0 THEN "
                    f"sequence(0, cast(ceil(size(toks) / {k}.0) as int) - 1) "
                    "ELSE array() END"
                )
            ).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.expr(f"size(slice(toks, chunk_idx * {k} + 1, {k}))").alias("n_tokens"),
            F.expr(f"concat_ws(' ', slice(toks, chunk_idx * {k} + 1, {k}))").alias("chunk_text"),
        )
    )


DOC_CHUNKS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKENS} AS toks FROM documents
),
ix AS (
  SELECT doc_id, toks,
         unnest(range(0, CAST(ceil(len(toks) / {CHUNK_LEN}.0) AS INT))) AS chunk_idx
  FROM toks WHERE len(toks) > 0
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(len(list_slice(toks, chunk_idx * {CHUNK_LEN} + 1,
                           chunk_idx * {CHUNK_LEN} + {CHUNK_LEN})) AS BIGINT) AS n_tokens,
       array_to_string(list_slice(toks, chunk_idx * {CHUNK_LEN} + 1,
                                  chunk_idx * {CHUNK_LEN} + {CHUNK_LEN}), ' ') AS chunk_text
FROM ix
"""


def _token_offsets(spark: SparkSession, sf_dir: str, n_partitions: int = 8) -> DataFrame:
    """(doc_id, n, start): each document's token count and its exclusive
    prefix sum in doc_id order — the DISTRIBUTED two-phase prefix sum.
    Phase 1: range-partition by doc_id, subtotal per partition (tiny).
    Phase 2: broadcast the partition offsets back, run the window WITHIN
    each partition only. No single-task global window anywhere."""
    counts = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.expr(f"size({_TOKENS})").alias("n"))
        .repartitionByRange(n_partitions, "doc_id")
        .withColumn("pid", F.spark_partition_id())
    )
    # one row per partition: (pid, subtotal); running offset via a window
    # over the TINY partition table (O(partitions) rows, not O(docs))
    part_totals = counts.groupBy("pid").agg(F.sum("n").alias("subtotal"))
    w_parts = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = part_totals.withColumn(
        "part_offset", F.coalesce(F.sum("subtotal").over(w_parts), F.lit(0))
    ).select("pid", "part_offset")
    w_in = (
        Window.partitionBy("pid").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        counts.join(F.broadcast(offsets), "pid")
        .withColumn("start", F.col("part_offset") + F.coalesce(F.sum("n").over(w_in), F.lit(0)))
        .select("doc_id", "n", "start")
    )


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(seq_id, n_docs, n_tokens): concatenate the corpus token stream in
    doc_id order and split it into ``MAX_SEQ``-token training sequences —
    exactly how LLM pretraining packs documents (a doc may straddle two
    sequences). Each document expands to the bins it overlaps (≤ a few per
    doc), then one groupBy; the prefix sum underneath is the two-phase
    distributed form (see ``_token_offsets``)."""
    m = MAX_SEQ
    spans = _token_offsets(spark, sf_dir).where(F.col("n") > 0)
    binned = spans.select(
        "doc_id", "n", "start",
        F.explode(
            F.expr(f"sequence(cast(floor(start / {m}) as long), "
                   f"cast(floor((start + n - 1) / {m}) as long))")
        ).alias("seq_id"),
    )
    overlap = F.expr(
        f"least(start + n, (seq_id + 1) * {m}) - greatest(start, seq_id * {m})"
    )
    return (
        binned.groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(overlap).alias("n_tokens"),
        )
    )


PACK_SEQUENCES_ORACLE = f"""
WITH counts AS (
  SELECT doc_id, len({_TOKENS}) AS n FROM documents
),
spans AS (
  SELECT doc_id, n,
         CAST(coalesce(sum(n) OVER (ORDER BY doc_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS start
  FROM counts
),
binned AS (
  SELECT doc_id, n, start,
         unnest(range(CAST(floor(start / {MAX_SEQ}) AS BIGINT),
                      CAST(floor((start + n - 1) / {MAX_SEQ}) AS BIGINT) + 1)) AS seq_id
  FROM spans WHERE n > 0
)
SELECT seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(least(start + n, (seq_id + 1) * {MAX_SEQ})
                - greatest(start, seq_id * {MAX_SEQ})) AS BIGINT) AS n_tokens
FROM binned GROUP BY seq_id
"""
