"""Streaming corpus ingest: the documents table arriving as a file stream,
with curation applied AT INGEST TIME — the shape a 100 TB training-data
pipeline actually wants (filter while landing, not in a post-hoc batch pass
over already-persisted data).

The curation cascade (``operators/curation.py:curation_decide``) is stateless
per-row expression work, so the IDENTICAL expression tree runs under
Structured Streaming with no watermark and no state store: each microbatch is
a map-only pass, and a crawler that lands files continuously gets its
keep/drop decisions continuously. Correctness is pinned by the batch oracle —
a finite stream over the same files must produce the exact same decisions as
the batch operator (``curation_filter``'s DuckDB oracle), which is what the
registry checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tf_idf_using_mapreduce_spark.operators.curation import curation_decide
from tf_idf_using_mapreduce_spark.streaming.events import run_stream_to_memory

# explicit schema: a streaming parquet source cannot infer one
DOCUMENTS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream reader over the documents parquet — at production scale
    this is the landing directory a crawler appends to; availableNow drains
    whatever has arrived and terminates."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def documents_stream_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, reason, keep): the curation cascade evaluated ON THE STREAM —
    same expression tree, same oracle as the batch ``curation_filter``.
    Stateless (no watermark, no state store): microbatches are map-only, so
    ingest-time filtering adds zero shuffle at any corpus size."""
    stream = read_documents_stream(spark, sf_dir).select("doc_id", "text")
    result_name = "documents_stream_curation_result"
    run_stream_to_memory(curation_decide(stream), result_name, output_mode="append")
    return spark.table(result_name)


def documents_stream_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bucket, split): train/val/test assignment evaluated ON THE
    STREAM — same content-hash expression tree, same oracle as the batch
    ``train_val_test_split``. Because the split hashes CONTENT, streaming
    assignment is order-independent by construction: whatever microbatch a
    document lands in, it gets the identical split it would get in batch —
    exactly why id- or arrival-order-based splits can't run at ingest time.
    Stateless map-only microbatching, zero shuffle at any rate."""
    from tf_idf_using_mapreduce_spark.operators.release import split_assignment_df

    stream = read_documents_stream(spark, sf_dir).select("doc_id", "text")
    result_name = "documents_stream_split_result"
    run_stream_to_memory(split_assignment_df(stream), result_name, output_mode="append")
    return spark.table(result_name)


def documents_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(text_hash, n_docs, canonical_doc_id): EXACT dedup maintained ON THE
    STREAM — the ingest-time survivor election (content-hash groups with
    min-doc_id winners) updated every microbatch, against the same oracle
    as the batch ``dedup_exact``. Unlike the stateless twins above this is
    a genuinely STATEFUL streaming aggregation (running per-hash counts +
    min), held in the state store keyed by the uniform content hash; the
    min-aggregate makes the result arrival-order independent, which is
    what lets one oracle pin both engines. Complete output mode because
    the result IS the running dedup table a landing pipeline reads back.
    State size is O(distinct hashes) BY DESIGN — this state is the dedup
    index itself (16-byte key + two counters per distinct document, ~30 GB
    per billion docs, RocksDB-backed state store territory at 100 TB);
    the alternative — rebuilding the index per batch from the persisted
    corpus — is exactly what ``dedup_incremental`` shows how to avoid."""
    stream = read_documents_stream(spark, sf_dir).select("doc_id", "text")
    result_name = "documents_stream_dedup_result"
    run_stream_to_memory(dedup_state_agg(stream), result_name, output_mode="complete")
    return spark.table(result_name)


def dedup_state_agg(stream: DataFrame) -> DataFrame:
    """The stateful dedup-index aggregation of :func:`documents_stream_dedup`
    over any (doc_id, text) stream — factored out so the checkpoint-recovery
    test (tests/test_streaming.py) drives the EXACT operator expression
    through a kill-and-restart instead of a lookalike."""
    from pyspark.sql import functions as F

    return stream.groupBy(F.md5("text").alias("text_hash")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("canonical_doc_id"),
    )


def documents_stream_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, quality_prob, quality_label): the model-based quality filter
    evaluated ON THE STREAM — same expression tree, same oracle as the
    batch ``quality_classifier``. Completes the ingest-time curation set
    (cascade → quality model → PII scrub → split → dedup index): a crawler
    gets keep/drop probabilities while data lands, and a trained model
    swaps in as constants through the same seam as the batch form.
    Stateless map-only microbatching, zero shuffle at any rate."""
    from tf_idf_using_mapreduce_spark.operators.textstats import quality_classifier_df

    stream = read_documents_stream(spark, sf_dir).select("doc_id", "text")
    result_name = "documents_stream_quality_result"
    run_stream_to_memory(quality_classifier_df(stream), result_name, output_mode="append")
    return spark.table(result_name)


def documents_stream_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, clean_text, n_emails, n_ips, n_digitruns): the PII scrub
    evaluated ON THE STREAM — same expression tree, same oracle as the
    batch ``pii_redaction``. Like the curation cascade it is stateless
    map-only microbatching: scrubbing happens while data lands, so raw PII
    never persists past the landing zone (the compliance posture a real
    pipeline wants), and the transform adds zero shuffle at any rate."""
    from tf_idf_using_mapreduce_spark.operators.curation import pii_redaction_df

    stream = read_documents_stream(spark, sf_dir).select("doc_id", "text")
    result_name = "documents_stream_pii_result"
    run_stream_to_memory(pii_redaction_df(stream), result_name, output_mode="append")
    return spark.table(result_name)


def documents_stream_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, ph_hi, ph_lo): the multimodal perceptual-hash index built AT
    INGEST TIME — the image tier's Arrow-batched decode + aHash seam
    (``operators/multimodal.py:image_phash_df``) running unchanged on the
    file stream, proving the multimodal decode path is streaming-safe:
    ``mapInPandas`` is stateless, so microbatches stay map-only (no
    watermark, no state store, zero shuffle at any landing rate). In
    production this is how payload near-dup INDEXING keeps up with a
    crawler: hash on landing, probe the write-once index incrementally
    (``dedup_image_phash_incremental``), never re-scan the corpus. The audio
    fingerprint and video keyframe tables ride the identical seam. Pinned by
    the same DuckDB oracle as the batch ``multimodal_phash``."""
    from tf_idf_using_mapreduce_spark.operators.multimodal import image_phash_df

    stream = read_documents_stream(spark, sf_dir).select("doc_id", "text")
    result_name = "documents_stream_phash_result"
    run_stream_to_memory(image_phash_df(stream), result_name, output_mode="append")
    return spark.table(result_name)


def documents_stream_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_chunks, n_dropped, clean_text): intra-document repeated-
    chunk removal evaluated ON THE STREAM — same expression tree, same
    oracle as the batch ``doc_chunk_dedup``. The edit is per-document array
    math, so it needs no cross-document state at all: stateless map-only
    microbatching (no watermark, no state store, zero shuffle at any
    landing rate). In production this runs at ingest so the landing zone
    already holds repetition-scrubbed text, the same compliance posture as
    the streaming PII scrub."""
    from tf_idf_using_mapreduce_spark.operators.packing import doc_chunk_dedup_df

    stream = read_documents_stream(spark, sf_dir).select("doc_id", "text")
    result_name = "documents_stream_chunk_dedup_result"
    run_stream_to_memory(doc_chunk_dedup_df(stream), result_name, output_mode="append")
    return spark.table(result_name)
