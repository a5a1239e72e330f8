"""Multimodal column plumbing (SURVEY.md §7.2 extension): image/audio/video as
opaque ``binary`` payloads with typed metadata, decoded/feature-extracted via
Arrow-batched ``mapInPandas``.

The container ships no image/audio libraries, so the DECODE step is a
deterministic fake (md5-derived pseudo-features) behind ``decode_stub`` —
clearly marked; swap :func:`_decode_payload` for a real decoder (PIL,
torchaudio, …) in production. Everything Spark-side — schema contracts, binary
casting, Arrow batch shapes, partitioning — is real and tested.

The fixture set has no binary table; payloads are synthesized from
``documents.text`` (utf-8 bytes), which keeps the oracle checkable: byte
lengths and hashes of the payload are computable by DuckDB on the same rows.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tf_idf_using_mapreduce_spark.sources.corpus import load_table

N_FAKE_FEATURES = 4


def with_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload binary, n_bytes): the opaque-binary column contract."""
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.expr("octet_length(text)").alias("n_bytes"),
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_bytes, payload_md5, modality): typed metadata over the
    binary payload — the catalog-facing face of a multimodal table."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    payloads = with_payload(docs)
    return payloads.select(
        "doc_id",
        "n_bytes",
        F.md5("payload").alias("payload_md5"),
        # deterministic synthetic modality tag (stands in for magic-byte sniffing)
        F.expr("CASE WHEN n_bytes % 3 = 0 THEN 'image' WHEN n_bytes % 3 = 1 THEN 'audio' ELSE 'video' END").alias("modality"),
    )


MULTIMODAL_META_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS payload_md5,
       CASE WHEN octet_length(encode(text)) % 3 = 0 THEN 'image'
            WHEN octet_length(encode(text)) % 3 = 1 THEN 'audio'
            ELSE 'video' END AS modality
FROM documents
"""


def _decode_payload(payload: bytes) -> tuple[int, int, list[float], tuple[int, ...]]:
    """STUB decoder — deterministic pseudo-decode. A real implementation
    (PIL.Image.open / torchaudio.load / frame sampling) goes here; the
    container has no media libraries, so features derive from md5 bytes.

    Returns (width, height, float features, raw uint32 feature words). The
    raw words are the exact-integer form the registry-facing query exposes so
    the result is both hashable and recomputable by the DuckDB oracle.
    """
    digest = hashlib.md5(payload).digest()
    width = 32 + digest[0] % 224          # fake dimensions
    height = 32 + digest[1] % 224
    raw = struct.unpack(">4I", digest[:16])
    feats = [x / 2**31 - 1.0 for x in raw]
    return width, height, feats, raw


def multimodal_feature_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, width, height, features array<float>): the library-facing
    API — Arrow-batched decode + feature extraction via ``mapInPandas``."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    payloads = with_payload(docs).select("doc_id", "payload")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # a NULL payload (e.g. NULL source text) cannot be decoded:
            # emit NULL features, keep the row — both engines' rule
            decoded = [None if p is None else _decode_payload(bytes(p))
                       for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": [None if d is None else d[0] for d in decoded],
                    "height": [None if d is None else d[1] for d in decoded],
                    "features": [None if d is None else d[2] for d in decoded],
                }
            )

    return payloads.mapInPandas(
        decode, "doc_id long, width int, height int, features array<float>"
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, width, height, feat_sig): registry-facing twin of
    :func:`multimodal_feature_vectors` — same ``mapInPandas`` decode, but the
    feature vector is exposed as its exact-integer uint32 words joined with
    commas. That keeps every column hashable (the driver's canonicalizer
    chokes on array columns) and lets DuckDB recompute the identical values
    from the md5 hex string, so this query is fully oracle-checked instead of
    rows-only."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    payloads = with_payload(docs).select("doc_id", "payload")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payload → NULL features, row kept (see
            # multimodal_feature_vectors; the oracle's CASE mirrors this)
            decoded = [None if p is None else _decode_payload(bytes(p))
                       for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": [None if d is None else d[0] for d in decoded],
                    "height": [None if d is None else d[1] for d in decoded],
                    "feat_sig": [None if d is None
                                 else ",".join(str(u) for u in d[3])
                                 for d in decoded],
                }
            )

    return payloads.mapInPandas(
        decode, "doc_id long, width int, height int, feat_sig string"
    )


# DuckDB recomputes the stub decode from md5(text)'s hex digits:
# byte i of the digest is CAST('0x' || substr(hex, 2i+1, 2) AS INTEGER), and
# each big-endian uint32 word is an 8-hex-digit slice.
# the CASE mirrors the engine's NULL-payload rule (NULL text → NULL
# features, row kept): without it, concat_ws over four NULL words yields ''
# while the arithmetic columns yield NULL — a mixed row no engine produces
MULTIMODAL_FEATURES_ORACLE = """
WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents)
SELECT doc_id,
       32 + CAST(('0x' || substr(hx, 1, 2)) AS INTEGER) % 224 AS width,
       32 + CAST(('0x' || substr(hx, 3, 2)) AS INTEGER) % 224 AS height,
       CASE WHEN hx IS NULL THEN NULL ELSE
         concat_ws(',',
                   CAST(('0x' || substr(hx, 1, 8)) AS BIGINT),
                   CAST(('0x' || substr(hx, 9, 8)) AS BIGINT),
                   CAST(('0x' || substr(hx, 17, 8)) AS BIGINT),
                   CAST(('0x' || substr(hx, 25, 8)) AS BIGINT)) END AS feat_sig
FROM h
"""
