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


def _decode_payload(payload: bytes) -> tuple[int, int, list[float]]:
    """STUB decoder — deterministic pseudo-decode. A real implementation
    (PIL.Image.open / torchaudio.load / frame sampling) goes here; the
    container has no media libraries, so features derive from md5 bytes.
    """
    digest = hashlib.md5(payload).digest()
    width = 32 + digest[0] % 224          # fake dimensions
    height = 32 + digest[1] % 224
    feats = [x / 2**31 - 1.0 for x in struct.unpack(">4I", digest[:16])]
    return width, height, feats


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, width, height, features array<float>): Arrow-batched decode +
    feature extraction via ``mapInPandas`` — the real plumbing around the stub
    decoder. Rows-only checkable (md5-derived floats are not SQL-friendly)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    payloads = with_payload(docs).select("doc_id", "payload")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_payload(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "features": [d[2] for d in decoded],
                }
            )

    return payloads.mapInPandas(
        decode, "doc_id long, width int, height int, features array<float>"
    )
