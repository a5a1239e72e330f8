"""Source formats beyond parquet: JSONL (with corrupt-record isolation) and
binary-file dirs feeding the multimodal plumbing."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from tf_idf_using_mapreduce_spark.sources.corpus import read_binary_dir, read_jsonl_corpus


def test_jsonl_corpus_roundtrip_and_corrupt_isolation(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    lines = [json.dumps({"doc_id": i, "text": f"doc number {i} text"}) for i in range(5)]
    lines.insert(3, "{this is not json")
    p.write_text("\n".join(lines) + "\n")

    # cache first: Spark disallows filtering only on _corrupt_record straight
    # off the raw file (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    df = read_jsonl_corpus(spark, str(p)).cache()
    good = df.where(F.col("_corrupt_record").isNull())
    bad = df.where(F.col("_corrupt_record").isNotNull())
    assert good.count() == 5 and bad.count() == 1
    assert {r["doc_id"] for r in good.collect()} == set(range(5))

    # the same pipeline API runs over the jsonl corpus
    from tf_idf_using_mapreduce_spark.operators.tfidf import doc_freq_of

    terms = {r["term"] for r in doc_freq_of(good.select("doc_id", "text")).collect()}
    assert "doc" in terms and "text" in terms  # 'number' stems to 'number'


def test_binary_dir_feeds_multimodal_decode(spark, tmp_path):
    d = tmp_path / "blobs"
    d.mkdir()
    payloads = {f"img{i}.bin": os.urandom(64) for i in range(3)}
    for name, blob in payloads.items():
        (d / name).write_bytes(blob)

    df = read_binary_dir(spark, str(d), glob="*.bin")
    rows = df.select("path", "length", "content").collect()
    assert len(rows) == 3
    assert all(r["length"] == 64 and len(bytes(r["content"])) == 64 for r in rows)

    # plumb through the Arrow decode stub (same shape multimodal_features uses)
    from tf_idf_using_mapreduce_spark.operators.multimodal import _decode_payload

    for r in rows:
        w, h, feats, raw = _decode_payload(bytes(r["content"]))
        assert 32 <= w < 256 and 32 <= h < 256 and len(feats) == 4 == len(raw)
