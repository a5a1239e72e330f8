"""Multimodal binary plumbing: metadata oracle parity + Arrow decode stub."""

from __future__ import annotations

from tests.conftest import SF_SMOKE, assert_query_matches_oracle
from tf_idf_using_mapreduce_spark.operators import multimodal as mm


def test_meta_oracle_parity(spark):
    assert_query_matches_oracle(spark, "multimodal_meta")


def test_features_oracle_parity(spark):
    assert_query_matches_oracle(spark, "multimodal_features")


def test_features_schema_and_determinism(spark):
    df = mm.multimodal_feature_vectors(spark, SF_SMOKE)
    assert df.schema.simpleString() == (
        "struct<doc_id:bigint,width:int,height:int,features:array<float>>"
    )
    a = sorted((r["doc_id"], r["width"], r["height"]) for r in df.collect())
    b = sorted((r["doc_id"], r["width"], r["height"]) for r in df.collect())
    assert a == b and len(a) == 500
    row = df.where("doc_id = 0").first()
    assert len(row["features"]) == mm.N_FAKE_FEATURES
    assert all(32 <= v < 256 for v in (row["width"], row["height"]))


def test_payload_roundtrip(spark):
    from tf_idf_using_mapreduce_spark.sources.corpus import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").limit(5)
    rows = mm.with_payload(docs).collect()
    for r in rows:
        assert isinstance(r["payload"], bytearray | bytes)
        assert len(bytes(r["payload"])) == r["n_bytes"]
