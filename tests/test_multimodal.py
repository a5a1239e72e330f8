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


# --------------------------------------------------------------------------- #
# round-11: perceptual-hash image near-dup (aHash + hamming banding)
# --------------------------------------------------------------------------- #

def test_multimodal_phash_oracle_parity(spark):
    assert_query_matches_oracle(spark, "multimodal_phash")


def test_dedup_image_phash_oracle_parity(spark):
    assert_query_matches_oracle(spark, "dedup_image_phash")


def _phash_corpus(spark, rows):
    import tempfile

    import duckdb

    import __spark_entry__ as e
    from tools.canon import canon_rows

    df = spark.createDataFrame(rows, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as tmp:
        df.coalesce(1).write.parquet(f"{tmp}/documents.parquet")
        pairs = mm.dedup_image_phash(spark, tmp).toPandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp}/documents.parquet/*.parquet')"
        )
        ora = con.sql(e.oracle_sql()["dedup_image_phash"]).df()
        con.close()
    assert canon_rows(pairs) == canon_rows(ora)
    return pairs


def test_dedup_image_phash_finds_reencoded_and_perturbed_payloads(spark):
    """The near-dup-injection scenario (r10 verdict #2): payload A, its
    RE-ENCODE D (same letters, different case/punctuation — byte-identical
    after decode, hamming 0), and a PERTURBED copy B (one 4-byte grid cell
    rewritten low->high: exactly one aHash bit flips). All three must pair
    within the threshold; an unrelated payload C pairs with nothing; and the
    oracle reproduces the pair set on the injected corpus."""
    # 64 chunks x 4 chars: alternating low ('a') / high ('z') cells keeps
    # every cell mean far from the global mean, so the one engineered flip
    # is the ONLY flip
    a_letters = "".join(("aaaa" if j % 2 == 0 else "zzzz") for j in range(64))
    b_letters = "zzzz" + a_letters[4:]           # cell 0 rewritten -> bit 0 flips
    d_text = " ".join(a_letters[i:i + 8].upper() + "," for i in range(0, 256, 8))
    c_letters = "".join(
        chr(97 + (j * 11) % 26) * 4 for j in range(64)
    )  # unrelated spread-out grid
    pairs = _phash_corpus(spark, [
        (1, a_letters), (2, b_letters), (3, c_letters), (4, d_text),
    ])
    got = {(r.doc_a, r.doc_b): r.hamming for r in pairs.itertuples()}
    assert got == {(1, 2): 1, (1, 4): 0, (2, 4): 1}


def test_dedup_image_phash_short_payloads_not_decodable(spark):
    """Payloads below PHASH_MIN_BYTES have no 8x8 grid: they are excluded on
    both engines rather than hashed degenerately."""
    short = "ab " * 10  # 20 letters < 64
    pairs = _phash_corpus(spark, [(1, short), (2, short), (3, None)])
    assert len(pairs) == 0


def test_dedup_image_phash_hot_bucket_cap_mirrored(spark):
    """A degenerate payload shared by more docs than LSH_BUCKET_CAP saturates
    every band bucket and is amputated before pair expansion — candidate
    mass stays bounded, and the oracle mirrors the (here: empty) output."""
    from tf_idf_using_mapreduce_spark.operators.dedup import LSH_BUCKET_CAP

    boiler = "".join(("mmmm" if j % 3 == 0 else "qqqq") for j in range(64))
    rows = [(d, boiler) for d in range(LSH_BUCKET_CAP + 7)]
    pairs = _phash_corpus(spark, rows)
    assert len(pairs) == 0


def test_dedup_image_phash_incremental_oracle_parity(spark):
    assert_query_matches_oracle(spark, "dedup_image_phash_incremental")


def test_dedup_image_phash_incremental_probes_index_only(spark):
    """Daily-ingest contract: batch payloads (doc_id % 5 == 0) pair against
    the INDEX only — a batch-internal duplicate pair is out of contract, an
    index near-dup is found with the exact hamming. Oracle cross-checked on
    the injected corpus via the registered twin."""
    import tempfile

    import duckdb

    import __spark_entry__ as e
    from tools.canon import canon_rows

    a_letters = "".join(("aaaa" if j % 2 == 0 else "zzzz") for j in range(64))
    b_letters = "zzzz" + a_letters[4:]  # one aHash bit from A
    c_letters = "".join(chr(97 + (j * 11) % 26) * 4 for j in range(64))
    rows = [
        (1, a_letters),   # index
        (2, c_letters),   # index, unrelated
        (5, b_letters),   # batch: near-dup of index doc 1
        (10, b_letters),  # batch: identical to doc 5 (batch-internal pair)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as tmp:
        df.coalesce(1).write.parquet(f"{tmp}/documents.parquet")
        got = mm.dedup_image_phash_incremental(spark, tmp).toPandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp}/documents.parquet/*.parquet')"
        )
        ora = con.sql(e.oracle_sql()["dedup_image_phash_incremental"]).df()
        con.close()
    pairs = {(r.doc_id, r.dup_of): r.hamming for r in got.itertuples()}
    assert pairs == {(5, 1): 1, (10, 1): 1}  # no (5,10)/(10,5) batch pair
    assert canon_rows(got) == canon_rows(ora)
