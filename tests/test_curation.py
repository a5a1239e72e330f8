"""Curation operators: oracle parity + the composite-filter decision cascade."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE, assert_query_matches_oracle
from tf_idf_using_mapreduce_spark.operators import curation as cur


@pytest.mark.parametrize(
    "name",
    ["train_eval_contamination", "stratified_sample", "vocab_coverage",
     "doc_repetition", "curation_filter", "dedup_apply",
     "source_mixture", "mixture_sample"],
)
def test_oracle_parity(spark, name):
    assert_query_matches_oracle(spark, name)


def test_source_mixture_shares_sum_to_one(spark):
    rows = cur.source_mixture(spark, SF_SMOKE).collect()
    assert rows
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-3


def test_mixture_sample_tracks_rates(spark):
    """Per-source keep fraction must track the declared rate
    (N mod 4 + 1)/4 within hash-Bernoulli noise, and be deterministic."""
    from tf_idf_using_mapreduce_spark.sources.corpus import load_table

    totals = {r["source"]: r["cnt"] for r in
              load_table(spark, SF_SMOKE, "documents")
              .groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    kept1 = cur.mixture_sample(spark, SF_SMOKE).collect()
    kept2 = cur.mixture_sample(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, kept1)) == sorted(map(tuple, kept2))  # reproducible
    by_src = {}
    for r in kept1:
        by_src[r["source"]] = by_src.get(r["source"], 0) + 1
    for src, total in totals.items():
        rate = ((int(src[3:]) % 4) + 1) / 4.0
        frac = by_src.get(src, 0) / total
        # 25 docs/source at smoke SF: allow wide hash-noise band around rate
        assert abs(frac - rate) <= 0.35, (src, rate, frac)


def test_curation_cascade_order(spark, duck, tmp_path):
    """All four branches of the decision cascade, and their precedence:
    a document failing MULTIPLE rules records only the FIRST (too_short
    beats repetitive beats stopword_ratio)."""
    docs = [
        (1, "one two"),                                     # < MIN_TOKENS -> too_short
        (2, "cat dog " * 40),                               # repeats, no stopwords -> repetitive
        (3, "the of and to in is it a an or " * 5),         # all stopwords -> would be repetitive BUT...
        # NOTE: the tokenizer is [a-z]+ — digits would collapse "w0 w1" to "w w";
        # use letter pairs to keep tokens distinct
        (4, " ".join(f"w{chr(97 + i)}{chr(97 + i // 2)} the" for i in range(26))),  # varied + stopwords -> ok
        (5, " ".join(f"u{chr(97 + i)}{chr(97 + i)}" for i in range(26))),           # zero stopwords -> stopword_ratio
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(docs, "doc_id long, text string") \
        .write.parquet(f"{sf_dir}/documents.parquet")
    got = {r["doc_id"]: (r["reason"], r["keep"])
           for r in cur.curation_filter(spark, sf_dir).collect()}
    assert got[1] == ("too_short", False)
    assert got[2] == ("repetitive", False)
    # doc 3 is both repetitive and stopword-heavy; repetitive comes first
    assert got[3] == ("repetitive", False)
    assert got[4] == ("ok", True)
    assert got[5] == ("stopword_ratio", False)


def test_dedup_apply_removes_exactly_the_losers(spark):
    """Survivor count == corpus minus non-canonical cluster members, and no
    surviving doc is a non-canonical member."""
    from tf_idf_using_mapreduce_spark.operators.dedup import dedup_apply, dedup_clusters
    from tf_idf_using_mapreduce_spark.sources.corpus import load_table

    total = load_table(spark, SF_SMOKE, "documents").count()
    losers = {r["doc_id"] for r in dedup_clusters(spark, SF_SMOKE)
              .where("NOT is_canonical").collect()}
    survivors = {r["doc_id"] for r in dedup_apply(spark, SF_SMOKE).collect()}
    assert len(survivors) == total - len(losers)
    assert not (survivors & losers)


def test_r4_plan_shapes(spark):
    """Plan-shape guards for the round-4 operators: the map-only cascade and
    the hash sampler must stay shuffle-free and Python-free, and the mixture
    report must broadcast its scalar total instead of shuffling the corpus a
    second time."""
    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    p = plan(cur.curation_filter(spark, SF_SMOKE))
    assert "Exchange hashpartitioning" not in p, p[:2000]
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p[:2000]

    p = plan(cur.mixture_sample(spark, SF_SMOKE))
    assert "Exchange" not in p, p[:2000]
    assert "PushedFilters: [IsNotNull" in p, p[:2000]

    p = plan(cur.source_mixture(spark, SF_SMOKE))
    assert "BroadcastExchange" in p, p[:2000]  # scalar total joins broadcast


def test_mixture_sample_unknown_source_keeps_default_rate(spark):
    """A source value outside the fixture shape must NOT be silently
    dropped (round-4 advisor finding): it keeps ``default_rate``."""
    docs = spark.createDataFrame(
        [(i, "weird-domain") for i in range(200)], "doc_id long, source string"
    )
    kept = cur.mixture_sample_df(docs).count()
    assert kept == 200  # default_rate=1.0 keeps everything
    half = cur.mixture_sample_df(docs, default_rate=0.5).count()
    assert 60 <= half <= 140  # hash-Bernoulli around 0.5


def test_mixture_sample_explicit_rates_map(spark):
    """An explicit {source: rate} map drives per-source keep fractions;
    unmapped sources fall back to default_rate."""
    rows = [(i, "a") for i in range(200)] + [(i + 1000, "b") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    kept = cur.mixture_sample_df(docs, rates={"a": 1.0}, default_rate=0.0)
    by_src = {r["source"]: r["cnt"] for r in
              kept.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert by_src.get("a", 0) == 200 and "b" not in by_src
    kept2 = cur.mixture_sample_df(docs, rates={"a": 0.25, "b": 0.75})
    by2 = {r["source"]: r["cnt"] for r in
           kept2.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert 20 <= by2.get("a", 0) <= 90 and 110 <= by2.get("b", 0) <= 190


# --------------------------------------------------------------------------- #
# round-5: PII redaction
# --------------------------------------------------------------------------- #

def test_pii_redaction_oracle_parity(spark):
    assert_query_matches_oracle(spark, "pii_redaction")


def test_pii_redaction_stages_and_null(spark):
    """Emails scrub before IPs before digit runs; an IP's digits are never
    re-counted as a digit run; NULL text stays NULL end to end."""
    docs = spark.createDataFrame(
        [
            (1, "mail a@b.co and ip 10.0.0.1 and card 4111111111111111"),
            (2, "version 1.2.3.4 reads like an ip"),
            (3, "digits 123456 stay (six); 1234567 goes (seven)"),
            (4, None),
            (5, "two mails x@y.org z@w.io one run 99999999"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in cur.pii_redaction_df(docs).collect()}
    assert out[1]["clean_text"] == "mail [EMAIL] and ip [IP] and card [NUM]"
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_digitruns"]) == (1, 1, 1)
    # dotted version lookalike matches the (boundary-free) IPv4 class —
    # documented approximation, same on both engines
    assert out[2]["n_ips"] == 1
    assert out[3]["clean_text"].count("[NUM]") == 1
    assert out[3]["n_digitruns"] == 1
    assert out[4]["clean_text"] is None and out[4]["n_emails"] is None
    assert (out[5]["n_emails"], out[5]["n_digitruns"]) == (2, 1)


def test_pii_redaction_plan_is_map_only(spark):
    p = (cur.pii_redaction(spark, SF_SMOKE)
         ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in p, p[:2000]
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p[:2000]


def test_pii_redaction_is_idempotent(spark):
    """Scrubbing already-scrubbed text must be a no-op: the replacement
    markers contain no digits, dots-between-digits, or @, so a second pass
    can never re-match (the property that makes the scrub safe to run at
    ingest AND again in a batch backfill)."""
    texts = [
        "contact me at jane.doe+spam@mail.example.org or admin@host.io today",
        "server 10.0.255.1 and 192.168.1.1, phone 5551234567, short 123456",
        "card 4111111111111111 ip.in.text 8.8.8.8end no-space",
        "plain text with no pii at all",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = cur.pii_redaction_df(docs).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    twice = cur.pii_redaction_df(once).collect()
    for r in twice:
        assert (r["n_emails"], r["n_ips"], r["n_digitruns"]) == (0, 0, 0), r


def test_text_normalize_oracle_parity(spark):
    from tests.conftest import assert_query_matches_oracle
    assert_query_matches_oracle(spark, "text_normalize")


def test_text_normalize_semantics(spark):
    """NFC really composes (decomposed e + combining acute == composed é),
    control chars and whitespace runs collapse, edges trim, NULL stays
    NULL, and the pass is idempotent."""
    import tempfile
    from tf_idf_using_mapreduce_spark.operators.curation import text_normalize_df

    decomposed = "café"          # e + COMBINING ACUTE
    composed = "café"             # é precomposed
    rows = [
        (1, decomposed),
        (2, composed),
        (3, "a\x01b\x02\x02c"),        # control chars -> single spaces
        (4, "  tabs\there \r\n and\nnewlines  "),
        (5, None),
        (6, "already clean"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text_normalize_df(docs).collect()}
    assert out[1]["norm_text"] == composed and out[1]["changed"] == 1
    assert out[2]["norm_text"] == composed and out[2]["changed"] == 0
    assert out[3]["norm_text"] == "a b c" and out[3]["changed"] == 1
    assert out[4]["norm_text"] == "tabs here and newlines" and out[4]["changed"] == 1
    assert out[5]["norm_text"] is None and out[5]["changed"] is None
    assert out[6]["changed"] == 0
    # idempotence: a second pass changes nothing
    once = docs.sparkSession.createDataFrame(
        [(k, v["norm_text"]) for k, v in out.items()], "doc_id long, text string"
    )
    twice = {r["doc_id"]: r for r in text_normalize_df(once).collect()}
    assert all(r["changed"] in (0, None) for r in twice.values())
