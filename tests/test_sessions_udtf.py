"""Sessionization/as-of oracle parity + UDTF and MapType surface tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE, assert_query_matches_oracle


@pytest.mark.parametrize("name", ["sessionize_events", "asof_purchase_prior_click",
                                  "orders_with_returns_exists",
                                  "customers_above_avg_balance",
                                  "parts_never_ordered", "user_event_pivot"])
def test_oracle_parity(spark, name):
    assert_query_matches_oracle(spark, name)


def test_sessions_are_gap_separated(spark):
    from tf_idf_using_mapreduce_spark.operators.sessions import sessionize_events

    rows = sessionize_events(spark, SF_SMOKE).collect()
    assert rows
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["session_id"], r["session_start"], r["session_end"]))
    for user, sess in by_user.items():
        sess.sort()
        for (_, _, end_a), (_, start_b, _) in zip(sess, sess[1:]):
            assert start_b > end_a, (user, end_a, start_b)  # disjoint, ordered


def test_udtf_lateral_join(spark):
    from tf_idf_using_mapreduce_spark.functions.udtf_demo import sentence_split_udtf

    SentenceSplit = sentence_split_udtf()
    spark.udtf.register("sentence_split", SentenceSplit)
    df = spark.createDataFrame(
        [(1, "the fast query. a slow scan runs. done."), (2, None)],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        "SELECT doc_id, s.* FROM udtf_docs, LATERAL sentence_split(text) s"
    ).collect()
    got = [(r["doc_id"], r["sentence_idx"], r["n_words"]) for r in rows]
    assert got == [(1, 0, 3), (1, 1, 4), (1, 2, 1)]


def test_doc_term_map_roundtrip(spark):
    from tf_idf_using_mapreduce_spark.functions.udtf_demo import doc_term_map, explode_term_map
    from tf_idf_using_mapreduce_spark.operators.tfidf import stemmed_tokens

    st = stemmed_tokens(spark, SF_SMOKE).limit(5000)
    maps = doc_term_map(st)
    assert dict(maps.dtypes)["term_map"] == "map<string,bigint>"
    back = explode_term_map(maps)
    direct = st.groupBy("doc_id", F.col("stem").alias("term")).agg(F.count(F.lit(1)).alias("tf"))
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in direct.collect()}
