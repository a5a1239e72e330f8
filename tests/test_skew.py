"""Salting utilities must be result-identical to their plain counterparts."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tf_idf_using_mapreduce_spark.functions.skew import (
    SKEW_JOIN_DEMO_CONFS,
    hot_user_event_rows,
    salted_broadcast_left,
    salted_count,
    salted_count_distinct,
)
from tf_idf_using_mapreduce_spark.sources.corpus import load_table


def test_salted_count_matches_plain(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    plain = {(r["l_returnflag"], r["cnt"]) for r in
             li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    salted = {(r["l_returnflag"], r["cnt"]) for r in
              salted_count(li, "l_returnflag").collect()}
    assert plain == salted


def test_salted_count_distinct_matches_plain(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    plain = {(r["l_returnflag"], r["df"]) for r in
             li.groupBy("l_returnflag").agg(F.countDistinct("l_orderkey").alias("df")).collect()}
    salted = {(r["l_returnflag"], r["df"]) for r in
              salted_count_distinct(li, "l_returnflag", "l_orderkey").collect()}
    assert plain == salted


def test_salted_join_matches_plain(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    cust = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = sorted((r["o_orderkey"], r["c_name"]) for r in
                   orders.join(cust, "o_custkey").select("o_orderkey", "c_name").collect())
    salted = sorted((r["o_orderkey"], r["c_name"]) for r in
                    salted_broadcast_left(orders, cust, "o_custkey")
                    .select("o_orderkey", "c_name").collect())
    assert plain == salted


# --------------------------------------------------------------------------- #
# LSH hot-bucket capping (VERDICT r1 item 8): a pathological corpus with a
# giant boilerplate cluster must not explode candidate generation, while
# genuine isolated near-dups are still found.
# --------------------------------------------------------------------------- #

def _write_pathological_corpus(spark, tmp_path):
    """300 identical boilerplate docs (every LSH bucket they form is hot),
    one genuine near-dup pair (unique content, one word changed), one
    reordered-words pair (same token bag -> simhash hamming 0), and unique
    filler docs."""
    # tokenization is [a-z]+ — words must be purely alphabetic
    alpha = [chr(97 + i // 26) + chr(97 + i % 26) for i in range(60)]
    boiler = " ".join("boiler" + s for s in alpha)
    base = " ".join("uniq" + s for s in alpha)
    near = base.replace("uniqbe", "changed", 1)  # one word swapped mid-doc
    bag = ["bag" + s for s in alpha]
    bag_a = " ".join(bag)
    bag_b = " ".join(reversed(bag))
    filler_alpha = [chr(97 + i) for i in range(20)]
    rows = (
        [(i, boiler) for i in range(300)]
        + [(1000, base), (1001, near)]
        + [(1002, bag_a), (1003, bag_b)]
        + [(2000 + i, " ".join(f"fill{a}{chr(97 + j)}" for j in range(40)))
           for i, a in enumerate(filler_alpha)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_minhash_lsh_hot_bucket_capped(spark, tmp_path):
    from tf_idf_using_mapreduce_spark.operators.dedup import dedup_minhash_lsh

    sf_dir = _write_pathological_corpus(spark, tmp_path)
    rows = dedup_minhash_lsh(spark, sf_dir).collect()
    pairs = {(r.doc_a, r.doc_b) for r in rows}
    # the 300-doc boilerplate cluster (300*299/2 = 44850 raw pairs) is capped out
    assert not any(a < 300 and b < 300 for a, b in pairs)
    # the genuine isolated near-dup pair survives
    assert (1000, 1001) in pairs
    assert len(pairs) < 50


def test_simhash_hot_bucket_capped(spark, tmp_path):
    from tf_idf_using_mapreduce_spark.operators.dedup import dedup_simhash

    sf_dir = _write_pathological_corpus(spark, tmp_path)
    rows = dedup_simhash(spark, sf_dir).collect()
    pairs = {(r.doc_a, r.doc_b) for r in rows}
    assert not any(a < 300 and b < 300 for a, b in pairs)
    # same token bag -> identical sketch -> hamming 0, cold 2-member buckets
    assert (1002, 1003) in pairs
    assert len(pairs) < 50


# --------------------------------------------------------------------------- #
# Skew-JOIN twins (round 12): AQE runtime split vs compile-time salting on a
# deliberately hot join key — the power-user ⨝ dimension shape.
# --------------------------------------------------------------------------- #

# ONE shared definition with tools/skew_bench.py (functions/skew.py), so the
# bench measures exactly the configuration this test pins
_SKEW_JOIN_CONFS = SKEW_JOIN_DEMO_CONFS


def _write_hot_user_events(spark, tmp_path) -> str:
    """500k events where ONE power user owns 90% of the rows — the
    deliberately hot join key (shared generator; deterministic)."""
    d = str(tmp_path)
    spark.createDataFrame(
        hot_user_event_rows(), "user_id long, event_type string, value double"
    ).repartition(16).write.parquet(f"{d}/events.parquet")
    return d


def _with_confs(spark, confs):
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    return prev


def test_aqe_splits_hot_join_partition_and_salted_twin_matches(spark, tmp_path):
    from tf_idf_using_mapreduce_spark.operators import relational as rel

    d = _write_hot_user_events(spark, tmp_path)
    prev = _with_confs(spark, _SKEW_JOIN_CONFS)
    try:
        plain = rel.events_segment_revenue(spark, d)
        got = {tuple(r) for r in plain.collect()}
        plan = plain._jdf.queryExecution().executedPlan().toString()
        # the runtime split happened: the SMJ is marked and the hot side's
        # shuffle read was re-chunked
        assert "SortMergeJoin(skew=true)" in plan, plan
        assert "AQEShuffleRead skewed" in plan, plan

        salted = rel.events_segment_revenue_salted(spark, d)
        got_salted = {tuple(r) for r in salted.collect()}
        assert got_salted == got  # value-identical twins
        splan = salted._jdf.queryExecution().executedPlan().toString()
        # the salt is IN the join key, so no single task owns the hot user
        assert "_salt" in splan, splan
    finally:
        _with_confs(spark, prev)
    # the hot user really is heavy-segment: sanity that the scenario bites
    assert any(r[0] == "heavy" for r in got)


def test_skew_twins_match_oracle_on_hot_corpus(spark, tmp_path):
    """Dialect parity survives the adversarial key distribution, not just
    the uniform fixture."""
    import duckdb

    import __spark_entry__ as e
    from tools.canon import canon_rows

    d = _write_hot_user_events(spark, tmp_path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet/*.parquet')"
    )
    ddf = con.sql(e.oracle_sql()["events_segment_revenue"]).df()
    con.close()
    for name in ("events_segment_revenue", "events_segment_revenue_salted"):
        spdf = e.queries()[name](spark, d).toPandas()
        assert sorted(spdf.columns) == sorted(ddf.columns), name
        assert canon_rows(spdf) == canon_rows(ddf), name
