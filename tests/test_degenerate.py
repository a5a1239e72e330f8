"""Empty-corpus engine/oracle parity (round-9, generalizing the round-8
advisor's finding): every operator must agree with its oracle on ZERO-row
inputs — partition-pruned scans, filters matching nothing, and fresh daily
drops all hand operators empty tables at 100 TB. ``tools/degenerate_check.py``
sweeps the full registry; this test pins the queries that USED to diverge
(one per failure class) so regressions are caught in CI, not by the sweep.

Classes fixed in round 9:
- SQL-standard grand-total row: Spark's rollup/cube/GROUPING SETS return zero
  rows on empty input, DuckDB emits the () grouping set's row — fixed with a
  driver-side limit-1 probe that preserves the single-Expand plan.
- MLlib ``.fit`` raising on empty input (CountVectorizer/KMeans/LSH).
- Anchor/quantizer collection yielding an untypable empty literal
  (``F.lit([])`` / ``np.stack([])``).
- NULL aggregate over zero groups vs the oracle's literal 0
  (``sum(cast)`` → ``count(when)``).
"""

from __future__ import annotations

import duckdb
import pytest

from tools.degenerate_check import TABLES, build_empty_corpus, build_tiny_corpus, run_one

# one representative per fixed failure class + the remaining grand-total kin
ORACLED = [
    "rollup_customer_geo",
    "cube_lineitem_flags",
    "grouping_sets_revenue",
    "events_time_rollup",
    "doc_freq_approx_err",
    "tfidf_mllib_topk_overlap",
    "ann_topk_ivf",
    "dedup_embedding_ivf",
    "knn_label_agreement_lsh",
    "rrf_fusion_topk",
]
ROWS_ONLY = ["ann_topk_ivf_kmeans"]


@pytest.fixture(scope="module")
def empty_corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_sf"))
    build_empty_corpus(d)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    return d, con


@pytest.mark.parametrize("name", ORACLED + ROWS_ONLY)
def test_empty_corpus_matches_oracle(spark, empty_corpus, name):
    import __spark_entry__ as e

    d, con = empty_corpus
    verdict = run_one(name, spark, con, d, e.queries()[name], e.oracle_sql().get(name))
    assert verdict in ("ok", "rows-only"), verdict


@pytest.fixture(scope="module")
def tiny_corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tiny_sf"))
    build_tiny_corpus(d)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    return d, con


# the single-row corpus's own failure classes (tools/degenerate_check.py
# --tiny): KMeans k > n points, and the MLlib overlap gate degenerating when
# every term has df = N (1-doc corpus ⇒ all MLlib idfs are 0 ⇒ the gate is
# declared vacuous below 2 docs, mirrored in the oracle's `>= 2` predicate)
@pytest.mark.parametrize("name", [
    "tfidf_mllib_topk_overlap",
    "ann_topk_ivf_kmeans_recall",
    "ann_topk_ivf_kmeans",
])
def test_tiny_corpus_matches_oracle(spark, tiny_corpus, name):
    import __spark_entry__ as e

    d, con = tiny_corpus
    verdict = run_one(name, spark, con, d, e.queries()[name], e.oracle_sql().get(name))
    assert verdict in ("ok", "rows-only"), verdict


def test_kmeans_degenerate_quantizer_not_cached(spark, tiny_corpus):
    """The n < 2 fallback in ann_topk_ivf_kmeans must NOT populate the
    (sf_dir, 'kmeans') anchor cache: the key carries no row count, so a
    cached degenerate quantizer would survive the empty-then-populated dir
    transition for the whole session (ADVICE r9)."""
    from tf_idf_using_mapreduce_spark.operators import similarity as sim

    d, _ = tiny_corpus
    key = (d, "kmeans")
    sim._ANCHOR_CACHE.pop(key, None)
    sim.ann_topk_ivf_kmeans(spark, d).collect()
    assert key not in sim._ANCHOR_CACHE


@pytest.fixture(scope="module")
def null_corpus(tmp_path_factory):
    from tools.degenerate_check import build_null_corpus

    d = str(tmp_path_factory.mktemp("null_sf"))
    build_null_corpus(d)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    return d, con


# the NULL-payload corpus's failure classes (tools/degenerate_check.py
# --nulls): the shared event-time rule (window()/session_window() define no
# window for NULL ts — oracles filter to match), NULL pivot columns, the
# oracle's missing default-rate coalesce, pandas .sum() turning all-NULL
# into 0.0 where SQL sums to NULL, NULL-key equi-joins dropping a
# legitimate NULL group, and a decode UDF raising on NULL payloads
@pytest.mark.parametrize("name", [
    "events_hourly_tumbling",
    "events_sliding_windows",
    "events_session_stream",
    "events_user_running_totals",
    "user_event_unpivot",
    "mixture_sample",
    "dataset_card",
    "multimodal_features",
    "lineitem_price_stats_approx_err",
])
def test_null_corpus_matches_oracle(spark, null_corpus, name):
    import __spark_entry__ as e

    d, con = null_corpus
    verdict = run_one(name, spark, con, d, e.queries()[name], e.oracle_sql().get(name))
    assert verdict in ("ok", "rows-only"), verdict


def test_empty_corpus_grand_total_values(spark, empty_corpus):
    """The standard-conformance fix, value-level: the grand-total row on an
    empty corpus is (ALL, ALL, 0, NULL) — count 0, sum NULL."""
    from tf_idf_using_mapreduce_spark.operators.relational import rollup_customer_geo

    d, _ = empty_corpus
    [row] = rollup_customer_geo(spark, d).collect()
    assert (row["r_name"], row["n_name"], row["n_customers"]) == ("ALL", "ALL", 0)
    assert row["total_acctbal"] is None


def test_empty_corpus_stream_partitioned_sink_reads_back_empty(spark, empty_corpus):
    """Failure class pinned in round 13: an EMPTY stream writes no files into
    the partitioned file sink, and a schema-less read-back of the bare sink
    dir fails inference instead of returning the empty frame the oracle
    returns. The query must hand back zero rows with its stable schema."""
    from tf_idf_using_mapreduce_spark.streaming.events import (
        events_stream_daily_partitioned,
    )

    d, _con = empty_corpus
    df = events_stream_daily_partitioned(spark, d)
    assert df.columns == ["event_date", "event_type", "n_events", "sum_value"]
    assert df.count() == 0
