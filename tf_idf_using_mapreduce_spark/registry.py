"""Central registry mapping query names → (Spark callable, DuckDB oracle SQL).

Every operator from SURVEY.md §2 that the engine implements registers here;
``__spark_entry__.py`` re-exports it for the driver. Names without an oracle
entry are non-SQL-expressible (streaming/state/ML) and get rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tf_idf_using_mapreduce_spark.operators import pos as _pos
from tf_idf_using_mapreduce_spark.operators import tfidf as _tfidf

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, fn: Callable[[SparkSession, str], DataFrame], oracle: str | None = None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


register("doc_freq_top100", lambda spark, sf: _tfidf.doc_freq(spark, sf), _tfidf.doc_freq_oracle())
register("tfidf", lambda spark, sf: _tfidf.tfidf(spark, sf), _tfidf.tfidf_oracle())
register("pos_counts", _pos.pos_counts, _pos.pos_counts_oracle())
register("pos_counts_stripes", _pos.pos_counts_stripes, _pos.pos_counts_oracle())
