"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``tf_idf_using_mapreduce_spark/``; this module only
assembles the registry. Every oracle runs the byte-identical portable-SQL
algorithm where the operator involves engine-defined functions (Porter
stemming, rule POS tagging, md5-based sketches), so parity is by construction.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tf_idf_using_mapreduce_spark.registry import QUERIES, ORACLES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference's headline pipeline): TF-IDF at sf0.001."""
    from tf_idf_using_mapreduce_spark.operators.tfidf import tfidf

    return tfidf(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
