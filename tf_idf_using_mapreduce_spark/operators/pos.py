"""POS-tag counting — the reference's Problem 1 (``POS.java`` pairs,
``POSstripes.java`` stripes), Spark-first.

Both MapReduce design patterns collapse to the same declarative plan
(``groupBy("tag").count()``): Catalyst's partial+final ``HashAggregate`` IS the
stripes pattern (map-side combine), applied automatically (SURVEY.md §2.4 A2).
Two variants are kept on purpose:

- :func:`pos_counts` — the idiomatic plan (tokenize + tag entirely in
  whole-stage codegen, zero Python).
- :func:`pos_counts_stripes` — a ``mapInPandas`` reproduction of the explicit
  map-side stripe (per-batch Counter → partial (tag, cnt) rows → final sum),
  demonstrating the custom-UDF/stateful-setup surface (§2.10); same result,
  same oracle. The reference's constant-key single-reducer merge
  (``POSstripes.java:48``) is deliberately NOT reproduced — it serializes the
  whole corpus through one task (SURVEY.md §7.3).

Unlike the reference (per-LINE tagging, quirk Q8), tagging is per document
text value, matching the corpus layout the reference's PDF assumes.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tf_idf_using_mapreduce_spark.functions.postag import (
    POS_TOKENIZE_SQL,
    explode_pos_tokens,
    pos_tag_py,
    pos_tag_sql,
    with_pos_tag,
)
from tf_idf_using_mapreduce_spark.sources.corpus import load_table, spread


def pos_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(tag, cnt) — A1 'pairs' semantics via declarative aggregation."""
    docs = spread(load_table(spark, sf_dir, "documents").select("text"))
    toks = explode_pos_tokens(docs)
    return with_pos_tag(toks).groupBy("tag").agg(F.count(F.lit(1)).alias("cnt"))


def pos_counts_stripes(spark: SparkSession, sf_dir: str,
                       tagger_factory=None) -> DataFrame:
    """(tag, cnt) via an explicit map-side stripe in ``mapInPandas``.

    Each Arrow batch emits one partial count per tag (the 'stripe'), so the
    shuffle moves O(|tagset| × n_batches) rows instead of one row per token —
    the exact data-movement win the stripes pattern buys, without the
    reference's single-reducer bottleneck.

    ``tagger_factory`` is the MODEL-SWAP SEAM (the reference loads a real
    pre-trained UD model per JVM, ``POS.java:23-25,36``): a zero-arg callable
    returning a ``token -> tag`` function, invoked ONCE per task inside the
    ``mapInPandas`` iterator — exactly where a production job would
    deserialize a heavyweight model so every Arrow batch of the task reuses
    it. Defaults to the deterministic rule tagger (oracle-checkable);
    tests/test_pos.py swaps in a stateful model and asserts one load per
    task and unchanged counts."""
    import re

    docs = spread(load_table(spark, sf_dir, "documents").select("text"))
    token_re = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]")

    def stripes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # model load: once per TASK, amortized over all its Arrow batches
        tagger = pos_tag_py if tagger_factory is None else tagger_factory()
        # Per-task partial aggregate (the MapWritable stripe, POSstripes.java:35-47)
        # — vectorized: pandas findall/explode for tokens, one memoized tag
        # lookup per DISTINCT token (the dictionary-encoding trick again).
        acc: Counter = Counter()
        tag_cache: dict[str, str] = {}
        for pdf in batches:
            toks = pdf["text"].str.findall(token_re).explode().dropna()
            for tok, n in toks.value_counts().items():
                tag = tag_cache.get(tok)
                if tag is None:
                    tag = tag_cache[tok] = tagger(tok)
                acc[tag] += int(n)
        yield pd.DataFrame({"tag": list(acc.keys()), "cnt": list(acc.values())})

    partial = docs.mapInPandas(stripes, "tag string, cnt long")
    return partial.groupBy("tag").agg(F.sum("cnt").alias("cnt"))


def pos_counts_oracle() -> str:
    tok = POS_TOKENIZE_SQL.format(col="text")
    return (
        f"WITH postoks AS (SELECT unnest({tok}) AS token FROM documents) "
        f"SELECT {pos_tag_sql('token')} AS tag, count(*) AS cnt FROM postoks GROUP BY 1"
    )


def pos_counts_penn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(tag, cnt) under the PENN-style ruleset, shipped END-TO-END through
    :func:`pos_counts_stripes`' ``tagger_factory`` model-swap seam — the
    round-8 proof that the seam carries a genuinely different tag
    INVENTORY (IN/TO vs ADP+SCONJ, NN/NNS plural split, MD + inflected
    VB* vs AUX, PRP/PRP$/WP, Penn punctuation tags), not just the default
    rules re-keyed. Same bounded stripe shuffle (O(|tagset| × n_batches)
    rows); oracled against its own CASE SQL
    (:func:`tf_idf_using_mapreduce_spark.functions.postag.penn_tag_sql`),
    so the Python twin the seam loads is value-checked against the
    declarative form on every gate run."""
    from tf_idf_using_mapreduce_spark.functions.postag import penn_tag_py

    return pos_counts_stripes(spark, sf_dir, tagger_factory=lambda: penn_tag_py)


def pos_counts_penn_oracle() -> str:
    from tf_idf_using_mapreduce_spark.functions.postag import penn_tag_sql

    tok = POS_TOKENIZE_SQL.format(col="text")
    return (
        f"WITH postoks AS (SELECT unnest({tok}) AS token FROM documents) "
        f"SELECT {penn_tag_sql('token')} AS tag, count(*) AS cnt FROM postoks GROUP BY 1"
    )
