"""Pairs-vs-stripes on the RDD layer — the pedagogical reproduction of the
reference's two MapReduce designs (``POS.java`` vs ``POSstripes.java``;
SURVEY.md §7.2 #5). NOT an engine path: the DataFrame ``pos_counts`` plan is
strictly better (codegen + automatic partial aggregation). Kept because the
reference's entire Problem 1 is about this comparison:

- **pairs** ≙ ``flatMap → (tag, 1) → reduceByKey``: reduceByKey's map-side
  combine is what the reference's commented-out combiner would have done
  (``POS.java:66``) — without it (``groupByKey``) every (tag, 1) crosses the
  network, the design flaw the stripes pattern fixes.
- **stripes** ≙ per-partition Counter → one dict per partition →
  ``reduceByKey`` over merged dicts: the explicit ``MapWritable`` stripe
  (``POSstripes.java:35-47``), minus the constant-key single-reducer merge
  (the reference funnels ALL stripes through one reducer,
  ``POSstripes.java:48`` — the scalability cliff SURVEY §4.2 calls out; here
  stripes merge tag-parallel).
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame

from tf_idf_using_mapreduce_spark.functions.postag import pos_tag_py

_TOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]")


def pos_counts_rdd_pairs(docs: DataFrame) -> dict[str, int]:
    """(tag → count) via the pairs pattern: one (tag, 1) per token, combined
    map-side by reduceByKey."""
    rdd = docs.select("text").rdd.flatMap(
        lambda row: ((pos_tag_py(t), 1) for t in _TOKEN_RE.findall(row["text"]))
    )
    return dict(rdd.reduceByKey(lambda a, b: a + b).collect())


def pos_counts_rdd_stripes(docs: DataFrame) -> dict[str, int]:
    """(tag → count) via the stripes pattern: one Counter per partition, then
    a tag-parallel merge (NO constant-key single reducer)."""

    def partition_stripe(rows):
        acc: Counter = Counter()
        for row in rows:
            for t in _TOKEN_RE.findall(row["text"]):
                acc[pos_tag_py(t)] += 1
        yield from acc.items()

    rdd = docs.select("text").rdd.mapPartitions(partition_stripe)
    return dict(rdd.reduceByKey(lambda a, b: a + b).collect())
