"""Skew-mitigation utilities (SURVEY.md §4.3 "salting guidance for skewed
terms").

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on by default in the session
factory); these helpers cover the cases AQE can't re-plan:

- :func:`salted_count`: two-stage aggregation for heavy-hitter GROUP BY keys
  (a Zipfian term distribution sends one term's whole partition to one
  reducer; salting splits it across ``n_salts`` partial groups, then merges).
- :func:`salted_broadcast_left`: replicate-the-small-side join for a skewed
  big side when the small side is too large to broadcast whole but its hot
  keys are known.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count(df: DataFrame, key_col: str, n_salts: int = 16,
                 count_col: str = "cnt") -> DataFrame:
    """count(*) per ``key_col`` via salt → partial count → merge. Identical
    result to ``df.groupBy(key).count()``; the first shuffle distributes each
    hot key over ``n_salts`` reducers so no single task owns a heavy hitter.

    (For plain counts Catalyst's partial aggregation usually suffices — use
    this shape when the aggregate state is large, e.g. collect_set/countDistinct
    payloads, where map-side partials can't fully collapse.)
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(key_col, "_salt").agg(F.count(F.lit(1)).alias("_partial"))
    return partial.groupBy(key_col).agg(F.sum("_partial").alias(count_col))


def salted_count_distinct(df: DataFrame, key_col: str, distinct_col: str,
                          n_salts: int = 16, count_col: str = "df") -> DataFrame:
    """count(DISTINCT distinct_col) per key without any single reducer holding
    a hot key's whole distinct set: stage 1 dedups (key, value) pairs — the
    shuffle key includes the value, so it spreads naturally; stage 2 counts.
    This is exactly the scale-out shape of the reference's DF aggregation
    (``DocumentFreq.java:82-88`` builds the whole per-term HashSet in one
    reducer's heap — the memory cliff its PDF admits)."""
    deduped = df.select(key_col, distinct_col).distinct()
    return deduped.groupBy(key_col).agg(F.count(F.lit(1)).alias(count_col))


def salted_broadcast_left(big: DataFrame, small: DataFrame, key: str,
                          n_salts: int = 8) -> DataFrame:
    """Inner equi-join resilient to hot keys on ``big``: each big row gets a
    random salt, the small side is exploded ``n_salts``× with every salt, and
    the join key becomes (key, salt) — hot keys spread over n_salts tasks.
    Result identical to ``big.join(small, key)``."""
    big_s = big.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.expr(f"sequence(0, {n_salts - 1})"))
    )
    return big_s.join(small_s, [key, "_salt"]).drop("_salt")


# ---------------------------------------------------------------------------
# skew-JOIN demonstration fixtures — ONE definition shared by the plan test
# (tests/test_skew.py) and the measurement harness (tools/skew_bench.py), so
# the bench always measures exactly the configuration the test pins (the
# same no-silent-drift rule as dedup._bloom_split_and_prune).
# ---------------------------------------------------------------------------

# force a sort-merge join and make the hot partition qualify at test scale
# (production thresholds are 256MB-class; the demo data is MBs)
SKEW_JOIN_DEMO_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256KB",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


def hot_user_event_rows(n: int = 500_000, hot_share: float = 0.9,
                        n_users: int = 400, seed: int = 7) -> list:
    """(user_id, event_type, value) rows where user 1 owns ``hot_share`` of
    the stream — the deliberately hot join key. Deterministic (seeded)."""
    import random

    rng = random.Random(seed)
    return [
        (1 if rng.random() < hot_share else rng.randint(2, n_users),
         rng.choice(["click", "view", "purchase"]),
         round(rng.uniform(0, 10), 3))
        for _ in range(n)
    ]
