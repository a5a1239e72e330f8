"""The composed end-to-end pretraining pipeline: curation → exact dedup →
mixture sampling → sequence packing as ONE declarative query — the artifact
a training run actually consumes, and the proof that the engine's curation
operators COMPOSE (each stage is the registered operator's own logic applied
to the previous stage's survivors, and the DuckDB oracle is the same CTE
chain, so the whole pipeline is value-checked end to end).

Scale shape: curation is map-only; exact dedup is one uniform-key hash
shuffle; mixture is map-only; packing is the two-phase distributed prefix
sum. The id semi-joins between stages are equi-shuffles on doc_id — in
production each stage boundary is a materialized table (the natural
checkpoint/restart points of a multi-day 100 TB run), which also makes the
joins broadcast- or bucket-colocatable; expressed here as one DAG so the
optimizer sees the whole lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tf_idf_using_mapreduce_spark.operators.curation import (
    curation_decide,
    curation_filter_oracle,
    MIXTURE_SAMPLE_ORACLE,
    mixture_sample_df,
)
from tf_idf_using_mapreduce_spark.operators.packing import (
    _TOKENS,
    MAX_SEQ,
    pack_sequences_of,
)
from tf_idf_using_mapreduce_spark.sources.corpus import load_table, spread


def pretraining_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(seq_id, n_docs, n_tokens): the packed training sequences produced
    from the corpus AFTER the quality cascade drops low-quality docs, exact
    dedup elects one survivor per content hash, and the mixture sampler
    downweights each source — i.e. the full curation pipeline's output in
    shard-manifest form."""
    # spread BEFORE the cascade: the trigram-heavy curation expressions ran
    # on the scan's 1-2 row-group partitions otherwise (measured: 41 s on
    # one core vs 1.4 s spread, sf0.1) — same rationale/threshold as
    # curation_filter
    docs = spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text", "source"),
        bytes_per_partition=128 * 1024,
    )
    # the lineage CUT here is load-bearing, not a cache hint: filtering on
    # ``keep`` directly would let predicate pushdown inline the cascade's
    # CASE — with the tokenize expression re-expanded inside each trigram
    # lambda element, turning the map-only cascade O(tokens²) per doc
    # (measured: 34 s vs 0.2 s at sf0.1). Production materializes the
    # decision table at exactly this boundary anyway (it IS the audit log).
    decisions = curation_decide(docs.select("doc_id", "text")).localCheckpoint(eager=False)
    kept = decisions.where(F.col("keep")).select("doc_id")
    kept_docs = docs.join(kept, "doc_id")
    survivors = (
        kept_docs.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    mixed = (
        mixture_sample_df(docs.select("doc_id", "source"))
        .select("doc_id")
        .join(survivors, "doc_id")
    )
    final = docs.select("doc_id", "text").join(mixed, "doc_id")
    return pack_sequences_of(final)


def pretraining_shards_oracle() -> str:
    m = MAX_SEQ
    return f"""
WITH kept AS (SELECT doc_id FROM ({curation_filter_oracle()}) c WHERE c.keep),
kd AS (SELECT d.doc_id, d.text FROM documents d JOIN kept USING (doc_id)),
surv AS (SELECT min(doc_id) AS doc_id FROM kd GROUP BY md5(text)),
mixed AS (SELECT mx.doc_id FROM ({MIXTURE_SAMPLE_ORACLE}) mx JOIN surv USING (doc_id)),
corpus AS (SELECT d.doc_id, d.text FROM documents d JOIN mixed USING (doc_id)),
counts AS (SELECT doc_id, len({_TOKENS}) AS n FROM corpus),
spans AS (
  SELECT doc_id, n,
         CAST(coalesce(sum(n) OVER (ORDER BY doc_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS start
  FROM counts
),
binned AS (
  SELECT doc_id, n, start,
         unnest(range(CAST(floor(start / {m}) AS BIGINT),
                      CAST(floor((start + n - 1) / {m}) AS BIGINT) + 1)) AS seq_id
  FROM spans WHERE n > 0
)
SELECT seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(least(start + n, (seq_id + 1) * {m})
                - greatest(start, seq_id * {m})) AS BIGINT) AS n_tokens
FROM binned GROUP BY seq_id
"""
