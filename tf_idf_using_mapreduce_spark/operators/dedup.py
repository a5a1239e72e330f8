"""Deduplication suite over the ``documents`` corpus — the training-data-
pipeline extension operators (SURVEY.md §7.2 #7): exact, n-gram Jaccard,
MinHash+LSH, SimHash. All sketches are md5-based (functions/hashing.py) so the
DuckDB oracle computes identical values.

Scale design:
- **exact**: one hash-groupBy; survivors = min(doc_id) per content hash. The
  only full-shuffle is on the 32-byte hash (uniform keys — no skew).
- **ngram_jaccard**: exact all-pairs similarity via a shingle equi-join — the
  CORRECTNESS baseline. Quadratic in per-shingle document frequency; at 100 TB
  this is the operator you do NOT run (the shingle join explodes on common
  shingles) — it exists as the oracle for the LSH path.
- **minhash_lsh**: the SCALE path. k=16 signatures (min of seeded md5 over
  shingles), 8 bands × 2 rows; candidate pairs share a band bucket, then exact
  Jaccard verifies candidates only. Work is linear in corpus size + output:
  sig build is a (doc, seed) aggregation with map-side partial min; the
  band-bucket self-join only explodes where near-duplicates actually exist.
  With j ≥ 0.8 targets, P(candidate) = 1-(1-j²)⁸ ≈ 0.9997 — recall checked in
  tests against the exact baseline.
- **simhash**: 32-bit sign-of-weighted-votes sketch; banded (4 × 8 bits) for
  candidate generation (hamming ≤ 3 implies ≥1 exact band by pigeonhole),
  pairwise hamming only on bucket collisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tf_idf_using_mapreduce_spark.functions.hashing import (
    SIMHASH_BITS,
    band_key_expr,
    hamming_int_duck,
    hamming_int_spark,
    seeded_md5,
    simhash_int_expr,
    simhash_vote_exprs,
)
from tf_idf_using_mapreduce_spark.sources.corpus import load_table, spread

SHINGLE_K = 3           # word trigrams
MINHASH_SEEDS = 16
LSH_BAND_ROWS = 2       # → 8 bands
JACCARD_THRESHOLD = 0.8
HAMMING_THRESHOLD = 3
SIMHASH_BANDS = 4       # 4 × 8 bits; hamming ≤ 3 ⇒ some band exact (pigeonhole)


# --------------------------------------------------------------------------- #
# exact dedup
# --------------------------------------------------------------------------- #

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(text_hash, n_docs, canonical_doc_id): content-hash groups with the
    keep-first (min doc_id) survivor. ``n_docs > 1`` rows are the duplicates."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


DEDUP_EXACT_ORACLE = """
SELECT md5(text) AS text_hash, count(*) AS n_docs, min(doc_id) AS canonical_doc_id
FROM documents GROUP BY 1
"""


# --------------------------------------------------------------------------- #
# shingles (shared by jaccard + minhash)
# --------------------------------------------------------------------------- #

def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) — DISTINCT word-trigram shingles per document."""
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = docs.withColumn("t", F.expr("regexp_extract_all(lower(text), '([a-z]+)', 1)"))
    sh = toks.where(F.size("t") >= SHINGLE_K).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(t) - {SHINGLE_K}), "
                f"i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"
            )
        ).alias("shingle"),
    )
    return sh.distinct()


# DuckDB twin (1-based lists, unnest instead of explode)
_SHINGLES_SQL = f"""
SELECT DISTINCT doc_id, shingle FROM (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t) - {SHINGLE_K - 2}),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '([a-z]+)', 1) AS t FROM documents) dtoks
  WHERE len(t) >= {SHINGLE_K}
) shx
"""


def _jaccard_on(pairs: DataFrame, shingles: DataFrame) -> DataFrame:
    """Exact Jaccard for given candidate (doc_a, doc_b) pairs."""
    counts = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = shingles.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = shingles.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        pairs.join(a, "doc_a").join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.join(counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")), 6).alias("jaccard"),
        )
    )


# --------------------------------------------------------------------------- #
# exact n-gram Jaccard (baseline)
# --------------------------------------------------------------------------- #

def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, jaccard) for all pairs with trigram Jaccard ≥ 0.8."""
    sh = _shingles(spark, sf_dir)
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    pairs = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _jaccard_on(pairs, sh).where(F.col("jaccard") >= JACCARD_THRESHOLD)


NGRAM_JACCARD_ORACLE = f"""
WITH sh AS ({_SHINGLES_SQL}),
cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(common * 1.0 / (ca.n_sh + cb.n_sh - common), 6) AS jaccard
FROM common
JOIN cnt ca ON ca.doc_id = doc_a
JOIN cnt cb ON cb.doc_id = doc_b
WHERE common * 1.0 / (ca.n_sh + cb.n_sh - common) >= {JACCARD_THRESHOLD}
"""


# --------------------------------------------------------------------------- #
# MinHash + LSH (scale path)
# --------------------------------------------------------------------------- #

def minhash_signatures(shingles: DataFrame, seeds: int = MINHASH_SEEDS) -> DataFrame:
    """(doc_id, s0..s{k-1}): min over shingles of md5(seed:shingle), one
    aggregate column per seed — ONE pass over the shingles, no seed explode
    (a k× row blowup through the shuffle otherwise). Hex-string min ==
    numeric min of the 128-bit hash (fixed-length lexicographic)."""
    aggs = [
        F.min(F.expr(seeded_md5(str(s), "shingle"))).alias(f"s{s}")
        for s in range(seeds)
    ]
    return shingles.groupBy("doc_id").agg(*aggs)


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, jaccard): LSH candidates (8 bands × 2 rows) verified
    with exact Jaccard ≥ 0.8 — the end-to-end scalable near-dup pipeline."""
    sh = _shingles(spark, sf_dir)
    sig = minhash_signatures(sh)
    n_bands = MINHASH_SEEDS // LSH_BAND_ROWS
    band_structs = ", ".join(
        f"named_struct('band', {b}, 'band_sig', concat(s{LSH_BAND_ROWS * b}, s{LSH_BAND_ROWS * b + 1}))"
        for b in range(n_bands)
    )
    bands = sig.select(
        "doc_id", F.explode(F.expr(f"array({band_structs})")).alias("bb")
    ).select("doc_id", "bb.band", "bb.band_sig")
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "band_sig")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "band_sig")
    cand = (
        a.join(b, ["band", "band_sig"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _jaccard_on(cand, sh).where(F.col("jaccard") >= JACCARD_THRESHOLD)


_MINHASH_SIG_COLS = ", ".join(
    f"min({seeded_md5(str(s), 'shingle')}) AS s{s}" for s in range(MINHASH_SEEDS)
)
_MINHASH_BAND_SELECTS = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, concat(s{LSH_BAND_ROWS * b}, s{LSH_BAND_ROWS * b + 1}) AS band_sig FROM sig16"
    for b in range(MINHASH_SEEDS // LSH_BAND_ROWS)
)

MINHASH_LSH_ORACLE = f"""
WITH sh AS ({_SHINGLES_SQL}),
sig16 AS (SELECT doc_id, {_MINHASH_SIG_COLS} FROM sh GROUP BY doc_id),
bands AS ({_MINHASH_BAND_SELECTS}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
                           AND a.doc_id < b.doc_id
),
cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
common AS (
  SELECT c.doc_a, c.doc_b, count(*) AS common
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(common * 1.0 / (ca.n_sh + cb.n_sh - common), 6) AS jaccard
FROM common
JOIN cnt ca ON ca.doc_id = doc_a
JOIN cnt cb ON cb.doc_id = doc_b
WHERE common * 1.0 / (ca.n_sh + cb.n_sh - common) >= {JACCARD_THRESHOLD}
"""


# --------------------------------------------------------------------------- #
# SimHash
# --------------------------------------------------------------------------- #

def _earlier_band_mismatch(sim_a: str, sim_b: str) -> str:
    """Emit-once predicate replacing DISTINCT on candidates: keep a pair at
    band b only if NO earlier band also matched. Pure expression — the 2.6M
    candidate rows (sf0.1) never shuffle for dedup."""
    conds = [
        f"(band <= {n} OR {band_key_expr(sim_a, n)} <> {band_key_expr(sim_b, n)})"
        for n in range(SIMHASH_BANDS - 1)
    ]
    return " AND ".join(conds)


def simhash_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash): 32-bit integer sign-of-votes sketch over token
    occurrences (bit j set ⇔ sum over tokens of ±1 votes for md5-bit j ≥ 0)."""
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = docs.select(
        "doc_id",
        F.explode(F.expr("regexp_extract_all(lower(text), '([a-z]+)', 1)")).alias("token"),
    ).withColumn("h", F.md5("token"))
    votes = [F.expr(f"sum({v})").alias(f"v{j}") for j, v in enumerate(simhash_vote_exprs("h"))]
    agg = toks.groupBy("doc_id").agg(*votes)
    return agg.select(
        "doc_id",
        F.expr(simhash_int_expr([f"v{j}" for j in range(SIMHASH_BITS)])).alias("simhash"),
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, hamming): banded SimHash candidates with hamming ≤ 3.

    Bands: 4 × 8 bits — any pair within hamming 3 shares ≥ 1 exact band
    (pigeonhole), so banding loses nothing while avoiding the all-pairs join.
    Integer sketches: hamming is one ``bit_count(xor)``; the emit-once band
    predicate replaces a DISTINCT shuffle over millions of candidates.
    """
    sim = simhash_table(spark, sf_dir)
    band_structs = ", ".join(
        f"named_struct('band', {b}, 'bkey', {band_key_expr('simhash', b)})"
        for b in range(SIMHASH_BANDS)
    )
    banded = sim.select(
        "doc_id", "simhash", F.explode(F.expr(f"array({band_structs})")).alias("bb")
    ).select("doc_id", "simhash", "bb.band", "bb.bkey")
    a = banded.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"), "band", "bkey")
    b = banded.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"), "band", "bkey")
    return (
        a.join(b, ["band", "bkey"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.expr(hamming_int_spark("sim_a", "sim_b")))
        .where(F.col("hamming") <= HAMMING_THRESHOLD)
        .where(F.expr(_earlier_band_mismatch("sim_a", "sim_b")))
        .select("doc_a", "doc_b", "hamming")
    )


def _simhash_oracle_table() -> str:
    votes = ", ".join(
        f"sum({v}) AS v{j}" for j, v in enumerate(simhash_vote_exprs("h"))
    )
    simint = simhash_int_expr([f"v{j}" for j in range(SIMHASH_BITS)])
    return f"""
toks AS (
  SELECT doc_id, md5(token) AS h FROM (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '([a-z]+)', 1)) AS token
    FROM documents
  ) simtoks
),
votes AS (SELECT doc_id, {votes} FROM toks GROUP BY doc_id),
sim AS (SELECT doc_id, {simint} AS simhash FROM votes)
"""


def simhash_oracle() -> str:
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} AS band, {band_key_expr('simhash', b)} AS bkey FROM sim"
        for b in range(SIMHASH_BANDS)
    )
    ham = hamming_int_duck("a.simhash", "b.simhash")
    return f"""
WITH {_simhash_oracle_table()},
banded AS ({band_selects})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, {ham} AS hamming
FROM banded a
JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
WHERE {ham} <= {HAMMING_THRESHOLD}
  AND {_earlier_band_mismatch('a.simhash', 'b.simhash').replace('band <=', 'a.band <=')}
"""
