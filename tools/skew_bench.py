"""Adversarial-skew benchmark: prove the LSH hot-bucket caps earn their keep
on Zipf-skewed data, not just on the uniform fixture (round-6 verdict item).

The organic fixture never triggers ``LSH_BUCKET_CAP`` (max observed bucket
≲ 20 members), so the bench suite alone can't show what the cap buys at
100 TB, where boilerplate/template clusters are the RULE: real crawl corpora
have Zipf-distributed duplication (a handful of templates account for a huge
share of near-dup mass). This harness:

1. generates a Zipf-skewed corpus at ~sf0.1 document count (deterministic,
   seeded): near-dup cluster sizes follow ``size_i ∝ head / i**1.1`` with a
   ~1500-member head template cluster (``HEAD_CLUSTER``) — every band bucket
   that cluster forms is hot (≫ cap) — plus organic unique tails;
2. times ``dedup_minhash_lsh``, ``dedup_incremental``, and (round 7)
   ``dedup_containment`` — whose hot key is the winnowed FINGERPRINT, far
   denser than band keys (~100 fingerprints/doc vs 8 bands) so the uncapped
   blowup is proportionally worse — with each cap at its production value
   and with the cap DISABLED, same data, same session;
3. (round 7) runs two-star connected components over the capped LSH pair
   graph: the head template cluster is a ~1500-member near-clique component,
   and the bench records the ROUND COUNT to pin the O(log component-size)
   convergence claim on an adversarial component (vs diameter-bound label
   propagation);
4. prints ONE JSON line with all wall-clocks, candidate-pair counts, and
   the two-star round/component census, for the scaling report.

Uncapped, the head cluster alone expands to ~size²/2 candidate pairs, each
paying an exact-Jaccard array_intersect over hundreds of shingles — the
O(bucket²) blowup the cap exists to amputate. Capped cost must stay in the
same band as the uniform-fixture bench entry; that is the 100 TB claim.

Usage: python tools/skew_bench.py [out_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = 42
N_DOCS_TARGET = 5000          # ~sf0.1 document count
HEAD_CLUSTER = 1500           # members of the hottest template cluster
ZIPF_S = 1.1
DOC_WORDS = 80
VOCAB = 4000
MUTATIONS = 2                 # words swapped per cluster member (keeps J >= ~0.8)


def generate_zipf_corpus(out_dir: str) -> str:
    """Write documents.parquet with Zipf-distributed near-dup clusters."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(SEED)
    # purely-alphabetic vocab (the tokenizer is [a-z]+)
    letters = "abcdefghijklmnopqrstuvwxyz"
    vocab = [
        "".join(rng.choice(list(letters), size=7))
        for _ in range(VOCAB)
    ]

    texts: list[str] = []
    cluster_of: list[int] = []
    i = 1
    while len(texts) < N_DOCS_TARGET:
        size = max(1, int(HEAD_CLUSTER / i ** ZIPF_S))
        template = rng.choice(VOCAB, size=DOC_WORDS, replace=True)
        for _ in range(min(size, N_DOCS_TARGET - len(texts))):
            words = template.copy()
            n_mut = int(rng.integers(0, MUTATIONS + 1))
            for _ in range(n_mut):
                words[int(rng.integers(0, DOC_WORDS))] = int(rng.integers(0, VOCAB))
            texts.append(" ".join(vocab[w] for w in words))
            cluster_of.append(i)
        i += 1

    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": texts,
            "source": ["zipf_c%d" % c for c in cluster_of],
        }),
        os.path.join(out_dir, "documents.parquet"),
    )
    return out_dir


N_VECS_TARGET = 5000          # ~2.5× sf0.1 embedding count
EMB_DIM = 64
EMB_NOISE = 0.02              # intra-cluster noise (cos ≈ 0.999 ≫ threshold)


def generate_zipf_embeddings(out_dir: str) -> str:
    """Write embeddings.parquet with Zipf-distributed NEAR-IDENTICAL vector
    clusters — the embedding-space analogue of template boilerplate: a
    ~HEAD_CLUSTER-member cluster collapses into ONE IVF quantizer cell and
    ONE sign-LSH bucket, the skew the chunked cell kernel and the kNN
    bucket cap exist for (the organic fixture's near-orthogonal vectors
    never exceed ~cap/4 per bucket)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(SEED)
    vecs: list[np.ndarray] = []
    labels: list[int] = []
    i = 1
    while len(vecs) < N_VECS_TARGET:
        size = max(1, int(HEAD_CLUSTER / i ** ZIPF_S))
        center = rng.standard_normal(EMB_DIM)
        center /= np.linalg.norm(center)
        for _ in range(min(size, N_VECS_TARGET - len(vecs))):
            v = center + EMB_NOISE * rng.standard_normal(EMB_DIM)
            vecs.append((v / np.linalg.norm(v)).astype(np.float32))
            labels.append(i % 10)
        i += 1
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.table({
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }),
        os.path.join(out_dir, "embeddings.parquet"),
    )
    return out_dir


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_zipf"
    sf_dir = generate_zipf_corpus(out_dir)
    generate_zipf_embeddings(out_dir)

    from pyspark.sql import functions as F

    from tf_idf_using_mapreduce_spark.session import get_spark
    from tf_idf_using_mapreduce_spark.operators import dedup as dd

    spark = get_spark("skew_bench")
    results: dict[str, dict] = {}

    # warmup (JVM + codegen) outside every measured window
    dd.dedup_exact(spark, sf_dir).collect()

    production_cap = dd.LSH_BUCKET_CAP
    for label, cap in (("capped", production_cap), ("uncapped", 1 << 60)):
        dd.LSH_BUCKET_CAP = cap
        try:
            for qname, fn in (
                ("dedup_minhash_lsh", dd.dedup_minhash_lsh),
                ("dedup_incremental", dd.dedup_incremental),
            ):
                # min-of-2: the first pass pays this plan's codegen, which
                # would otherwise bias whichever variant runs first
                best, n_pairs = float("inf"), 0
                for _ in range(2):
                    t0 = time.time()
                    n_pairs = fn(spark, sf_dir).count()
                    best = min(best, time.time() - t0)
                results.setdefault(qname, {})[label] = {
                    "sec": round(best, 3), "pairs": n_pairs,
                }
        finally:
            dd.LSH_BUCKET_CAP = production_cap

    # containment: the hot key is the FINGERPRINT (~100 per doc, so the
    # head cluster makes ~100 hot buckets of 1500 members each — candidate
    # mass ~100 × 1500²/2 uncapped). Single uncapped pass (no min-of-2):
    # the point is the order-of-magnitude gap, and two uncapped passes
    # would dominate the harness wall-clock.
    fp_cap = dd.FP_DOC_CAP
    for label, cap, reps in (("capped", fp_cap, 2), ("uncapped", 1 << 60, 1)):
        dd.FP_DOC_CAP = cap
        try:
            best, n_pairs = float("inf"), 0
            for _ in range(reps):
                t0 = time.time()
                n_pairs = dd.dedup_containment(spark, sf_dir).count()
                best = min(best, time.time() - t0)
            results.setdefault("dedup_containment", {})[label] = {
                "sec": round(best, 3), "pairs": n_pairs,
            }
        finally:
            dd.FP_DOC_CAP = fp_cap

    # ExactSubstr (r10): the head template cluster's members share nearly
    # every W-token window, so each shared window fingerprint is a
    # ~HEAD_CLUSTER-member hot bucket (~DOC_WORDS − W + 1 of them from the
    # head template alone). Same Σ min(bucket, cap)² amputation as
    # containment, but the uncapped blowup ALSO floods the gaps-and-islands
    # window stage with ~cluster²/2 × positions match rows — the measured
    # span mass is the honest cost: those 1500² near-dup spans are exactly
    # what doc-level dedup (run FIRST in a real pipeline) should have
    # collapsed before ExactSubstr runs.
    sub_cap = dd.SUBSTR_FP_CAP
    for label, cap, reps in (("capped", sub_cap, 2), ("uncapped", 1 << 60, 1)):
        dd.SUBSTR_FP_CAP = cap
        try:
            best, n_spans = float("inf"), 0
            for _ in range(reps):
                t0 = time.time()
                n_spans = dd.dedup_substring(spark, sf_dir).count()
                best = min(best, time.time() - t0)
            results.setdefault("dedup_substring", {})[label] = {
                "sec": round(best, 3), "spans": n_spans,
            }
        finally:
            dd.SUBSTR_FP_CAP = sub_cap

    # two-star CC over the capped LSH pair graph: the head cluster is a
    # near-clique component ~HEAD_CLUSTER wide; rounds must stay ~log2 of
    # the component size, nowhere near its diameter-free member count
    edges = dd.dedup_minhash_lsh(spark, sf_dir).localCheckpoint(eager=True)
    stats: dict = {}
    t0 = time.time()
    labels_df = dd.connected_components_twostar(edges, stats=stats)
    comp = labels_df.groupBy("cluster_id").count()
    agg = comp.agg(
        F.count(F.lit(1)).alias("n_components"),
        F.max("count").alias("max_component"),
    ).collect()[0]
    twostar_sec = time.time() - t0
    results["dedup_clusters_twostar"] = {
        "sec": round(twostar_sec, 3),
        "rounds": stats.get("rounds"),
        "n_components": agg["n_components"],
        "max_component": agg["max_component"],
    }

    # embedding skew (r9): the head cluster is ONE hot IVF cell / sign
    # bucket. dedup_embedding_ivf has no cap — its output is genuinely
    # quadratic in the cluster (the near-dup pairs ARE the answer) — so the
    # measurement pins the chunked cell kernel's throughput on a >chunk-size
    # cell (1500 > 1024: the slab path actually runs). The kNN-LSH route is
    # capped: uncapped, every head-cluster query scores the full 1500-member
    # bucket (~2.2M candidate dots through the per-bucket GEMM).
    from tf_idf_using_mapreduce_spark.operators import similarity as sim

    best, n_pairs = float("inf"), 0
    for _ in range(2):
        t0 = time.time()
        n_pairs = sim.dedup_embedding_ivf(spark, sf_dir).count()
        best = min(best, time.time() - t0)
    results["dedup_embedding_ivf"] = {
        "hot_cell": {"sec": round(best, 3), "pairs": n_pairs}
    }

    # image perceptual hash (r11): the head template cluster's members differ
    # by <= 2 words out of 80, so their letters-stream byte grids — and
    # usually their aHash band keys — collide: every such band bucket is a
    # ~HEAD_CLUSTER-member hot bucket, the image-side analogue of the
    # template boilerplate the text caps amputate. Measured capped vs
    # uncapped like the text family.
    from tf_idf_using_mapreduce_spark.operators import multimodal as mmod

    # dedup_image_phash reads dd.LSH_BUCKET_CAP at call time (function-local
    # import), so the same patch point as the text family applies
    for label, cap, reps in (("capped", production_cap, 2), ("uncapped", 1 << 60, 1)):
        dd.LSH_BUCKET_CAP = cap
        try:
            best, n_pairs = float("inf"), 0
            for _ in range(reps):
                t0 = time.time()
                n_pairs = mmod.dedup_image_phash(spark, sf_dir).count()
                best = min(best, time.time() - t0)
            results.setdefault("dedup_image_phash", {})[label] = {
                "sec": round(best, 3), "pairs": n_pairs,
            }
        finally:
            dd.LSH_BUCKET_CAP = production_cap

    # audio + video near-dup (r11 cont.): the head template cluster shares
    # nearly every frame window, so every audio frame-fingerprint bucket and
    # every video keyframe-hash bucket is a ~HEAD_CLUSTER-member hot bucket —
    # and unlike the image row (one hash/doc, 4 bands) there are ~dozens of
    # windows per doc, so the uncapped pair mass is an order of magnitude
    # worse. Both operators read dd.LSH_BUCKET_CAP at call time (function-
    # local imports), the same patch point as the text family.
    for qname, fn in (
        ("dedup_audio_fingerprint", mmod.dedup_audio_fingerprint),
        ("dedup_video_frames", mmod.dedup_video_frames),
    ):
        for label, cap, reps in (("capped", production_cap, 2), ("uncapped", 1 << 60, 1)):
            dd.LSH_BUCKET_CAP = cap
            try:
                best, n_pairs = float("inf"), 0
                for _ in range(reps):
                    t0 = time.time()
                    n_pairs = fn(spark, sf_dir).count()
                    best = min(best, time.time() - t0)
                results.setdefault(qname, {})[label] = {
                    "sec": round(best, 3), "pairs": n_pairs,
                }
            finally:
                dd.LSH_BUCKET_CAP = production_cap

    # SemDeDup composition (r10 verdict #4): dedup_embedding_ivf above times
    # the hot CELL's pair kernel, but semdedup_prune composes it with
    # two-star CC and the survivor election — on the Zipf embeddings the
    # head template cluster is ONE ~HEAD_CLUSTER-member semantic-duplicate
    # group, so this row pins (a) the composed wall-clock on a >chunk-size
    # cell, (b) the CC round count at ~log2(component) — never the
    # member count — and (c) survivor STABILITY: two runs must elect the
    # identical keeper set (the election is min-affinity/min-id over
    # COS_ROUND-rounded affinities — no float-order wobble).
    sem_stats: dict = {}
    best = float("inf")
    kept_sets = []
    for _ in range(2):
        t0 = time.time()
        out = sim.semdedup_prune(spark, sf_dir, stats=sem_stats)
        kept_sets.append({
            r["vec_id"] for r in out.where("kept").select("vec_id").collect()
        })
        best = min(best, time.time() - t0)
    sem_groups = sim.semdedup_prune(spark, sf_dir).groupBy("cluster_id").count()
    sem_agg = sem_groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.max("count").alias("max_group"),
    ).collect()[0]
    results["semdedup_prune"] = {
        "hot_cluster": {
            "sec": round(best, 3),
            "cc_rounds": sem_stats.get("rounds"),
            "n_vecs": N_VECS_TARGET,
            "n_kept": len(kept_sets[0]),
            "max_group": sem_agg["max_group"],
            "survivors_stable": kept_sets[0] == kept_sets[1],
        }
    }

    # Bloom-pruned incremental exact dedup (round 11): the claim is the
    # PRE-FILTER's selectivity — how much of the daily batch the confirm
    # join never sees. The Zipf corpus's near-dup clusters are MUTATED
    # copies (exact-dup rate ~0), the adversarial case for a filter that
    # must not leak: survivors ≈ true dups + false positives, so the
    # survivor count directly exhibits the fpp at the observed filter
    # occupancy. Also re-verifies zero false negatives (report dups ==
    # unfiltered probe dups) on skewed data.
    _batch, _idx, _occ, _pruned = dd._bloom_split_and_prune(spark, sf_dir)
    best, n_dup = float("inf"), 0
    for _ in range(2):
        t0 = time.time()
        n_dup = dd.dedup_incremental_bloom(spark, sf_dir).where("is_dup").count()
        best = min(best, time.time() - t0)
    _plain_dups = (
        _batch.join(_idx.select(F.col("doc_id").alias("dup_of"), "h"), "h")
        .select("doc_id").distinct().count()
    )
    results["dedup_incremental_bloom"] = {
        "selectivity": {
            "sec": round(best, 3),
            "batch_rows": _batch.count(),
            "filter_survivors": _pruned.count(),
            "occupied_positions": _occ.count(),
            "bloom_bits": dd.BLOOM_BITS,
            "true_dups": _plain_dups,
            "report_dups": n_dup,
        }
    }

    # skew-JOIN twins (round 12): a fact ⨝ dimension join where ONE power
    # user owns 90% of the fact rows — the hot-key shape AQE's runtime
    # skew-join split and the salted twin both exist for. Three cells on the
    # same data: AQE split ON (the production posture; the final plan's
    # skew=true marker is recorded, not assumed), split OFF (the unmitigated
    # baseline — one task owns the hot partition), and the compile-time
    # salted twin. Broadcast is disabled so the join actually sort-merges
    # (the dimension is "too big to broadcast" at 100 TB user counts);
    # thresholds are scaled to the harness data exactly as in
    # tests/test_skew.py.
    from tf_idf_using_mapreduce_spark.functions.skew import (
        SKEW_JOIN_DEMO_CONFS,
        hot_user_event_rows,
    )
    from tf_idf_using_mapreduce_spark.operators import relational as rel

    join_dir = os.path.join(out_dir, "skew_join")
    spark.createDataFrame(
        hot_user_event_rows(), "user_id long, event_type string, value double"
    ).repartition(16).write.mode("overwrite").parquet(
        os.path.join(join_dir, "events.parquet"))
    _join_confs = SKEW_JOIN_DEMO_CONFS
    _prev_confs = {k: spark.conf.get(k) for k in _join_confs}
    _prev_confs["spark.sql.adaptive.skewJoin.enabled"] = spark.conf.get(
        "spark.sql.adaptive.skewJoin.enabled")
    try:
        for k, v in _join_confs.items():
            spark.conf.set(k, v)
        join_cells: dict[str, dict] = {}
        for label, skew_on, fn in (
            ("aqe_split", "true", rel.events_segment_revenue),
            ("unmitigated", "false", rel.events_segment_revenue),
            ("salted", "false", rel.events_segment_revenue_salted),
        ):
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew_on)
            best, plan = float("inf"), ""
            for _ in range(2):
                t0 = time.time()
                q = fn(spark, join_dir)
                n_rows = len(q.collect())
                best = min(best, time.time() - t0)
                plan = q._jdf.queryExecution().executedPlan().toString()
            join_cells[label] = {
                "sec": round(best, 3),
                "rows": n_rows,
                "skew_split_in_plan": "SortMergeJoin(skew=true)" in plan,
                "salted_key_in_plan": "_salt" in plan,
            }
        results["events_segment_revenue"] = join_cells
    finally:
        for k, v in _prev_confs.items():
            spark.conf.set(k, v)

    knn_cap = sim.KNN_LSH_BUCKET_CAP
    for label, cap, reps in (("capped", knn_cap, 2), ("uncapped", 1 << 60, 1)):
        sim.KNN_LSH_BUCKET_CAP = cap
        try:
            best, n_rows = float("inf"), 0
            for _ in range(reps):
                t0 = time.time()
                n_rows = sim.knn_label_agreement_lsh(spark, sf_dir).count()
                best = min(best, time.time() - t0)
            results.setdefault("knn_label_agreement_lsh", {})[label] = {
                "sec": round(best, 3), "rows": n_rows,
            }
        finally:
            sim.KNN_LSH_BUCKET_CAP = knn_cap

    print(json.dumps({
        "metric": "skew_bench",
        "corpus": {
            "n_docs": N_DOCS_TARGET,
            "head_cluster": HEAD_CLUSTER,
            "zipf_s": ZIPF_S,
            "cap": production_cap,
        },
        "queries": results,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
