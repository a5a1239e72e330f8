"""Measure the top-10 most expensive registry queries at sf1.0 (round-8
verdict item 5): one more decade of data as DIRECT evidence for the scaling
narrative's "linear beyond saturation" and "fixed cost" claims.

Prereq: ``python tools/make_sf1.py`` (writes .localdata/sf1.0).
Prints one line per query: name, sf0.1 min-of-3, sf1.0 min-of-3, ratio.
10× data → ratio ≈ 10 is linear; ≪ 10 is fixed-cost-dominated; ≫ 10 is a
scaling bug (the knn_label_agreement_lsh class this round's derived key
width fixed).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# refreshed round 10 from BENCH_FULL.json's slowest cells (the declared
# quadratic baseline dedup_ngram_jaccard is measured separately — a full
# 4-pass run on it costs ~50 min at sf1.0)
TOP10 = [
    "lineitem_price_stats",
    "knn_label_agreement_lsh",
    "semdedup_prune",
    "dedup_containment",
    "dedup_embedding_ivf",
    "tfidf_mllib_topk_overlap",
    "tfidf_doc_similarity",
    "dedup_apply_quality",
    "dedup_clusters_twostar",
    "events_stream_stream_join",
]


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf01 = "/root/testdata/sf0.1"
    sf1 = os.path.join(repo, ".localdata", "sf1.0")
    if not os.path.isdir(sf1):
        raise SystemExit("run tools/make_sf1.py first")

    from tf_idf_using_mapreduce_spark.session import get_spark
    import __spark_entry__ as e

    spark = get_spark("sf1-bench")
    qs = e.queries()
    names = sys.argv[1:] or TOP10
    out = {}
    for name in names:
        row = {}
        for label, sf_dir in (("sf0.1", sf01), ("sf1.0", sf1)):
            qs[name](spark, sf_dir).collect()  # warm: codegen + file listing
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                qs[name](spark, sf_dir).collect()
                best = min(best, time.time() - t0)
            row[label] = round(best, 2)
        row["ratio"] = round(row["sf1.0"] / row["sf0.1"], 1) if row["sf0.1"] else None
        out[name] = row
        print(json.dumps({name: row}), flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
