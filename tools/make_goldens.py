"""Regenerate the checked-in golden files (tests/golden/) from the
INDEPENDENT pure-Python implementation — no Spark, no DuckDB (FIXTURES.md
"Golden outputs"). Run after a deliberate semantic change; tests compare the
engine against these files, so accidental behavior drift fails loudly.

    python tools/make_goldens.py
"""

from __future__ import annotations

import math
import os
import re
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from tf_idf_using_mapreduce_spark.functions.porter import porter_stem_py
from tf_idf_using_mapreduce_spark.functions.postag import pos_tag_py
from tf_idf_using_mapreduce_spark.sources.corpus import stopwords

SF_DIR = "/root/testdata/sf0.001"
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden")

POS_TOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]")


def main() -> int:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    con.close()
    stops = set(stopwords())

    # tokenize / stop-filter / stem
    doc_terms: dict[int, list[str]] = {}
    vocab: set[str] = set()
    for doc_id, text in docs:
        toks = re.findall(r"[a-z]+", text.lower())
        vocab.update(toks)
        doc_terms[doc_id] = [porter_stem_py(t) for t in toks if t not in stops]

    # stemmer parity anchor over the full corpus vocabulary
    with open(os.path.join(GOLDEN_DIR, "stemmer_parity.tsv"), "w") as fh:
        for tok in sorted(vocab):
            fh.write(f"{tok}\t{porter_stem_py(tok)}\n")

    # DF top-100
    df_counts: dict[str, set] = defaultdict(set)
    for doc_id, terms in doc_terms.items():
        for t in terms:
            df_counts[t].add(doc_id)
    top = sorted(((t, len(s)) for t, s in df_counts.items()), key=lambda kv: (-kv[1], kv[0]))[:100]
    with open(os.path.join(GOLDEN_DIR, "df_top100.tsv"), "w") as fh:
        for term, df in top:
            fh.write(f"{term}\t{df}\n")

    # TF-IDF (intended semantics, score = tf * ln(10000/(df+1)), 6dp)
    vocab_df = dict(top)
    with open(os.path.join(GOLDEN_DIR, "tfidf.tsv"), "w") as fh:
        for doc_id in sorted(doc_terms):
            tf = Counter(t for t in doc_terms[doc_id] if t in vocab_df)
            for term in sorted(tf):
                score = round(tf[term] * math.log(10000.0 / (vocab_df[term] + 1)), 6)
                fh.write(f"{doc_id}\t{term}\t{tf[term]}\t{score:.6f}\n")

    # POS counts (rule tagger, SimpleTokenizer-style tokens)
    tags: Counter = Counter()
    for _, text in docs:
        for tok in POS_TOKEN_RE.findall(text):
            tags[pos_tag_py(tok)] += 1
    with open(os.path.join(GOLDEN_DIR, "pos_counts.tsv"), "w") as fh:
        for tag in sorted(tags):
            fh.write(f"{tag}\t{tags[tag]}\n")

    print(f"goldens written to {GOLDEN_DIR}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
