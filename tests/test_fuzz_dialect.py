"""Cross-dialect fuzz: seeded adversarial documents through each shared
Spark expression AND its DuckDB oracle twin. The per-row expression ops
(tokenize, regex, list math, rounding) are exactly where a dialect
divergence would silently skew results at scale while the uniform fixture
stays green — so hammer them with text shapes the fixture never contains:
empty strings, punctuation-only, unicode (incl. astral-plane emoji — Spark
and DuckDB both count code points, verified), single tokens, exact
3-token boundaries, pathological repetition, and long random word soup."""

from __future__ import annotations

import random

import duckdb
import pytest

FUZZ_QUERIES = [
    "curation_filter",
    "text_quality",
    "doc_repetition",
    "token_counts",
    "doc_splits",
    "mixture_sample",
    "source_mixture",
    "dedup_exact",
    # md5-sketch / winnowing surface
    "doc_fingerprints",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "train_eval_contamination",
    # stemmer + DF/TF-IDF surface (the deepest shared SQL expression)
    "doc_freq_top100",
    "tfidf",
    "top_terms_per_doc",
    "bigram_pmi",
    # misc per-row / window
    "lang_id_confusion",
    "stratified_sample",
    "vocab_coverage",
]

_EDGE_TEXTS = [
    "",
    " ",
    "   \t\n  ",
    "123 456 !!! ???",
    "🙂 café 北京 — naïve façade",
    "word",
    "one two three",
    "a b c a b c a b c a b c",           # pure trigram repetition
    "the of and to in is it a an or",    # all stopwords
    "The QUICK brown FOX jumps",
    "x" * 300,                            # one enormous token
    "tab\tsep\tand\nnew\nlines",
    "ALLCAPS SHOUTING TEXT HERE",
    "punct,comma.dot;semi:colon-dash",
    "mixed123digits456inside789words",
]


def _fuzz_rows(n: int = 120, seed: int = 20260813):
    rng = random.Random(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "the", "of", "zz", "qx",
             "lorem", "ipsum", "dolor", "sit", "amet", "kappa", "omega"]
    rows = []
    for i, t in enumerate(_EDGE_TEXTS):
        rows.append((i, t, "en", f"src{i % 20}", len(t)))
    for i in range(len(_EDGE_TEXTS), n):
        k = rng.randint(0, 60)
        text = " ".join(rng.choice(vocab) for _ in range(k))
        if rng.random() < 0.2:  # splice punctuation/digit noise mid-text
            text = text + " 42! " + text[: rng.randint(0, len(text))]
        rows.append((i, text, rng.choice(["en", "de", "zh"]),
                     f"src{rng.randint(0, 19)}", len(text)))
    return rows


@pytest.fixture(scope="module")
def fuzz_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fuzz"))
    spark.createDataFrame(
        _fuzz_rows(),
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    return d


@pytest.mark.parametrize("name", FUZZ_QUERIES)
def test_dialect_parity_on_adversarial_docs(spark, fuzz_dir, name):
    import __spark_entry__ as e
    from tools.canon import canon_rows

    spdf = e.queries()[name](spark, fuzz_dir).toPandas()
    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; DuckDB reads it via glob
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{fuzz_dir}/documents.parquet/*.parquet')"
    )
    ddf = con.sql(e.oracle_sql()[name]).df()
    con.close()
    assert sorted(spdf.columns) == sorted(ddf.columns), name
    assert len(spdf) == len(ddf), f"{name}: {len(spdf)} != {len(ddf)}"
    s_norm, d_norm = canon_rows(spdf), canon_rows(ddf)
    assert s_norm == d_norm, f"{name}: first diff " + str(
        next(((a, b) for a, b in zip(s_norm, d_norm) if a != b), None)
    )
