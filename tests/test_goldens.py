"""Engine output vs CHECKED-IN golden files (regenerated only deliberately
via tools/make_goldens.py) — guards against silent semantic drift in the
tokenizer/stemmer/tagger/score chain."""

from __future__ import annotations

import os

from tests.conftest import SF_SMOKE

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def _read_tsv(name):
    with open(os.path.join(GOLDEN_DIR, name)) as fh:
        return [line.rstrip("\n").split("\t") for line in fh]


def test_df_top100_matches_golden(spark):
    from tf_idf_using_mapreduce_spark.operators.tfidf import doc_freq

    golden = [(t, int(d)) for t, d in _read_tsv("df_top100.tsv")]
    got = [(r["term"], r["df"]) for r in doc_freq(spark, SF_SMOKE).collect()]
    assert got == golden


def test_tfidf_matches_golden(spark):
    from tf_idf_using_mapreduce_spark.operators.tfidf import tfidf

    golden = {(int(d), t): (int(tf), float(s)) for d, t, tf, s in _read_tsv("tfidf.tsv")}
    got = {(r["doc_id"], r["term"]): (r["tf"], r["score"]) for r in tfidf(spark, SF_SMOKE).collect()}
    assert got == golden


def test_pos_counts_matches_golden(spark):
    from tf_idf_using_mapreduce_spark.operators.pos import pos_counts

    golden = {t: int(c) for t, c in _read_tsv("pos_counts.tsv")}
    got = {r["tag"]: r["cnt"] for r in pos_counts(spark, SF_SMOKE).collect()}
    assert got == golden


def test_stemmer_matches_parity_anchor():
    from tf_idf_using_mapreduce_spark.functions.porter import porter_stem_py

    for tok, stem in _read_tsv("stemmer_parity.tsv"):
        assert porter_stem_py(tok) == stem, tok
