"""Reference-CLI-equivalent pipelines over text-dir corpora: end-to-end
through read_text_corpus (S1/S2) → pipelines → write_tsv (S5/S7) → read_tsv
(S4), including the 2-job filesystem handoff (S8)."""

from __future__ import annotations

import glob
import os

import pytest

CORPUS = {
    "doc1.txt": "the customer query ran fast and the merge was slow",
    "doc2.txt": "a slow table scan beats a fast hash join sometimes",
    "doc3.txt": "query the table with a fast scan then merge results",
}


@pytest.fixture(scope="module")
def text_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    for name, text in CORPUS.items():
        (d / name).write_text(text)
    return str(d)


def test_run_doc_freq_writes_single_tsv(spark, text_dir, tmp_path):
    from tf_idf_using_mapreduce_spark.pipelines import run_doc_freq

    out = str(tmp_path / "out-df")
    df = run_doc_freq(spark, text_dir, out)
    rows = {r["term"]: r["df"] for r in df.collect()}
    # 'the'/'a'/'and'/'was'/'with'/'then' are stop-listed; stems appear
    assert rows.get("queri") == 2 and rows.get("tabl") == 2 and rows.get("fast") == 3
    parts = glob.glob(os.path.join(out, "part-*"))
    assert len(parts) == 1  # single-reducer output contract (S7)
    content = open(parts[0]).read()
    assert "\t" in content


def test_run_tfidf_with_tsv_handoff_matches_fused(spark, text_dir, tmp_path):
    """Reference 2-job shape (DF TSV → IDF side input) == one-DAG shape."""
    from tf_idf_using_mapreduce_spark.pipelines import run_doc_freq, run_tfidf

    df_out = str(tmp_path / "df_out")
    run_doc_freq(spark, text_dir, df_out)
    tsv_file = glob.glob(os.path.join(df_out, "part-*"))[0]

    fused = run_tfidf(spark, text_dir, str(tmp_path / "tfidf_fused"))
    handoff = run_tfidf(spark, text_dir, str(tmp_path / "tfidf_handoff"), df_tsv=tsv_file)

    def key(df):
        return {
            (os.path.basename(r["doc_id"]), r["term"]): (r["tf"], r["score"])
            for r in df.collect()
        }

    assert key(fused) == key(handoff)
    assert len(key(fused)) > 0


def test_run_pos_counts(spark, text_dir, tmp_path):
    from tf_idf_using_mapreduce_spark.pipelines import run_pos_counts

    out = run_pos_counts(spark, text_dir, str(tmp_path / "pos_out"))
    counts = {r["tag"]: r["cnt"] for r in out.collect()}
    total_tokens = sum(len(t.split()) for t in CORPUS.values())
    assert sum(counts.values()) == total_tokens
    assert counts["DET"] >= 5  # 'the'/'a' occurrences
    assert counts["ADJ"] >= 4  # fast/slow
