"""BPE subword tokenizer: merge-table pinning, py-vs-SQL apply parity,
oracle parity of both registered queries, and the token-basis semantics."""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_SMOKE, assert_query_matches_oracle
from tf_idf_using_mapreduce_spark.functions import bpe as B
from tf_idf_using_mapreduce_spark.operators import bpe as ops


@pytest.mark.parametrize("name", ["bpe_token_counts", "pack_sequences_bpe"])
def test_oracle_parity(spark, name):
    assert_query_matches_oracle(spark, name)


def test_committed_merge_table_reproduces_from_fixture_corpus():
    """The committed resources/bpe_merges.txt IS tools/train_bpe.py run on
    the sf0.001 fixture corpus — the merge-parity pin (r10 verdict #1): if
    training drifts (tie-break, count basis, merge application), this test
    names the divergence instead of 40 downstream hash mismatches."""
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT word, count(*) FROM (SELECT unnest({B.WORD_TOKENS}) AS word "
        f"FROM read_parquet('{SF_SMOKE}/documents.parquet')) t GROUP BY word"
    ).fetchall()
    con.close()
    trained = [f"{a} {b}" for a, b in B.train_bpe(dict(rows))]
    assert trained == B.load_merges()


def test_segment_matches_recursive_cte_on_vocab_and_adversarial_words():
    """The apply loop's engine-parity contract: Python bpe_segment and the
    DuckDB recursive CTE must agree symbol-for-symbol — on the full fixture
    vocabulary AND on adversarial out-of-vocabulary forms (repeated symbols
    where leftmost-first matters, merge cascades, single chars, long
    unmergeable strings)."""
    ranks = B.merge_ranks()
    con = duckdb.connect()
    words = [r[0] for r in con.sql(
        f"SELECT DISTINCT unnest({B.WORD_TOKENS}) AS word "
        f"FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()]
    words += ["aaaa", "erer", "ererer", "x", "scanscan", "partpart",
              "colucolu", "inin", "zz" * 20, "smallsmall", "rowrow"]
    vals = ", ".join(f"('{w}')" for w in words)
    q = (f"WITH RECURSIVE wc AS (SELECT word FROM (VALUES {vals}) t(word)),\n"
         f"{B.bpe_seg_ctes()}\nSELECT word, syms FROM bpe_final")
    duck = dict(con.sql(q).fetchall())
    con.close()
    for w in words:
        assert duck[w] == B.bpe_segment(w, ranks), w


def test_segment_semantics_pinned():
    """Deterministic-variant semantics on a hand-built table: lowest rank
    wins over textual order, leftmost occurrence wins within a rank, merges
    can cascade into newly created symbols."""
    ranks = {"a b": 0, "ab c": 1, "e f": 2, "a ab": 3}
    assert B.bpe_segment("abcabc", ranks) == ["abc", "abc", "</w>"]
    # leftmost 'a b' at pos 2 -> [a, ab]; the merge CREATES 'a ab' (rank 3),
    # which the next step consumes — the cascade case
    assert B.bpe_segment("aab", ranks) == ["aab", "</w>"]
    assert B.bpe_segment("aab", {"a b": 0, "ab c": 1}) == ["a", "ab", "</w>"]
    assert B.bpe_segment("ef", ranks) == ["ef", "</w>"]
    assert B.bpe_segment("xyz", ranks) == ["x", "y", "z", "</w>"]
    # every segmentation ends with an end-of-word-marked symbol
    assert B.bpe_segment("q", {})[-1] == B.END_OF_WORD


def test_token_census_counts_repeated_symbol_per_occurrence(spark):
    """'small' segments to [s, m, a, l, l, </w>] under the committed table:
    one corpus occurrence of the word must add 2 to 'l' but only 1 to its
    n_words membership."""
    ranks = B.merge_ranks()
    assert B.bpe_segment("small", ranks) == ["s", "m", "a", "l", "l", "</w>"]
    rows = {r["token"]: r for r in ops.bpe_token_counts(spark, SF_SMOKE).collect()}
    con = duckdb.connect()
    n_small = con.sql(
        f"SELECT count(*) FROM (SELECT unnest({B.WORD_TOKENS}) AS w FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')) t WHERE w = 'small'"
    ).fetchone()[0]
    con.close()
    # 'l' appears ONLY in 'small' and 'table'/'value'/'filter'? — derive the
    # exact expectation from the dictionary instead of guessing
    words = [r[0] for r in duckdb.sql(
        f"SELECT w FROM (SELECT unnest({B.WORD_TOKENS}) AS w FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')) t GROUP BY w"
    ).fetchall()]
    per_word = {w: B.bpe_segment(w, ranks).count("l") for w in words}
    assert per_word["small"] == 2
    assert rows["l"]["n_words"] == sum(1 for v in per_word.values() if v > 0)
    assert n_small > 0  # the fixture really exercises the double-count path


def test_bpe_packing_expands_sequence_count(spark):
    """The basis correction is material: the committed table averages >2
    subwords per word on the fixture stream, so the BPE packer must produce
    correspondingly more MAX_SEQ-token sequences than the word packer —
    same total-token conservation law as the word packer (sum of n_tokens
    == total subword count)."""
    from tf_idf_using_mapreduce_spark.operators.packing import pack_sequences

    bpe_seqs = ops.pack_sequences_bpe(spark, SF_SMOKE).toPandas()
    word_seqs = pack_sequences(spark, SF_SMOKE).toPandas()
    assert len(bpe_seqs) > 2 * len(word_seqs)
    # conservation: every subword token lands in exactly one sequence
    con = duckdb.connect()
    total = con.sql(
        f"WITH RECURSIVE w AS (SELECT unnest({B.WORD_TOKENS}) AS word FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')), "
        f"wc AS (SELECT DISTINCT word FROM w), {B.bpe_seg_ctes()} "
        f"SELECT sum(len(f.syms)) FROM w JOIN bpe_final f USING (word)"
    ).fetchone()[0]
    con.close()
    assert int(bpe_seqs["n_tokens"].sum()) == int(total)


def test_bpe_fertility_oracle_parity(spark):
    assert_query_matches_oracle(spark, "bpe_fertility")


def test_bpe_fertility_semantics(spark):
    """The metrics cross-check against first principles on the fixture:
    fertility = n_subwords/n_words exactly; the fused count matches the
    dictionary ('a' and 'scan' fuse under the committed table); the char
    mass per subword sits between 1 (all single chars) and the longest
    word."""
    row = ops.bpe_fertility(spark, SF_SMOKE).collect()[0]
    assert row["n_subwords"] > 2 * row["n_words"]  # genuinely subword-ish
    assert row["fertility"] == round(row["n_subwords"] / row["n_words"], 6)
    assert row["vocab_words"] == 31 and row["fused_words"] == 2
    assert 1.0 < row["chars_per_subword"] < 8.0


def test_bpe_source_fertility_consistent_with_corpus(spark):
    """The n-weighted mean of per-source fertility equals the corpus-level
    fertility, and the subword masses sum to the corpus census."""
    from tf_idf_using_mapreduce_spark.operators import bpe as b

    per = b.bpe_source_fertility(spark, SF_SMOKE).collect()
    corpus = b.bpe_fertility(spark, SF_SMOKE).collect()[0]
    assert sum(r["n_words"] for r in per) == corpus["n_words"]
    assert sum(r["n_subwords"] for r in per) == corpus["n_subwords"]
    assert abs(sum(r["n_subwords"] for r in per) / sum(r["n_words"] for r in per)
               - corpus["fertility"]) < 1e-6
    for r in per:
        assert r["fertility"] >= 1.0  # a word is at least one subword
