"""POS tagging: rule-tagger unit tests, pairs-vs-stripes equivalence, oracle
parity (SURVEY.md §2.2 P8/P9, §2.4 A1/A2)."""

from __future__ import annotations

from tests.conftest import SF_SMOKE, assert_query_matches_oracle
from tf_idf_using_mapreduce_spark.functions.postag import pos_tag_py, pos_tag_sql
from tf_idf_using_mapreduce_spark.operators.pos import pos_counts, pos_counts_stripes

CASES = {
    "the": "DET", "a": "DET", "it": "PRON", "is": "AUX", "of": "ADP",
    "and": "CCONJ", "if": "SCONJ", "not": "PART", "very": "ADV",
    "fast": "ADJ", "slow": "ADJ", "big": "ADJ", "small": "ADJ",
    "quickly": "ADV", "running": "VERB", "jumped": "VERB", "famous": "ADJ",
    "helpful": "ADJ", "readable": "ADJ", "123": "NUM", ".": "PUNCT",
    ",": "PUNCT", "table": "NOUN", "query": "NOUN", "spark": "NOUN",
    "ing": "NOUN", "ed": "NOUN",  # suffix rules require a real stem prefix
}


def test_tag_rules_python():
    bad = {w: (pos_tag_py(w), exp) for w, exp in CASES.items() if pos_tag_py(w) != exp}
    assert not bad, bad


def test_tag_rules_sql_matches_python(duck):
    vals = ", ".join(f"('{w}')" for w in CASES)
    rows = duck.execute(
        f"SELECT token, {pos_tag_sql('token')} FROM (VALUES {vals}) v(token)"
    ).fetchall()
    bad = {w: (got, pos_tag_py(w)) for w, got in rows if got != pos_tag_py(w)}
    assert not bad, bad


# Non-ASCII single chars — exactly what the SimpleTokenizer-style regex emits
# for them ([^A-Za-z0-9 ] matches one char at a time). These are the round-8
# advisor's parity break (case-changing letters 'É'/'Ж'), the Unicode-digit
# latent twin ('٣', '²'), and the engine-lower() hazard ('İ' U+0130: DuckDB
# lowers with the simple mapping → 'i', Python/Java with the full mapping →
# 'i'+U+0307) — all must tag PUNCT/SYM identically in Python, Spark SQL, and
# DuckDB SQL now that the punctuation gate never calls lower().
UNICODE_TOKENS = [
    "É", "Ж", "é", "ж", "ß", "ẞ", "٣", "²", "½", "İ", "ı", "Σ", "σ",
    "Ç", "ç", "Ø", "ø", "Ⅷ", "〇", "一", "ア", "한", "🙂", "…", "—",
    "«", "»", "Ｅ", "ｅ", "Ⓐ",
    # the EMPTY token: SQL's translate('', digits, '') = '' would claim
    # NUM/CD without the length > 0 guard while the Python twins fall
    # through to PUNCT/SYM (ADVICE r9) — pinned here across all 3 engines
    "",
]
MIXED_TOKENS = list(CASES) + ["THE", "Is", "OF", "Tables", "GLASS", "To", "WILL"]


def test_tag_rules_unicode_parity(spark, duck):
    from tf_idf_using_mapreduce_spark.functions.postag import penn_tag_py, penn_tag_sql

    toks = UNICODE_TOKENS + MIXED_TOKENS
    for t in UNICODE_TOKENS:
        assert pos_tag_py(t) == "PUNCT", t
        assert penn_tag_py(t) == "SYM", t
    vals = ", ".join(f"('{t}')" for t in toks)
    duck_rows = duck.execute(
        f"SELECT token, {pos_tag_sql('token')}, {penn_tag_sql('token')} "
        f"FROM (VALUES {vals}) v(token)"
    ).fetchall()
    bad = [(t, ud, pn, pos_tag_py(t), penn_tag_py(t)) for t, ud, pn in duck_rows
           if (ud, pn) != (pos_tag_py(t), penn_tag_py(t))]
    assert not bad, bad
    sdf = spark.createDataFrame([(t,) for t in toks], "token string")
    spark_rows = sdf.selectExpr(
        "token", f"{pos_tag_sql('token')} AS ud", f"{penn_tag_sql('token')} AS pn"
    ).collect()
    bad = [(r["token"], r["ud"], r["pn"]) for r in spark_rows
           if (r["ud"], r["pn"]) != (pos_tag_py(r["token"]), penn_tag_py(r["token"]))]
    assert not bad, bad


def test_pairs_equals_stripes(spark):
    pairs = {(r["tag"], r["cnt"]) for r in pos_counts(spark, SF_SMOKE).collect()}
    stripes = {(r["tag"], r["cnt"]) for r in pos_counts_stripes(spark, SF_SMOKE).collect()}
    assert pairs == stripes and len(pairs) > 0


def test_pos_counts_oracle_parity(spark):
    assert_query_matches_oracle(spark, "pos_counts")


def test_pos_counts_total_equals_token_count(spark, duck):
    total = sum(r["cnt"] for r in pos_counts(spark, SF_SMOKE).collect())
    expected = duck.execute(
        "SELECT sum(len(regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9 ])', 1))) FROM documents"
    ).fetchone()[0]
    assert total == expected


def test_pos_counts_plan_is_pure_jvm(spark):
    plan = pos_counts(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan[:1500]


def test_model_swap_seam_one_load_per_task(spark, tmp_path):
    """VERDICT r1 item 6: push a non-trivial per-executor 'model' through the
    mapInPandas stripes seam — the factory must run once per TASK (not per
    batch/row), and the swapped model's counts must equal the rule tagger's
    when it delegates to the same tagging function."""
    from tf_idf_using_mapreduce_spark.operators.pos import pos_counts, pos_counts_stripes

    marker = str(tmp_path / "model_loads.log")

    def factory():
        # simulate an expensive model load: record the event, build real state
        import os
        import uuid

        with open(marker, "a") as f:
            f.write(f"{os.getpid()}:{uuid.uuid4()}\n")
        from tf_idf_using_mapreduce_spark.functions.postag import pos_tag_py

        model = {"vocab": {f"w{i}": i for i in range(10_000)}}  # non-trivial state

        def tagger(tok: str) -> str:
            assert model["vocab"]  # the loaded state is live in the closure
            return pos_tag_py(tok)

        return tagger

    swapped = {(r["tag"], r["cnt"])
               for r in pos_counts_stripes(spark, SF_SMOKE, tagger_factory=factory).collect()}
    rule = {(r["tag"], r["cnt"]) for r in pos_counts(spark, SF_SMOKE).collect()}
    assert swapped == rule

    with open(marker) as f:
        loads = f.read().splitlines()
    n_rows = 500  # sf0.001 documents
    max_tasks = spark.sparkContext.defaultParallelism
    assert 1 <= len(loads) <= max_tasks < n_rows


def test_model_swap_keeps_plan_shape(spark):
    """Swapping the tagger model must not change the physical plan: same
    mapInPandas partial-stripe + two-level aggregate, whichever model is
    inside the closure (round-6 verdict item — the seam is data, not
    plan)."""
    from tests.test_textstats import _plan_shape
    from tf_idf_using_mapreduce_spark.operators.pos import pos_counts_stripes

    base = pos_counts_stripes(spark, SF_SMOKE)
    swapped = pos_counts_stripes(spark, SF_SMOKE, tagger_factory=lambda: (lambda tok: "X"))
    assert _plan_shape(base) == _plan_shape(swapped)
    plan = base._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "HashAggregate" in plan, plan[:1500]


PENN_CASES = {
    # inventory-splitting cases the UD ruleset cannot express
    "to": "TO", "of": "IN", "because": "IN",      # UD: ADP vs SCONJ; Penn merges, TO splits
    "will": "MD", "is": "VBZ", "are": "VBP",      # UD: all AUX
    "was": "VBD", "be": "VB", "been": "VBN", "being": "VBG",
    "his": "PRP$", "who": "WP", "them": "PRP",    # UD: all PRON
    "tables": "NNS", "table": "NN",               # UD: both NOUN
    "glass": "NN",                                # -ss guard: not plural
    "running": "VBG", "jumped": "VBD",            # UD: both VERB
    ",": ",", ".": ".", ";": ":", "#": "SYM",     # UD: all PUNCT
    "123": "CD", "quickly": "RB", "not": "RB",
    "the": "DT", "and": "CC", "famous": "JJ", "fast": "JJ",
}


def test_penn_tag_rules_python():
    from tf_idf_using_mapreduce_spark.functions.postag import penn_tag_py

    bad = {w: (penn_tag_py(w), exp) for w, exp in PENN_CASES.items()
           if penn_tag_py(w) != exp}
    assert not bad, bad


def test_penn_tag_rules_sql_matches_python(duck):
    from tf_idf_using_mapreduce_spark.functions.postag import penn_tag_py, penn_tag_sql

    vals = ", ".join(f"('{w}')" for w in PENN_CASES)
    rows = duck.execute(
        f"SELECT token, {penn_tag_sql('token')} FROM (VALUES {vals}) v(token)"
    ).fetchall()
    bad = {w: (got, penn_tag_py(w)) for w, got in rows if got != penn_tag_py(w)}
    assert not bad, bad


def test_pos_counts_penn_oracle_parity(spark):
    assert_query_matches_oracle(spark, "pos_counts_penn")


def test_penn_seam_carries_different_inventory(spark):
    """The round-8 seam proof: the SAME stripes pipeline, swapping only the
    tagger_factory, yields a different tag INVENTORY (Penn) with the same
    total token mass — i.e. the seam swaps the model, not the pipeline.
    Runs over a purpose-built corpus because the driver fixture's synthetic
    vocabulary never exercises plurals/prepositions/punctuation (its UD
    profile is exactly {DET, ADJ, NOUN}); on that fixture the swap is still
    visible as DT/JJ/NN, which the oracle-parity test covers."""
    import tempfile

    from tf_idf_using_mapreduce_spark.operators.pos import pos_counts_penn

    rows = [
        (1, "the queries ran to completion because all tables will fit ."),
        (2, "it was running quickly , and not once did his glass break ;"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(f"{d}/documents.parquet")
        ud = {r["tag"]: r["cnt"] for r in pos_counts(spark, d).collect()}
        penn = {r["tag"]: r["cnt"] for r in pos_counts_penn(spark, d).collect()}
    # genuinely different inventories...
    assert "NOUN" in ud and "NOUN" not in penn
    assert "NN" in penn and "NNS" in penn and "IN" in penn and "TO" in penn
    assert "ADP" in ud and "ADP" not in penn
    # ...over the same token stream (total mass conserved)
    assert sum(ud.values()) == sum(penn.values())
    # the merge really merges: Penn IN collects UD's ADP + SCONJ minus TO
    assert penn["IN"] == ud["ADP"] + ud.get("SCONJ", 0) - penn["TO"]
    # plural split carves NOUN, punctuation gets Penn's ','/'.'/':' tags
    assert penn["NN"] + penn["NNS"] <= ud["NOUN"]
    assert penn["."] == 1 and penn[","] == 1 and penn[":"] == 1
