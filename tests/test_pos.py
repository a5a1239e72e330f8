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
