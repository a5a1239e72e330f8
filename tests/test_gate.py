"""Gate-harness regression tests (VERDICT r1 item 2): the local gate must
predict the driver's verdict. Round 1's two hash failures were DuckDB HUGEINT
columns turning into pandas float64, and one rows-only err was an unhashable
array column — these tests make every oracle and every registry output fail
HERE first if those shapes ever reappear.
"""

from __future__ import annotations

import pandas as pd
import pytest

import __spark_entry__ as e
from tests.conftest import SF_SMOKE
from tools.canon import assert_hashable, canon_cell, canon_rows

ORACLES = sorted(e.oracle_sql())
QUERIES = sorted(e.queries())


def test_hugeint_turns_into_float64_and_canon_catches_it(duck):
    """Canary pinning the round-1 failure mode: DuckDB sums integers to
    HUGEINT, pandas materializes that as float64, and the dtype-faithful
    canon must distinguish it from an int64 column of equal values."""
    pdf = duck.sql("SELECT sum(x) AS s FROM (VALUES (1), (2)) t(x)").df()
    assert pdf["s"].dtype == "float64"  # the trap exists
    good = duck.sql("SELECT CAST(sum(x) AS BIGINT) AS s FROM (VALUES (1), (2)) t(x)").df()
    assert good["s"].dtype == "int64"   # the fix works
    assert canon_rows(pdf) != canon_rows(good)
    assert canon_cell(3) == "int:3" and canon_cell(3.0) == "float:3.0"


def test_canon_rejects_unhashable_columns():
    pdf = pd.DataFrame({"a": [1], "v": [[1.0, 2.0]]})
    with pytest.raises(TypeError):
        assert_hashable(pdf)


@pytest.mark.parametrize("name", ORACLES)
def test_oracle_emits_no_hugeint(duck, name):
    """No oracle output column may be HUGEINT/UHUGEINT (pandas would coerce
    it to float64 and the driver hash would diverge from Spark's int64)."""
    rel = duck.sql(e.oracle_sql()[name])
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper()
    ]
    assert not bad, f"{name}: HUGEINT output columns {bad} — wrap in CAST(... AS BIGINT)"


@pytest.mark.parametrize("name", QUERIES)
def test_registry_output_schema_is_hashable(spark, name):
    """Every registry query's top-level columns must be scalar — the driver
    canonicalizes even rows-only results through pandas hashing, which crashes
    on array/map/struct cells (multimodal_features, round 1). Plan-build only;
    nothing executes."""
    df = e.queries()[name](spark, SF_SMOKE)
    bad = [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]
    assert not bad, f"{name}: non-scalar output columns {bad}"


@pytest.mark.parametrize("name", QUERIES)
def test_no_cartesian_product_in_any_plan(spark, name):
    """Automates the per-round PLANS audit's headline check: no registered
    query may plan a CartesianProduct at any scale. (Single-row
    BroadcastNestedLoopJoins — scalar totals, vocab literals — are benign
    and deliberately not flagged.) Plan-build only for batch queries; the
    streaming entries run their availableNow drain as they always do."""
    df = e.queries()[name](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: {plan[:2000]}"


# --------------------------------------------------------------------------- #
# round-5: evidence-derived registration order
# --------------------------------------------------------------------------- #

def test_registry_orders_by_staleness():
    """FORCE_FRESH first, then never-driver-checked queries, then ascending
    last-checked round — so every query refreshes within ceil(N/window)
    rounds with no manual rotation."""
    from tf_idf_using_mapreduce_spark import registry as reg

    names = list(reg.QUERIES)
    checked = reg._last_checked_rounds()
    n_forced = len([n for n in names if n in reg.FORCE_FRESH])
    # all FORCE_FRESH entries lead
    assert set(names[:n_forced]) == set(reg.FORCE_FRESH)
    # after the forced prefix, last-checked rounds are non-decreasing
    tail_rounds = [checked.get(n, -1) for n in names[n_forced:]]
    assert tail_rounds == sorted(tail_rounds)
    # oracle dict preserves the same relative order
    oracle_names = [n for n in names if n in reg.ORACLES]
    assert list(reg.ORACLES) == oracle_names


def test_registry_order_survives_missing_artifacts(monkeypatch):
    """With no CORRECTNESS artifacts readable, the sort degenerates to
    FORCE_FRESH + literal order instead of crashing."""
    from tf_idf_using_mapreduce_spark import registry as reg

    monkeypatch.setattr(reg, "_last_checked_rounds", lambda: {})
    before = list(reg.QUERIES)
    reg._staleness_reorder()
    try:
        names = list(reg.QUERIES)
        n_forced = len(reg.FORCE_FRESH)
        assert set(names[:n_forced]) == set(reg.FORCE_FRESH)
        assert len(names) == len(before)
    finally:
        monkeypatch.undo()
        reg._staleness_reorder()
        assert list(reg.QUERIES) == before
