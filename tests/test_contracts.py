"""Data-contract audit: oracle parity on the clean fixture, and a doctored
corpus proving EVERY constraint counter actually fires (an audit whose rows
are always zero is indistinguishable from one that checks nothing)."""

from __future__ import annotations

from tests.conftest import assert_query_matches_oracle
from tf_idf_using_mapreduce_spark.operators import contracts


def test_contract_audit_matches_oracle(spark):
    assert_query_matches_oracle(spark, "data_contract_audit")


def test_contract_audit_clean_fixture_is_green(spark):
    rows = {r["constraint"]: (r["n_checked"], r["n_violations"])
            for r in contracts.data_contract_audit(
                spark, "/root/testdata/sf0.001").collect()}
    assert len(rows) == 13
    assert all(v == 0 for _, v in rows.values()), rows
    assert all(n > 0 for n, _ in rows.values()), rows


def test_contract_audit_fires_on_every_violation_class(spark, tmp_path):
    """One doctored lake, one violation of each class — each named counter
    reads exactly its injected count, and nothing else moves."""
    d = str(tmp_path)

    def write(name, schema, rows):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.parquet(f"{d}/{name}.parquet")

    write("events",
          "event_id long, ts timestamp, user_id long, event_type string,"
          " value double, props string",
          [(1, None, 1, "view", 1.0, "{}"),          # NULL ts
           (2, __import__("datetime").datetime(2024, 1, 2), 1, "hover", -3.0, "{}"),
           # ^ bad enum AND negative value
           (3, __import__("datetime").datetime(2024, 1, 3), 2, "click", 2.0, "{}")])
    write("orders",
          "o_orderkey long, o_custkey long, o_orderstatus string,"
          " o_totalprice double, o_orderdate date, o_orderpriority string",
          [(10, 100, "F", 5.0, None, "1-URGENT"),
           (11, 999, "X", 0.0, None, "1-URGENT")])  # orphan FK, bad status, 0 price
    write("customer",
          "c_custkey long, c_name string, c_nationkey long, c_acctbal double,"
          " c_mktsegment string",
          [(100, "a", 7, 1.0, "BUILDING"),
           (101, "b", 99, 1.0, "BUILDING")])        # orphan nationkey
    write("nation", "n_nationkey long, n_name string, n_regionkey long",
          [(7, "FRANCE", 1)])
    write("part", "p_partkey long, p_name string", [(1000, "widget")])
    write("lineitem",
          "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
          " l_quantity double, l_extendedprice double, l_discount double,"
          " l_tax double, l_returnflag string, l_linestatus string,"
          " l_shipdate date",
          [(10, 1000, 1, 1, 0.0, 10.0, 1.5, 0.0, "N", "O", None),
           # ^ quantity < 1, discount > 1, NULL shipdate — three counters
           (12, 2000, 1, 1, 2.0, 10.0, 0.1, 0.0, "N", "O",
            __import__("datetime").date(2024, 1, 5))])
           # ^ orphan orderkey AND orphan partkey
    write("documents", "doc_id long, text string, lang string, source string,"
          " n_chars long",
          [(1, "a", "en", "web", 1), (1, "b", "en", "web", 1),  # dup id
           (2, "c", "en", "web", 1)])

    got = {r["constraint"]: (r["n_checked"], r["n_violations"])
           for r in contracts.data_contract_audit(spark, d).collect()}
    assert got == {
        "events.ts_not_null": (3, 1),
        "events.value_nonnegative": (3, 1),
        "events.event_type_in_enum": (3, 1),
        "orders.totalprice_positive": (2, 1),
        "orders.status_in_enum": (2, 1),
        "lineitem.quantity_positive": (2, 1),
        "lineitem.discount_in_range": (2, 1),
        "lineitem.shipdate_not_null": (2, 1),
        "documents.doc_id_unique": (3, 1),
        "orders.custkey_fk": (2, 1),
        "lineitem.orderkey_fk": (2, 1),
        "lineitem.partkey_fk": (2, 1),
        "customer.nationkey_fk": (2, 1),
    }
