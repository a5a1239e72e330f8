"""Data-contract audit: the ingest gate a 100 TB lake runs before data is
allowed downstream — NOT NULL / range / enum constraints checked in ONE scan
per table, plus referential integrity as key joins.

The reference has no notion of constraints (dirty lines silently tokenize to
nothing — SURVEY.md §2.11 Q3's dead-pattern behavior is the closest thing),
but any production replacement needs the audit the moment data stops being a
course-supplied corpus: late pipelines ship NULL timestamps, enum drift
("error" events appearing after a client release), and broken foreign keys,
and the cheapest place to catch all of them is one pass over each table at
landing time.

Scale design:
- **Row-level constraints are ONE aggregation per table**: every constraint
  on a table is a conditional sum inside the same ``agg`` (Catalyst fuses
  them into one partial-aggregated scan — no per-constraint re-reads), then
  ``stack`` unpivots the single stats row into (constraint, n_checked,
  n_violations) rows. Adding a constraint adds a column to a scan that
  already happens, not a job.
- **Referential integrity is a key join, not a subquery per row**: child
  keys LEFT-join the parent's distinct key set and count the misses. On the
  fixture the parent side broadcasts; at 100 TB Catalyst picks SMJ from
  stats, and the right layout answer is the bucketed co-located join
  (``sources/corpus.py:write_bucketed_table``) so recurring audits never
  shuffle the fact.
- NULL semantics are pinned symmetric: a NULL foreign key never matches the
  parent (a violation, in both engines), and empty tables coalesce their
  conditional sums to 0 so the audit emits its full constraint list with
  zeros rather than NULL rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tf_idf_using_mapreduce_spark.sources.corpus import load_table

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")
ORDER_STATUSES = ("F", "O", "P")


def _viol(cond: str):
    """Conditional violation counter. NULL semantics (r13 ADVICE — pinned,
    not assumed): ``when(cond, 1).otherwise(0)`` yields 0 when ``cond``
    evaluates to NULL, so a NULL-condition row is NOT counted. Every
    constraint below therefore states its ``IS NULL`` disjunct explicitly
    when NULL input is a violation — a constraint relying on NULL-counting
    behavior would silently undercount."""
    return F.coalesce(
        F.sum(F.when(F.expr(cond), F.lit(1)).otherwise(F.lit(0))), F.lit(0)
    ).cast("long")


def _stack(agged: DataFrame, names: list[str]) -> DataFrame:
    """Unpivot one (n, v_0..v_k) stats row into (constraint, n_checked,
    n_violations) rows."""
    pairs = ", ".join(f"'{n}', v{i}" for i, n in enumerate(names))
    return agged.select(
        F.expr(f"stack({len(names)}, {pairs}) AS (constraint, n_violations)"),
        F.col("n").alias("n_checked"),
    ).select("constraint", "n_checked", "n_violations")


def _fk_audit(child: DataFrame, ckey: str, parent: DataFrame, pkey: str,
              name: str) -> DataFrame:
    """(constraint, n_checked, n_violations): child keys that miss the
    parent's key set (a NULL child key is a miss by join semantics — pinned
    identical in the oracle's LEFT JOIN). No broadcast hint on purpose
    (r13 ADVICE): a hint overrides stats unconditionally, and the parent
    key set (e.g. every order key for the lineitem FK) is NOT broadcastable
    at 100 TB — size-based planning picks the broadcast at fixture scale
    and SMJ/bucketed co-location at warehouse scale."""
    hits = parent.select(F.col(pkey).alias("__pk")).distinct() \
        .withColumn("__hit", F.lit(1))
    return (
        child.select(F.col(ckey).alias("__ck"))
        .join(hits, F.col("__ck") == F.col("__pk"), "left")
        .agg(
            F.count(F.lit(1)).alias("n_checked"),
            F.coalesce(F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0)),
                       F.lit(0)).cast("long").alias("n_violations"),
        )
        .select(F.lit(name).alias("constraint"), "n_checked", "n_violations")
    )


def data_contract_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(constraint, n_checked, n_violations): the full ingest-contract audit
    over the fixture lake — NOT NULL, non-negativity, enum membership,
    uniqueness, and four foreign keys, each a named row so a scheduler can
    alert on any violation count > 0. One scan per table for the row-level
    block, one key join per FK; all green (0 violations) on the
    driver-generated fixtures, and the tests inject every violation class
    into a doctored corpus to prove each counter actually fires."""
    ev = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    pa = load_table(spark, sf_dir, "part")
    dc = load_table(spark, sf_dir, "documents")

    enum_ev = ", ".join(f"'{t}'" for t in EVENT_TYPES)
    events_block = _stack(
        ev.agg(
            F.count(F.lit(1)).alias("n"),
            _viol("ts IS NULL").alias("v0"),
            _viol("value IS NULL OR value < 0").alias("v1"),
            _viol(f"event_type IS NULL OR event_type NOT IN ({enum_ev})").alias("v2"),
        ),
        ["events.ts_not_null", "events.value_nonnegative",
         "events.event_type_in_enum"],
    )
    enum_st = ", ".join(f"'{s}'" for s in ORDER_STATUSES)
    orders_block = _stack(
        od.agg(
            F.count(F.lit(1)).alias("n"),
            _viol("o_totalprice IS NULL OR o_totalprice <= 0").alias("v0"),
            _viol(f"o_orderstatus IS NULL OR o_orderstatus NOT IN ({enum_st})").alias("v1"),
        ),
        ["orders.totalprice_positive", "orders.status_in_enum"],
    )
    lineitem_block = _stack(
        li.agg(
            F.count(F.lit(1)).alias("n"),
            _viol("l_quantity IS NULL OR l_quantity < 1").alias("v0"),
            _viol("l_discount IS NULL OR l_discount < 0 OR l_discount > 1").alias("v1"),
            _viol("l_shipdate IS NULL").alias("v2"),
        ),
        ["lineitem.quantity_positive", "lineitem.discount_in_range",
         "lineitem.shipdate_not_null"],
    )
    docs_block = (
        dc.agg(
            F.count(F.lit(1)).alias("n_checked"),
            (F.count(F.lit(1)) - F.countDistinct("doc_id")).alias("n_violations"),
        )
        .select(F.lit("documents.doc_id_unique").alias("constraint"),
                "n_checked", "n_violations")
    )
    return (
        events_block
        .unionAll(orders_block)
        .unionAll(lineitem_block)
        .unionAll(docs_block)
        .unionAll(_fk_audit(od, "o_custkey", cu, "c_custkey",
                            "orders.custkey_fk"))
        .unionAll(_fk_audit(li, "l_orderkey", od, "o_orderkey",
                            "lineitem.orderkey_fk"))
        .unionAll(_fk_audit(li, "l_partkey", pa, "p_partkey",
                            "lineitem.partkey_fk"))
        .unionAll(_fk_audit(cu, "c_nationkey", na, "n_nationkey",
                            "customer.nationkey_fk"))
    )


def _duck_viol(cond: str) -> str:
    return f"CAST(coalesce(sum(CASE WHEN {cond} THEN 1 ELSE 0 END), 0) AS BIGINT)"


def _duck_fk(child: str, ckey: str, parent: str, pkey: str, name: str) -> str:
    return f"""
SELECT '{name}' AS "constraint", count(*) AS n_checked,
       {_duck_viol("p.__pk IS NULL")} AS n_violations
FROM (SELECT {ckey} AS __ck FROM {child}) c
LEFT JOIN (SELECT DISTINCT {pkey} AS __pk FROM {parent}) p ON c.__ck = p.__pk
"""


def data_contract_audit_oracle() -> str:
    enum_ev = ", ".join(f"'{t}'" for t in EVENT_TYPES)
    enum_st = ", ".join(f"'{s}'" for s in ORDER_STATUSES)
    return f"""
SELECT "constraint", n_checked, n_violations FROM (
SELECT 'events.ts_not_null' AS "constraint", count(*) AS n_checked,
       {_duck_viol("ts IS NULL")} AS n_violations FROM events
UNION ALL
SELECT 'events.value_nonnegative', count(*),
       {_duck_viol("value IS NULL OR value < 0")} FROM events
UNION ALL
SELECT 'events.event_type_in_enum', count(*),
       {_duck_viol(f"event_type IS NULL OR event_type NOT IN ({enum_ev})")} FROM events
UNION ALL
SELECT 'orders.totalprice_positive', count(*),
       {_duck_viol("o_totalprice IS NULL OR o_totalprice <= 0")} FROM orders
UNION ALL
SELECT 'orders.status_in_enum', count(*),
       {_duck_viol(f"o_orderstatus IS NULL OR o_orderstatus NOT IN ({enum_st})")} FROM orders
UNION ALL
SELECT 'lineitem.quantity_positive', count(*),
       {_duck_viol("l_quantity IS NULL OR l_quantity < 1")} FROM lineitem
UNION ALL
SELECT 'lineitem.discount_in_range', count(*),
       {_duck_viol("l_discount IS NULL OR l_discount < 0 OR l_discount > 1")} FROM lineitem
UNION ALL
SELECT 'lineitem.shipdate_not_null', count(*),
       {_duck_viol("l_shipdate IS NULL")} FROM lineitem
UNION ALL
SELECT 'documents.doc_id_unique', count(*),
       CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) FROM documents
UNION ALL {_duck_fk("orders", "o_custkey", "customer", "c_custkey", "orders.custkey_fk")}
UNION ALL {_duck_fk("lineitem", "l_orderkey", "orders", "o_orderkey", "lineitem.orderkey_fk")}
UNION ALL {_duck_fk("lineitem", "l_partkey", "part", "p_partkey", "lineitem.partkey_fk")}
UNION ALL {_duck_fk("customer", "c_nationkey", "nation", "n_nationkey", "customer.nationkey_fk")}
)
"""
