"""Sinks: partitioned parquet layout (pruning-friendly) and TSV round-trips."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tf_idf_using_mapreduce_spark.sources.corpus import (
    load_table,
    read_tsv,
    write_partitioned_parquet,
    write_tsv,
)


def test_partitioned_parquet_layout_and_pruning(spark, tmp_path):
    out = str(tmp_path / "orders_by_status")
    orders = load_table(spark, SF_SMOKE, "orders")
    write_partitioned_parquet(orders, out, ["o_orderstatus"])
    dirs = {os.path.basename(p) for p in glob.glob(os.path.join(out, "o_orderstatus=*"))}
    assert dirs == {"o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"}

    back = spark.read.parquet(out).where(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "o_orderstatus" in plan.split("PartitionFilters:")[1][:200]
    n_f = orders.where("o_orderstatus = 'F'").count()
    assert back.count() == n_f


def test_tsv_round_trip(spark, tmp_path):
    out = str(tmp_path / "df_tsv")
    df = spark.createDataFrame([("alpha", 3), ("beta", 2)], "term string, df int")
    write_tsv(df, out, single_file=True)
    back = read_tsv(spark, out, "term string, df int")
    assert {tuple(r) for r in back.collect()} == {("alpha", 3), ("beta", 2)}
