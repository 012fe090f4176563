"""Salted joins / two-phase aggregation equal their plain forms;
compaction reduces file counts without changing data."""

from __future__ import annotations

import glob

import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.operators.skew import salted_join, two_phase_agg
from bikes_data_warehouse_etl_spark.sources.sinks import compact_parquet


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
    )
    plain = li.join(o, "l_orderkey").collect()
    salted = salted_join(li, o, ["l_orderkey"], salt=4).collect()
    key = lambda r: (r["l_orderkey"], r["l_partkey"], r["l_quantity"], r["o_custkey"])  # noqa: E731
    assert sorted(map(key, salted)) == sorted(map(key, plain))


def test_two_phase_agg_equals_direct(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    direct = {
        r["l_orderkey"]: r["s"]
        for r in li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("s")).collect()
    }
    two = {
        r["l_orderkey"]: r["sum_l_quantity"]
        for r in two_phase_agg(li, ["l_orderkey"], ["l_quantity"], salt=4).collect()
    }
    assert two == direct


def test_compaction_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    path = str(tmp_path / "frag")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.repartition(16).write.parquet(path)  # fragmented
    n_before = len(glob.glob(f"{path}/*.parquet"))
    assert n_before >= 16
    rows_before = sorted(map(tuple, spark.read.parquet(path).collect()))

    compact_parquet(spark, path, target_files=2)
    n_after = len(glob.glob(f"{path}/*.parquet"))
    assert n_after == 2
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == rows_before


def test_salted_join_rejects_outer_on_replicated_side(spark):
    import pytest
    from bikes_data_warehouse_etl_spark.operators.skew import salted_join

    large = spark.range(10).selectExpr("id as k", "id as v")
    small = spark.range(3).selectExpr("id as k", "id as w")
    for how in ("right", "full", "right_outer", "outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(large, small, ["k"], how=how)
