"""Behavior tests for plans/pipeline_ops30.py (association rules,
CUSUM, SQL UDF surface, churn hazard).

The DuckDB-oracle gate covers end-to-end equality; these pin the
estimator semantics on hand-built series with known change points and
the rule-score formulas against pandas."""

from __future__ import annotations

import datetime

import pandas as pd

from bikes_data_warehouse_etl_spark.plans import QUERIES
from bikes_data_warehouse_etl_spark.plans.pipeline_ops30 import _AR_MIN_SUPPORT


def _run(spark, sf_dir, name: str) -> pd.DataFrame:
    return QUERIES[name].spark(spark, sf_dir).toPandas()


# ---------------------------------------------------------------------------
# Association rules
# ---------------------------------------------------------------------------
def test_assoc_rules_scores_match_pandas(spark, sf_dir):
    out = _run(spark, sf_dir, "assoc_rules_topk")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    lp = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    n_ord = lp["l_orderkey"].nunique()
    n_item = lp.groupby("l_partkey").size()
    pairs = lp.merge(lp, on="l_orderkey")
    pairs = pairs[pairs["l_partkey_x"] != pairs["l_partkey_y"]]
    sup = pairs.groupby(["l_partkey_x", "l_partkey_y"]).size()
    for _, r in out.iterrows():
        s = sup[(r["ante"], r["cons"])]
        assert r["support"] == s >= _AR_MIN_SUPPORT
        assert r["conf_milli"] == s * 1000 // n_item[r["ante"]]
        assert (
            r["lift_milli"]
            == s * n_ord * 1000 // (n_item[r["ante"]] * n_item[r["cons"]])
        )


# ---------------------------------------------------------------------------
# CUSUM
# ---------------------------------------------------------------------------
def _write_orders(spark, tmp, series):
    rows = [
        (i + 1, float(v * 1000), datetime.date(2020, 1, 1) + datetime.timedelta(days=i))
        for i, v in enumerate(series)
    ]
    df = spark.createDataFrame(
        rows, "o_custkey long, o_totalprice double, o_orderdate date"
    )
    import os

    df.write.parquet(os.path.join(tmp, "orders.parquet"))


def test_cusum_flags_sustained_shift_not_steady_state(spark):
    """A level shift of +2 units/day from day 40 accumulates and trips
    the 8x-MAD gate; the pre-shift region never flags."""
    import tempfile

    series = [10] * 40 + [12] * 40
    with tempfile.TemporaryDirectory() as tmp:
        _write_orders(spark, tmp, series)
        out = _run(spark, tmp, "cusum_change_detection").sort_values("day")
        flags = out["shifted"].to_numpy()
        assert flags[:40].sum() == 0
        assert flags[40:].sum() > 0
        # cusum is non-negative by construction
        assert (out["cusum_k"] >= 0).all()


def test_cusum_quiet_series_never_flags(spark):
    import tempfile

    # integer-exact mean (11): deviations alternate ±1, cusum bounded.
    # (A fractional mean would floor to 10 and accumulate +frac drift —
    # the docstring's kilodollar-granularity argument for why that
    # drift never reaches the 8x-MAD gate on real revenue volumes.)
    series = [10, 12] * 40
    with tempfile.TemporaryDirectory() as tmp:
        _write_orders(spark, tmp, series)
        out = _run(spark, tmp, "cusum_change_detection")
        assert out["shifted"].sum() == 0


# ---------------------------------------------------------------------------
# SQL UDF pricing
# ---------------------------------------------------------------------------
def test_sql_udf_matches_inline_expression(spark, sf_dir):
    """The declared-function rollup equals the inline-expression
    rollup — the analyzer inlines SQL UDFs with no semantic drift."""
    import pyspark.sql.functions as F

    out = _run(spark, sf_dir, "sql_udf_pricing").set_index(["flag", "status"])
    li = QUERIES["pushdown_scan"].spark  # noqa: F841 (registry warm)
    from bikes_data_warehouse_etl_spark.sources.parquet import read_table

    ref = (
        read_table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") <= F.lit("2002-09-02").cast("timestamp"))
        .groupBy(
            F.col("l_returnflag").alias("flag"),
            F.col("l_linestatus").alias("status"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
                ).cast("long")
            )
            .cast("long")
            .alias("net_cents"),
        )
        .toPandas()
        .set_index(["flag", "status"])
    )
    for idx, row in ref.iterrows():
        assert out.loc[idx, "n_lines"] == row["n_lines"]
        assert out.loc[idx, "net_cents"] == row["net_cents"]


def test_sql_udf_plan_has_no_python_eval(spark, sf_dir):
    plan = (
        QUERIES["sql_udf_pricing"]
        .spark(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the declared functions are inlined to the raw expressions and the
    # ship-date predicate still reaches the scan
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    assert "round" in plan


# ---------------------------------------------------------------------------
# Churn hazard
# ---------------------------------------------------------------------------
def test_churn_hazard_at_risk_accounting(spark, sf_dir):
    out = _run(spark, sf_dir, "churn_hazard_curve").sort_values("wk")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    life = (
        (ev.groupby("user_id")["ts"].max().dt.normalize()
         - ev.groupby("user_id")["ts"].min().dt.normalize()).dt.days // 7
    )
    assert out["n_churned"].sum() == life.size
    # at-risk at week w counts everyone with lifetime >= w
    for _, r in out.iterrows():
        assert r["n_at_risk"] == (life >= r["wk"]).sum()
        assert r["hazard_bp"] == r["n_churned"] * 10000 // r["n_at_risk"]
    # the maximal-lifetime week has hazard 10000 by construction
    assert out.iloc[-1]["hazard_bp"] == 10000
