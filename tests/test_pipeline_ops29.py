"""Behavior tests for plans/pipeline_ops29.py (integer OLS, Gini,
int8 quantization recall).

The DuckDB-oracle gate covers end-to-end equality; these pin the
estimator semantics against independent float references (numpy) and
hand-built distributions with known answers."""

from __future__ import annotations

import numpy as np
import pandas as pd

from bikes_data_warehouse_etl_spark.plans import QUERIES


def _run(spark, sf_dir, name: str) -> pd.DataFrame:
    return QUERIES[name].spark(spark, sf_dir).toPandas()


# ---------------------------------------------------------------------------
# OLS
# ---------------------------------------------------------------------------
def test_ols_matches_numpy_within_quantization(spark, sf_dir):
    out = _run(spark, sf_dir, "ols_discount_quantity").set_index("flag")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    for flag, g in li.groupby("l_returnflag"):
        x = np.round(g["l_discount"].to_numpy() * 10000).astype(np.int64)
        y = np.floor(g["l_quantity"].to_numpy()).astype(np.int64)
        slope, intercept = np.polyfit(x.astype(float), y.astype(float), 1)
        got = out.loc[flag]
        assert got["n_rows"] == len(g)
        # den pre-scale quantizes <= 0.1%; allow 2 milli absolute slack
        assert abs(got["slope_milli"] - slope * 1000) <= max(
            2, abs(slope * 1000) * 0.002
        )
        # the intercept back-solves from the QUANTIZED slope, so its
        # error bound is the slope quantization (< ~1 milli + 0.2%)
        # amplified by the mean regressor x-bar
        slope_tol = 1 + abs(slope * 1000) * 0.002
        assert abs(got["intercept_milli"] - intercept * 1000) <= (
            slope_tol * x.mean() + 3
        )


# ---------------------------------------------------------------------------
# Gini
# ---------------------------------------------------------------------------
def test_gini_bounds_and_reference(spark, sf_dir):
    out = _run(spark, sf_dir, "gini_customer_revenue").iloc[0]
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    kc = (
        (orders["o_totalprice"].mul(100).round().astype(np.int64))
        .groupby(orders["o_custkey"])
        .sum()
        // 1000
    ).to_numpy()
    assert out["n_customers"] == len(kc)
    y = np.sort(kc)
    n = len(y)
    i = np.arange(1, n + 1, dtype=np.int64)
    gini = (2 * (i * y).sum() - (n + 1) * y.sum()) / (n * y.sum())
    assert 0 <= out["gini_bp"] <= 10000
    assert abs(out["gini_bp"] - gini * 10000) <= 2  # bp quantization


def test_gini_known_distributions(spark):
    """Perfect equality -> 0; extreme concentration -> near 1."""
    import os, tempfile

    import datetime

    def run(vals):
        rows = [
            (i + 1, float(v), datetime.date(2020, 1, 1))
            for i, v in enumerate(vals)
        ]
        df = spark.createDataFrame(
            rows, "o_custkey long, o_totalprice double, o_orderdate date"
        )
        with tempfile.TemporaryDirectory() as tmp:
            df.write.parquet(os.path.join(tmp, "orders.parquet"))
            return _run(spark, tmp, "gini_customer_revenue").iloc[0]["gini_bp"]

    assert run([500.0] * 10) == 0
    assert run([10.0] * 9 + [1e7]) > 8500


# ---------------------------------------------------------------------------
# Quantized recall
# ---------------------------------------------------------------------------
def test_quantized_recall_high_on_real_data(spark, sf_dir):
    out = _run(spark, sf_dir, "quantized_ann_recall")
    assert (out["n_exact"] == 10).all()
    assert (out["recall_bp"] == out["n_hit"] * 1000).all()
    # int8 preserves most of the top-10 on unit-scale embeddings
    assert out["recall_bp"].mean() >= 5000
