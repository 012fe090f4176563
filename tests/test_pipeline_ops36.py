"""Behavior tests for plans/pipeline_ops36.py (seasonality strength,
KS drift, modality agreement).

The DuckDB-oracle gate covers end-to-end equality; these pin eta² on
constructed series with known decomposition, KS on known distribution
shifts, and the dup-pair accounting."""

from __future__ import annotations

import datetime

import pandas as pd

from bikes_data_warehouse_etl_spark.plans import QUERIES


def _run(spark, sf_dir, name: str) -> pd.DataFrame:
    return QUERIES[name].spark(spark, sf_dir).toPandas()


def _write_orders(spark, tmp, series, start=datetime.date(2020, 1, 6)):
    import os

    rows = [
        (i + 1, float(v * 1000), start + datetime.timedelta(days=i))
        for i, v in enumerate(series)
    ]
    df = spark.createDataFrame(
        rows, "o_custkey long, o_totalprice double, o_orderdate date"
    )
    df.write.parquet(os.path.join(tmp, "orders.parquet"))


# ---------------------------------------------------------------------------
# Seasonality strength
# ---------------------------------------------------------------------------
def test_eta_sq_pure_weekly_pattern_is_one(spark):
    """A series that is a pure function of weekday has eta² = 10000;
    a constant series has eta² = 0 (guarded denominator)."""
    import tempfile

    weekly = [100, 200, 300, 400, 500, 600, 700] * 8
    with tempfile.TemporaryDirectory() as tmp:
        _write_orders(spark, tmp, weekly)
        out = _run(spark, tmp, "weekday_seasonality_strength").iloc[0]
        assert out["eta_sq_bp"] == 10000
    flat = [100] * 56
    with tempfile.TemporaryDirectory() as tmp:
        _write_orders(spark, tmp, flat)
        out = _run(spark, tmp, "weekday_seasonality_strength").iloc[0]
        assert out["eta_sq_bp"] == 0


def test_eta_sq_bounded_on_real_data(spark, sf_dir):
    out = _run(spark, sf_dir, "weekday_seasonality_strength").iloc[0]
    assert 0 <= out["eta_sq_bp"] <= 10000


# ---------------------------------------------------------------------------
# KS drift
# ---------------------------------------------------------------------------
def test_ks_identical_halves_zero_and_shift_detected(spark):
    import tempfile

    # first half and second half draw the same value multiset -> KS 0
    same = ([10, 20, 30, 40] * 7) * 2
    with tempfile.TemporaryDirectory() as tmp:
        _write_orders(spark, tmp, same)
        out = _run(spark, tmp, "ks_value_drift").iloc[0]
        assert out["ks_bp"] == 0
    # second half shifted entirely above the first -> KS = 10000
    shifted = [10, 20] * 14 + [1000, 2000] * 14
    with tempfile.TemporaryDirectory() as tmp:
        _write_orders(spark, tmp, shifted)
        out = _run(spark, tmp, "ks_value_drift").iloc[0]
        assert out["ks_bp"] == 10000
        # the divergence maxes at the top of the early distribution
        assert out["ks_at_dollar"] == 20 * 1000


def test_ks_real_data_bounds(spark, sf_dir):
    out = _run(spark, sf_dir, "ks_value_drift").iloc[0]
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    assert out["n_early"] + out["n_late"] == len(orders)
    assert 0 <= out["ks_bp"] <= 10000


# ---------------------------------------------------------------------------
# Modality agreement
# ---------------------------------------------------------------------------
def test_modality_agreement_pair_accounting(spark, sf_dir):
    import re

    out = _run(spark, sf_dir, "dedup_modality_agreement").iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")

    def fp(t):
        return " ".join(re.sub(r"[^a-z0-9]+", " ", t.lower()).split())

    sizes = docs["text"].map(fp).value_counts()
    expect_pairs = int((sizes * (sizes - 1) // 2).sum())
    assert out["n_dup_pairs"] == expect_pairs
    assert 0 <= out["n_bucket_agree"] <= out["n_dup_pairs"]
    if out["n_dup_pairs"]:
        assert (
            out["agree_bp"]
            == out["n_bucket_agree"] * 10000 // out["n_dup_pairs"]
        )
