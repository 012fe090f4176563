"""Behavior tests for plans/pipeline_ops37.py (Mann–Whitney AUC, TVD
independence, runs test).

The DuckDB-oracle gate covers end-to-end equality; these pin the
statistics against scipy-free reference implementations on hand-built
data with known answers."""

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
# Mann–Whitney
# ---------------------------------------------------------------------------
def test_mann_whitney_clean_separation_and_identity(spark):
    import tempfile

    # second half strictly above the first: AUC(early>late) = 0
    with tempfile.TemporaryDirectory() as tmp:
        _write_orders(spark, tmp, [10] * 30 + [100] * 30)
        out = _run(spark, tmp, "mann_whitney_eras").iloc[0]
        assert (out["n_a"], out["n_b"]) == (30, 30)
        assert out["auc_bp"] == 0
        assert out["significant"] == 1
    # identical halves (all ties): AUC = 1/2 exactly via midranks
    with tempfile.TemporaryDirectory() as tmp:
        _write_orders(spark, tmp, [50] * 60)
        out = _run(spark, tmp, "mann_whitney_eras").iloc[0]
        assert out["auc_bp"] == 5000
        assert out["significant"] == 0


def test_mann_whitney_matches_bruteforce_u(spark, sf_dir):
    out = _run(spark, sf_dir, "mann_whitney_eras").iloc[0]
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    kd = (
        orders.assign(
            day=(pd.to_datetime(orders["o_orderdate"]).dt.normalize()
                 - pd.Timestamp("1970-01-01")).dt.days,
            kd=orders["o_totalprice"].apply(lambda v: int(v)),
        )
        .groupby("day")["kd"]
        .sum()
        // 1000
    ).sort_index()
    n = len(kd)
    a = kd.iloc[: n // 2].to_numpy()
    b = kd.iloc[n // 2:].to_numpy()
    # brute-force U with half-credit ties, doubled to stay integer
    u2 = 0
    for x in a:
        u2 += 2 * int((x > b).sum()) + int((x == b).sum())
    assert out["u2_a"] == u2
    assert out["auc_bp"] == u2 * 5000 // (len(a) * len(b))


# ---------------------------------------------------------------------------
# TVD independence
# ---------------------------------------------------------------------------
def test_tvd_bounds_and_zero_case(spark, sf_dir):
    out = _run(spark, sf_dir, "independence_tvd").iloc[0]
    assert 0 <= out["tvd_bp"] <= 10000
    assert out["max_cell_dev_bp"] >= 0
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    assert out["n_orders"] == len(orders)


# ---------------------------------------------------------------------------
# Runs test
# ---------------------------------------------------------------------------
def test_runs_test_alternating_and_blocked(spark):
    import tempfile

    # perfectly alternating: maximal runs -> nonrandom (oscillation)
    with tempfile.TemporaryDirectory() as tmp:
        _write_orders(spark, tmp, [10, 100] * 30)
        out = _run(spark, tmp, "runs_test_daily").iloc[0]
        assert out["n_runs"] == 60
        assert out["nonrandom"] == 1
    # two solid blocks: exactly 2 runs -> nonrandom (trending)
    with tempfile.TemporaryDirectory() as tmp:
        _write_orders(spark, tmp, [10] * 30 + [100] * 30)
        out = _run(spark, tmp, "runs_test_daily").iloc[0]
        assert out["n_runs"] == 2
        assert out["nonrandom"] == 1
        assert out["n_above"] == 30 and out["n_at_or_below"] == 30


def test_runs_test_accounting_real_data(spark, sf_dir):
    out = _run(spark, sf_dir, "runs_test_daily").iloc[0]
    assert out["n_days"] == out["n_above"] + out["n_at_or_below"]
    assert 1 <= out["n_runs"] <= out["n_days"]
