"""Behavior tests for plans/pipeline_ops31.py (p-chart, compaction
planner, k-core peeling).

The DuckDB-oracle gate covers end-to-end equality; these pin the
control-chart band math, the compactor's packing invariants, and
k-core monotonicity."""

from __future__ import annotations

import pandas as pd

from bikes_data_warehouse_etl_spark.plans import QUERIES
from bikes_data_warehouse_etl_spark.plans.pipeline_ops31 import (
    _CB_TARGET_ROWS,
    _KC_K,
)


def _run(spark, sf_dir, name: str) -> pd.DataFrame:
    return QUERIES[name].spark(spark, sf_dir).toPandas()


# ---------------------------------------------------------------------------
# p-chart
# ---------------------------------------------------------------------------
def test_pchart_band_math_and_totals(spark, sf_dir):
    out = _run(spark, sf_dir, "late_rate_pchart")
    # grand rate is consistent with the weekly totals
    pbar = out["n_late"].sum() * 10000 // out["n_lines"].sum()
    assert (out["pbar_bp"] == pbar).all()
    for _, r in out.iterrows():
        dev = 10000 * r["n_late"] - r["n_lines"] * pbar
        expect = 1 if dev * dev > 9 * pbar * (10000 - pbar) * r["n_lines"] else 0
        assert r["ooc"] == expect
    # control limits do real work: not everything is out of control
    assert out["ooc"].sum() < len(out)


# ---------------------------------------------------------------------------
# Compaction planner
# ---------------------------------------------------------------------------
def test_compaction_bins_invariants(spark, sf_dir):
    out = _run(spark, sf_dir, "compaction_bins").sort_values("bin")
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    assert out["n_rows"].sum() == len(orders)
    # bins cover contiguous, non-overlapping day ranges in order
    prev_max = None
    for _, r in out.iterrows():
        assert r["min_day"] <= r["max_day"]
        if prev_max is not None:
            assert r["min_day"] > prev_max
        prev_max = r["max_day"]
    # every bin except the last reaches the target (exclusive-prefix
    # binning closes a bin only once the target is met)
    if len(out) > 1:
        assert (out["n_rows"].iloc[:-1] >= _CB_TARGET_ROWS).all()


def test_compaction_oversized_day_gets_own_bin(spark):
    import datetime, os, tempfile

    rows = []
    oid = 0
    # day 0: tiny; day 1: 3x target in one day; day 2: tiny
    for day, n in [(0, 10), (1, 3 * _CB_TARGET_ROWS), (2, 10)]:
        for _ in range(n):
            oid += 1
            rows.append(
                (oid, 1.0, datetime.date(2020, 1, 1) + datetime.timedelta(days=day))
            )
    df = spark.createDataFrame(
        rows, "o_custkey long, o_totalprice double, o_orderdate date"
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "orders.parquet"))
        out = _run(spark, tmp, "compaction_bins").sort_values("bin")
        # the huge day closes its bin; the trailing tiny day opens a new one
        assert len(out) >= 2
        assert out.iloc[-1]["n_rows"] == 10


# ---------------------------------------------------------------------------
# k-core
# ---------------------------------------------------------------------------
def test_kcore_monotone_and_consistent(spark, sf_dir):
    out = _run(spark, sf_dir, "kcore_peel").sort_values("round")
    assert list(out["round"]) == [0, 1, 2]
    # peeling never grows the graph
    assert (out["n_nodes"].diff().dropna() <= 0).all()
    assert (out["n_edges"].diff().dropna() <= 0).all()


def test_kcore_rounds_match_pandas_peeling(spark):
    """Replicate both peel rounds in pandas over the same edge set and
    pin the per-round node/edge counts exactly."""
    from bikes_data_warehouse_etl_spark.plans.pipeline_ops16 import co_order_edges

    spark_df = co_order_edges(spark, "/root/testdata/sf0.001")
    e = spark_df.toPandas()
    import collections

    deg = collections.Counter(e["a"]) + collections.Counter(e["b"])
    keep = {v for v, d in deg.items() if d >= _KC_K}
    e1 = e[e["a"].isin(keep) & e["b"].isin(keep)]
    deg1 = collections.Counter(e1["a"]) + collections.Counter(e1["b"])
    keep1 = {v for v, d in deg1.items() if d >= _KC_K}
    e2 = e1[e1["a"].isin(keep1) & e1["b"].isin(keep1)]
    out = _run(spark, "/root/testdata/sf0.001", "kcore_peel").set_index("round")
    assert out.loc[1, "n_nodes"] == len(keep)
    assert out.loc[1, "n_edges"] == len(e1)
    assert out.loc[2, "n_nodes"] == len(keep1)
    assert out.loc[2, "n_edges"] == len(e2)
