"""Behavior tests for plans/pipeline_ops34.py (equi-depth histogram,
decayed counts, degree assortativity).

The DuckDB-oracle gate covers end-to-end equality; these pin bucket
balance, the shift-decay arithmetic, and the symmetrized-slope-equals-
Pearson identity against numpy."""

from __future__ import annotations

import numpy as np
import pandas as pd

from bikes_data_warehouse_etl_spark.plans import QUERIES
from bikes_data_warehouse_etl_spark.plans.pipeline_ops34 import (
    _DC_MAX_HL,
    _ED_BINS,
)


def _run(spark, sf_dir, name: str) -> pd.DataFrame:
    return QUERIES[name].spark(spark, sf_dir).toPandas()


# ---------------------------------------------------------------------------
# Equi-depth histogram
# ---------------------------------------------------------------------------
def test_equi_depth_buckets_balanced_and_contiguous(spark, sf_dir):
    out = _run(spark, sf_dir, "equi_depth_bins").sort_values("bin")
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    n = len(orders)
    assert out["n_rows"].sum() == n
    assert len(out) == _ED_BINS
    # contiguous non-overlapping value ranges
    prev_hi = None
    for _, r in out.iterrows():
        assert r["lo_dollar"] <= r["hi_dollar"]
        if prev_hi is not None:
            assert r["lo_dollar"] > prev_hi
        prev_hi = r["hi_dollar"]
    # depth balance: every bucket within (1/B ± the largest single
    # dollar-value spike) of the ideal mass
    target = n / _ED_BINS
    dollar_counts = np.floor(orders["o_totalprice"]).value_counts()
    spike = dollar_counts.max()
    assert (out["n_rows"] <= target + spike).all()
    assert (out["n_rows"] >= max(1, target - spike)).all()


# ---------------------------------------------------------------------------
# Decayed counts
# ---------------------------------------------------------------------------
def test_decayed_counts_shift_arithmetic(spark, sf_dir):
    out = _run(spark, sf_dir, "decayed_event_counts").set_index("event_type")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    day = (
        pd.to_datetime(ev["ts"]).dt.normalize() - pd.Timestamp("1970-01-01")
    ).dt.days
    age_hl = np.minimum((day.max() - day) // 7, _DC_MAX_HL)
    w = np.left_shift(1, (_DC_MAX_HL - age_hl).to_numpy()).astype(np.int64)
    ref = pd.DataFrame({"t": ev["event_type"], "w": w}).groupby("t")["w"].agg(
        ["count", "sum"]
    )
    for t, r in ref.iterrows():
        assert out.loc[t, "n_events"] == r["count"]
        assert out.loc[t, "decayed_units"] == r["sum"]
        assert out.loc[t, "effective_recent"] == r["sum"] // (1 << _DC_MAX_HL)
    # decay does real work: effective_recent < n_events
    assert (out["effective_recent"] < out["n_events"]).all()


# ---------------------------------------------------------------------------
# Assortativity
# ---------------------------------------------------------------------------
def test_assortativity_equals_numpy_pearson(spark, sf_dir):
    from bikes_data_warehouse_etl_spark.plans.pipeline_ops16 import co_order_edges

    out = _run(spark, sf_dir, "degree_assortativity").iloc[0]
    e = co_order_edges(spark, sf_dir).toPandas()
    deg = pd.concat([e["a"], e["b"]]).value_counts()
    x = np.concatenate([deg[e["a"]].to_numpy(), deg[e["b"]].to_numpy()]).astype(
        float
    )
    y = np.concatenate([deg[e["b"]].to_numpy(), deg[e["a"]].to_numpy()]).astype(
        float
    )
    assert out["n_points"] == 2 * len(e)
    if np.std(x) == 0:
        # degenerate (regular/complete graph): zero variance -> the
        # integer numerator is exactly 0
        assert out["assortativity_milli"] == 0
    else:
        r = np.corrcoef(x, y)[0, 1]
        # symmetrized OLS slope == Pearson r; den pre-scale <= 0.1%
        assert abs(out["assortativity_milli"] - r * 1000) <= max(
            2, abs(r * 1000) * 0.002
        )
    assert -1000 <= out["assortativity_milli"] <= 1000
