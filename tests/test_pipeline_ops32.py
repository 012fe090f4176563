"""Behavior tests for plans/pipeline_ops32.py (modularity, Poisson
bootstrap, table profile).

The DuckDB-oracle gate covers end-to-end equality; these pin the
modularity identity, the bootstrap's determinism and coverage shape,
and the profile against pandas ground truth."""

from __future__ import annotations

import numpy as np
import pandas as pd

from bikes_data_warehouse_etl_spark.plans import QUERIES
from bikes_data_warehouse_etl_spark.plans.pipeline_ops32 import _PB_B, _PB_CDF


def _run(spark, sf_dir, name: str) -> pd.DataFrame:
    return QUERIES[name].spark(spark, sf_dir).toPandas()


# ---------------------------------------------------------------------------
# Modularity
# ---------------------------------------------------------------------------
def test_modularity_identity_and_bounds(spark, sf_dir):
    out = _run(spark, sf_dir, "graph_modularity")
    from bikes_data_warehouse_etl_spark.plans.pipeline_ops16 import co_order_edges

    e = co_order_edges(spark, sf_dir).toPandas()
    m = len(e)
    # edge-endpoint accounting: sum of community degree sums = 2m
    assert out["d_c"].sum() == 2 * m
    # intra-edges never exceed total edges
    assert out["e_intra"].sum() <= m
    # Q = sum of contributions; modularity is in [-1, 1] -> ppm bound
    q_ppm = out["contrib_ppm"].sum()
    assert -1000000 <= q_ppm <= 1000000
    # per-community contribution matches the formula exactly
    for _, r in out.iterrows():
        num = (4 * m * r["e_intra"] - r["d_c"] * r["d_c"]) * 1000000
        den = max(4 * m * m, 1)
        expect = -((-num) // den) if num < 0 else num // den
        assert r["contrib_ppm"] == expect


# ---------------------------------------------------------------------------
# Poisson bootstrap
# ---------------------------------------------------------------------------
def test_bootstrap_deterministic_and_ordered(spark, sf_dir):
    a = _run(spark, sf_dir, "poisson_bootstrap_ci").iloc[0]
    b = _run(spark, sf_dir, "poisson_bootstrap_ci").iloc[0]
    assert (a == b).all()  # no RNG state anywhere
    assert a["n_replicates"] == _PB_B
    assert a["ci_lo_cents"] <= a["ci_med_cents"] <= a["ci_hi_cents"]
    # the CI brackets the point estimate on well-behaved data
    assert a["ci_lo_cents"] <= a["point_cents"] <= a["ci_hi_cents"]


def test_poisson_cdf_thresholds_are_poisson1():
    """The integer thresholds are the Poisson(1) CDF in millionths."""
    import math

    cum = 0.0
    for k, t in enumerate(_PB_CDF[:-1]):
        cum += math.exp(-1) / math.factorial(k)
        assert abs(t - round(cum * 1e6)) <= 1
    assert _PB_CDF[-1] == 1000000


# ---------------------------------------------------------------------------
# Table profile
# ---------------------------------------------------------------------------
def test_table_profile_matches_pandas(spark, sf_dir):
    out = _run(spark, sf_dir, "table_profile").set_index("col")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    n = len(li)
    assert (out["n_rows"] == n).all()
    assert out.loc["l_orderkey", "n_distinct"] == li["l_orderkey"].nunique()
    assert out.loc["l_orderkey", "min_v"] == li["l_orderkey"].min()
    assert out.loc["l_orderkey", "max_v"] == li["l_orderkey"].max()
    q = np.floor(li["l_quantity"]).astype(np.int64)
    assert out.loc["l_quantity", "n_distinct"] == q.nunique()
    assert out.loc["l_quantity", "min_v"] == q.min()
    d = np.round(li["l_discount"] * 10000).astype(np.int64)
    assert out.loc["l_discount_bp", "n_distinct"] == d.nunique()
    assert out.loc["l_returnflag", "n_distinct"] == li["l_returnflag"].nunique()
    assert pd.isna(out.loc["l_returnflag", "min_v"])
    days = (
        pd.to_datetime(li["l_shipdate"]).dt.normalize()
        - pd.Timestamp("1970-01-01")
    ).dt.days
    assert out.loc["l_shipdate_day", "min_v"] == days.min()
    assert out.loc["l_shipdate_day", "max_v"] == days.max()
    assert (out["n_null"] == 0).all()  # this table has no nulls
