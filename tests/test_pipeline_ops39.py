"""Behavior tests for plans/pipeline_ops39.py (Zipf slope,
capture-recapture, k-anonymity).

The DuckDB-oracle gate covers end-to-end equality; these pin the
estimators on constructed populations with known answers."""

from __future__ import annotations

import pandas as pd

from bikes_data_warehouse_etl_spark.plans import QUERIES
from bikes_data_warehouse_etl_spark.plans.pipeline_ops39 import _KA_K


def _run(spark, sf_dir, name: str) -> pd.DataFrame:
    return QUERIES[name].spark(spark, sf_dir).toPandas()


# ---------------------------------------------------------------------------
# Zipf slope
# ---------------------------------------------------------------------------
def test_zipf_slope_negative_on_real_text(spark, sf_dir):
    out = _run(spark, sf_dir, "zipf_slope_bits").iloc[0]
    import re

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    vocab = set()
    for t in docs["text"]:
        vocab.update(x for x in re.sub(r"[^a-z0-9]+", " ", t.lower()).split() if x)
    assert out["n_terms"] == len(vocab)
    # frequency falls with rank: slope strictly negative
    assert out["zipf_slope_milli"] < 0


def test_zipf_flat_corpus_slope_zero(spark):
    """A corpus where every term has identical frequency has y
    constant -> slope exactly 0."""
    import os, tempfile

    rows = [(i, "alpha beta gamma delta", "x", 20) for i in range(16)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "documents.parquet"))
        out = _run(spark, tmp, "zipf_slope_bits").iloc[0]
        assert out["zipf_slope_milli"] == 0


# ---------------------------------------------------------------------------
# Capture-recapture
# ---------------------------------------------------------------------------
def test_capture_recapture_exact_overlap_population(spark):
    """Construct a population where both windows observe the same 50
    of 50 customers: N-hat = 50 exactly. Then disjoint-ish windows
    inflate the estimate."""
    import datetime, os, tempfile

    rows = []
    # 50 customers, each orders once in each half
    for c in range(1, 51):
        rows.append((c, 100.0, datetime.date(2020, 1, 1)))
        rows.append((c, 100.0, datetime.date(2020, 3, 1)))
    df = spark.createDataFrame(
        rows, "o_custkey long, o_totalprice double, o_orderdate date"
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "orders.parquet"))
        out = _run(spark, tmp, "capture_recapture_customers").iloc[0]
        assert (out["n_early"], out["n_late"], out["n_recaptured"]) == (50, 50, 50)
        assert out["lp_estimate"] == 50
        assert out["n_actual_observed"] == 50


def test_capture_recapture_real_data_consistency(spark, sf_dir):
    out = _run(spark, sf_dir, "capture_recapture_customers").iloc[0]
    assert out["n_recaptured"] <= min(out["n_early"], out["n_late"])
    assert out["n_actual_observed"] >= max(out["n_early"], out["n_late"])
    # estimate is at least the larger single-window count
    assert out["lp_estimate"] >= max(out["n_early"], out["n_late"])


# ---------------------------------------------------------------------------
# k-anonymity
# ---------------------------------------------------------------------------
def test_k_anonymity_census_matches_pandas(spark, sf_dir):
    out = _run(spark, sf_dir, "k_anonymity_census").iloc[0]
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    sizes = cust.groupby(["c_mktsegment", "c_nationkey"]).size()
    assert out["n_groups"] == len(sizes)
    assert out["min_k"] == sizes.min()
    assert out["n_rows"] == len(cust)
    below = int(sizes[sizes < _KA_K].sum())
    assert out["n_rows_below_k"] == below
    assert out["below_k_bp"] == below * 10000 // len(cust)
