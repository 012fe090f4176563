"""Behavior tests for plans/pipeline_ops27.py (priority sampling,
skip-gram pairs, PCA power iteration).

The DuckDB-oracle gate covers end-to-end equality; these pin the
semantic invariants — weight-monotone inclusion odds, skip-gram pair
accounting, and the power iterate's normalization/shape."""

from __future__ import annotations

import pandas as pd

from bikes_data_warehouse_etl_spark.plans import QUERIES
from bikes_data_warehouse_etl_spark.plans.pipeline_ops27 import _PS_K, _SG_WINDOW


def _run(spark, sf_dir, name: str) -> pd.DataFrame:
    return QUERIES[name].spark(spark, sf_dir).toPandas()


# ---------------------------------------------------------------------------
# Priority sampling
# ---------------------------------------------------------------------------
def test_priority_sample_is_weight_biased_and_deterministic(spark, sf_dir):
    out1 = _run(spark, sf_dir, "priority_sample_weighted")
    out2 = _run(spark, sf_dir, "priority_sample_weighted")
    # deterministic: identical sample on re-run
    pd.testing.assert_frame_equal(
        out1.sort_values("doc_id").reset_index(drop=True),
        out2.sort_values("doc_id").reset_index(drop=True),
    )
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    docs = docs[docs["n_chars"] > 0]
    assert len(out1) == min(_PS_K, len(docs))
    # weight bias: sampled docs are longer on average than the corpus
    assert out1["w"].mean() > docs["n_chars"].mean()


def test_priority_keys_sorted_boundary(spark, sf_dir):
    out = _run(spark, sf_dir, "priority_sample_weighted")
    s = out.sort_values(["pkey", "doc_id"]).reset_index(drop=True)
    # the sample IS the bottom-k: keys ascend and the last is the max
    assert (s["pkey"].diff().dropna() >= 0).all()


# ---------------------------------------------------------------------------
# Skip-gram pairs
# ---------------------------------------------------------------------------
def test_skipgram_pair_count_accounting(spark, sf_dir):
    """Each user with n>=1 events emits sum over positions of the
    neighbor count within +-2 — equivalently 2*(n-1) + 2*(n-2) ordered
    pairs for n >= 2 (fewer for tiny sequences)."""
    out = _run(spark, sf_dir, "skipgram_pairs")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    expect = 0
    for n in ev.groupby("user_id").size():
        for d in range(1, _SG_WINDOW + 1):
            if n > d:
                expect += 2 * (n - d)
    assert out["n_pairs"].sum() == expect


def test_skipgram_symmetric_census(spark, sf_dir):
    """Directional pairs within a symmetric window: the (a,b) count
    equals the (b,a) count."""
    out = _run(spark, sf_dir, "skipgram_pairs")
    m = {(r["target"], r["context"]): r["n_pairs"] for _, r in out.iterrows()}
    for (a, b), n in m.items():
        assert m.get((b, a), 0) == n


# ---------------------------------------------------------------------------
# PCA power iteration
# ---------------------------------------------------------------------------
def test_pca_power_iter_shape_and_normalization(spark, sf_dir):
    out = _run(spark, sf_dir, "pca_power_iter")
    dims = len(pd.read_parquet(f"{sf_dir}/embeddings.parquet")["embedding"].iloc[0])
    assert sorted(out["dim"]) == list(range(dims))
    # L-infinity normalized to milli: max |v| lands in (0, ~1000]
    mx = out["v_milli"].abs().max()
    assert 0 < mx <= 1001
    # non-degenerate: the iterate is not the zero vector
    assert (out["v_milli"] != 0).any()
