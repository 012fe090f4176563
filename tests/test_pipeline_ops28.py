"""Behavior tests for plans/pipeline_ops28.py (ANN recall harness,
label-term affinity, bigram LM, naive-baseline MAPE).

The DuckDB-oracle gate covers end-to-end equality; these pin the
evaluation semantics — recall bounds and self-consistency, lift
support floors, probability normalization headroom, and the MAPE
join's gap behavior."""

from __future__ import annotations

import pandas as pd

from bikes_data_warehouse_etl_spark.plans import QUERIES
from bikes_data_warehouse_etl_spark.plans.pipeline_ops28 import (
    _AR_K,
    _AR_NQ,
    _LT_MIN_DF,
    _LT_TOP,
)


def _run(spark, sf_dir, name: str) -> pd.DataFrame:
    return QUERIES[name].spark(spark, sf_dir).toPandas()


# ---------------------------------------------------------------------------
# ANN recall
# ---------------------------------------------------------------------------
def test_ann_recall_bounds(spark, sf_dir):
    out = _run(spark, sf_dir, "ann_recall_eval")
    assert len(out) == _AR_NQ
    assert (out["n_exact"] == _AR_K).all()
    assert out["n_hit"].between(0, _AR_K).all()
    assert (out["recall_bp"] == out["n_hit"] * 10000 // out["n_exact"]).all()


def test_ann_recall_full_bucket_match_is_perfect(spark):
    """If every vector shares the query's bucket (all-positive first 8
    dims), the approx arm IS the exact arm — recall must be 10000."""
    import os, tempfile

    rows = []
    for i in range(24):
        # all-positive vectors: one shared sign bucket
        rows.append((i, [0.1 + 0.01 * ((i * 7 + j) % 13) for j in range(16)], 0))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "embeddings.parquet"))
        out = _run(spark, tmp, "ann_recall_eval")
        assert (out["recall_bp"] == 10000).all()


# ---------------------------------------------------------------------------
# Label-term affinity
# ---------------------------------------------------------------------------
def test_label_term_affinity_support_and_topk(spark, sf_dir):
    out = _run(spark, sf_dir, "label_term_affinity")
    assert (out["dfl"] >= _LT_MIN_DF).all()
    sizes = out.groupby("label").size()
    assert (sizes <= _LT_TOP).all()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    assert set(out["label"]) <= set(emb["label"])
    # lift of a term in a label can exceed 1000 (enrichment) but a
    # term present in EVERY doc has lift exactly 1000 in every label;
    # all lifts are positive
    assert (out["lift_milli"] > 0).all()


# ---------------------------------------------------------------------------
# Bigram LM
# ---------------------------------------------------------------------------
def test_bigram_probabilities_bounded(spark, sf_dir):
    out = _run(spark, sf_dir, "bigram_cond_prob")
    assert len(out) == 25
    # smoothed P(w2|w1) is a probability: milli in (0, 1000]
    assert out["p_milli"].between(0, 1000).all()
    n = out["n_bigram"].to_numpy()
    assert (n[:-1] >= n[1:]).all()


def test_bigram_counts_match_pandas(spark, sf_dir):
    import re
    from collections import Counter

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    c = Counter()
    for t in docs["text"]:
        toks = [x for x in re.sub(r"[^a-z0-9]+", " ", t.lower()).split() if x]
        c.update(zip(toks, toks[1:]))
    out = _run(spark, sf_dir, "bigram_cond_prob")
    for _, row in out.iterrows():
        assert c[(row["w1"], row["w2"])] == row["n_bigram"]


# ---------------------------------------------------------------------------
# Naive MAPE
# ---------------------------------------------------------------------------
def test_naive_mape_models_and_gaps(spark, sf_dir):
    out = _run(spark, sf_dir, "seasonal_naive_mape").set_index("model")
    assert set(out.index) == {"naive_1", "seasonal_naive_7"}
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    days = set(
        (pd.to_datetime(orders["o_orderdate"]).dt.normalize()
         - pd.Timestamp("1970-01-01")).dt.days
    )
    # scored days = days whose offset partner exists (gap-robust join)
    assert out.loc["naive_1", "n_days"] == sum(1 for d in days if d - 1 in days)
    assert out.loc["seasonal_naive_7", "n_days"] == sum(
        1 for d in days if d - 7 in days
    )
    assert (out["mape_bp"] >= 0).all()
