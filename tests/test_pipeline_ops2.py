"""Behavior + plan-shape tests for plans/pipeline_ops2.py (repetition,
decontamination, centroids, quantile gate, histogram, outliers).

Behavior tests recompute expectations in plain Python/pandas on the
same parquet; plan tests pin the scale-critical physical shapes."""

from __future__ import annotations

import math
import re

import pandas as pd
import pytest

from bikes_data_warehouse_etl_spark.plans import QUERIES


def _run(spark, sf_dir, name: str) -> pd.DataFrame:
    return QUERIES[name].spark(spark, sf_dir).toPandas()


def _plan(spark, sf_dir, name: str) -> str:
    return (
        QUERIES[name]
        .spark(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def _norm_tokens(text: str) -> list[str]:
    t = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    return t.split() if t else []


# ---------------------------------------------------------------------------
# repetition_score
# ---------------------------------------------------------------------------
def test_repetition_score_matches_python(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    out = _run(spark, sf_dir, "repetition_score").set_index("doc_id")
    # arithmetic invariants on every row
    assert (out["n_distinct"] <= out["n_bigrams"]).all()
    assert (out["top_n"] <= out["n_bigrams"]).all()
    assert (
        out["dup_ppm"]
        == (out["n_bigrams"] - out["n_distinct"]) * 1_000_000 // out["n_bigrams"]
    ).all()
    # spot-check 5 docs against a plain-Python recompute
    for _, row in docs.head(5).iterrows():
        toks = _norm_tokens(row["text"])
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        got = out.loc[row["doc_id"]]
        assert got["n_bigrams"] == len(bgs)
        assert got["n_distinct"] == len(set(bgs))
        assert got["top_n"] == max(bgs.count(b) for b in set(bgs))


# ---------------------------------------------------------------------------
# decontam_overlap
# ---------------------------------------------------------------------------
def test_decontam_overlap_matches_python(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    out = _run(spark, sf_dir, "decontam_overlap").set_index("doc_id")
    bench_ids = set(docs.loc[docs["source"] == "src0", "doc_id"])
    # benchmark docs never appear in the removal list
    assert not (set(out.index) & bench_ids)
    assert (out["n_shared"] >= 1).all()

    def shingles(text: str) -> set:
        toks = _norm_tokens(text)
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    bench_sh = set()
    for t in docs.loc[docs["source"] == "src0", "text"]:
        bench_sh |= shingles(t)
    expected = {}
    for _, row in docs[docs["source"] != "src0"].iterrows():
        n = len(shingles(row["text"]) & bench_sh)
        if n:
            expected[row["doc_id"]] = n
    assert dict(out["n_shared"]) == expected


def test_decontam_overlap_broadcasts_benchmark(spark, sf_dir):
    """The benchmark shingle set is fixed-size → must broadcast; the
    corpus side must never sort-merge against it."""
    plan = _plan(spark, sf_dir, "decontam_overlap")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# label_centroids
# ---------------------------------------------------------------------------
def test_label_centroids_matches_numpy(spark, sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = _run(spark, sf_dir, "label_centroids")
    n_labels = emb["label"].nunique()
    assert len(out) == n_labels * 64
    # spot-check one (label, dim) cell exactly
    lbl = int(emb["label"].iloc[0])
    sub = emb[emb["label"] == lbl]
    micro = [math.floor(float(v[7]) * 1_000_000) for v in sub["embedding"]]
    row = out[(out["label"] == lbl) & (out["dim"] == 7)].iloc[0]
    assert row["n_vecs"] == len(sub)
    assert row["sum_micro"] == sum(micro)
    assert row["centroid_micro"] == math.floor(sum(micro) / len(sub))


def test_label_centroids_single_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "label_centroids")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("HashAggregate") == 2  # partial + final


# ---------------------------------------------------------------------------
# token_len_decile_gate
# ---------------------------------------------------------------------------
def test_token_len_decile_gate_threshold(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    out = _run(spark, sf_dir, "token_len_decile_gate")
    total = len(docs)
    # strictly fewer than 10% of docs were dropped, and the threshold
    # is the smallest value whose cumulative count reaches 10%
    assert len(out) > total * 0.9
    p10 = out["p10"].iloc[0]
    assert (out["p10"] == p10).all()
    assert (out["tok_cnt"] >= p10).all()
    dropped = total - len(out)
    assert dropped * 10 < total


def test_token_len_decile_gate_no_global_sort_of_docs(spark, sf_dir):
    """The quantile comes from the bounded length histogram — the only
    Sort allowed is inside the tiny post-aggregation window, never a
    data-sized one, and the threshold joins back as a broadcast."""
    plan = _plan(spark, sf_dir, "token_len_decile_gate")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row threshold join


# ---------------------------------------------------------------------------
# value_histogram
# ---------------------------------------------------------------------------
def test_value_histogram_partitions_all_events(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    out = _run(spark, sf_dir, "value_histogram")
    assert out["n_events"].sum() == len(ev)
    assert (out["bucket"] >= 0).all()
    # bucket boundaries: every min/max lives inside [bucket*500, +500)
    assert (out["min_cents"] >= out["bucket"] * 500).all()
    assert (out["max_cents"] < (out["bucket"] + 1) * 500).all()
    assert (out["min_cents"] <= out["max_cents"]).all()


def test_value_histogram_single_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "value_histogram")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("HashAggregate") == 2


# ---------------------------------------------------------------------------
# user_value_outliers
# ---------------------------------------------------------------------------
def test_user_value_outliers_matches_pandas(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev.assign(cents=(ev["value"] * 100).round().astype("int64"))
    out = _run(spark, sf_dir, "user_value_outliers")
    stats = ev.groupby("user_id")["cents"].agg(["count", "sum"])
    ssq = ev.groupby("user_id")["cents"].apply(lambda s: int((s * s).sum()))
    expected = set()
    for _, r in ev.iterrows():
        n = int(stats.loc[r["user_id"], "count"])
        s = int(stats.loc[r["user_id"], "sum"])
        q = int(ssq.loc[r["user_id"]])
        if n >= 30 and (n * r["cents"] - s) ** 2 > 4 * (n * q - s * s):
            expected.add(int(r["event_id"]))
    assert set(out["event_id"]) == expected
    # the squared formulation equals the float 2-sigma rule
    for _, r in out.head(20).iterrows():
        grp = ev[ev["user_id"] == r["user_id"]]["cents"]
        sigma = grp.std(ddof=0)
        assert abs(r["cents"] - grp.mean()) > 2 * sigma


def test_user_value_outliers_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "user_value_outliers")
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan


@pytest.mark.parametrize(
    "name",
    [
        "repetition_score",
        "decontam_overlap",
        "label_centroids",
        "token_len_decile_gate",
        "value_histogram",
        "user_value_outliers",
    ],
)
def test_registered_with_oracle(name):
    assert QUERIES[name].oracle is not None
