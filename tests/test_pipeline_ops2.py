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


# ---------------------------------------------------------------------------
# multimodal_resize
# ---------------------------------------------------------------------------
def test_multimodal_resize_geometry(spark, sf_dir):
    out = _run(spark, sf_dir, "multimodal_resize")
    longer = out[["width", "height"]].max(axis=1)
    rs_longer = out[["rs_width", "rs_height"]].max(axis=1)
    # the longer side lands exactly on the target box
    assert (rs_longer == 224).all()
    # aspect ratio preserved within floor rounding: rs = dim*224 // longer
    assert (out["rs_width"] == out["width"] * 224 // longer).all()
    assert (out["rs_height"] == out["height"] * 224 // longer).all()
    assert (out["rs_width"] >= 1).all() and (out["rs_height"] >= 1).all()


# ---------------------------------------------------------------------------
# frame_sample_stats
# ---------------------------------------------------------------------------
def test_frame_sample_stats_matches_python(spark, sf_dir):
    import hashlib

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    out = _run(spark, sf_dir, "frame_sample_stats")
    assert len(out) == 4 * len(docs)
    assert sorted(out["frame_idx"].unique()) == [0, 1, 2, 3]
    row = docs.iloc[3]
    b = row["text"].encode()
    step = max(len(b) // 4, 1)
    sub = out[out["media_id"] == row["doc_id"]].sort_values("frame_idx")
    for i, (_, r) in enumerate(sub.iterrows()):
        frame = b[i * step : (i + 1) * step]
        assert r["n_frame_bytes"] == len(frame)
        assert r["frame_md5"] == hashlib.md5(frame).hexdigest()


# ---------------------------------------------------------------------------
# doc_chunks
# ---------------------------------------------------------------------------
def test_doc_chunks_reassemble_and_shape(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    out = _run(spark, sf_dir, "doc_chunks")
    # every chunk except the last is exactly 16 tokens; reassembly
    # reproduces the normalized token stream
    for doc_id in docs["doc_id"].head(5):
        toks = _norm_tokens(docs.set_index("doc_id").loc[doc_id, "text"])
        sub = out[out["doc_id"] == doc_id].sort_values("chunk_idx")
        assert list(sub["n_chunk_tokens"])[:-1] == [16] * (len(sub) - 1)
        joined = " ".join(sub["chunk_text"])
        assert joined.split() == toks
    assert (out["n_chunk_tokens"] >= 1).all()
    assert (out["n_chunk_tokens"] <= 16).all()


def test_doc_chunks_is_shuffle_free(spark, sf_dir):
    """Chunking must stay row-local — zero exchanges at any corpus
    size."""
    plan = _plan(spark, sf_dir, "doc_chunks")
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# source_overlap_matrix
# ---------------------------------------------------------------------------
def test_source_overlap_matrix_shape(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    out = _run(spark, sf_dir, "source_overlap_matrix")
    n_sources = docs["source"].nunique()
    assert len(out) <= n_sources * (n_sources - 1) // 2
    assert (out["source_a"] < out["source_b"]).all()
    assert (out["n_shared"] >= 1).all()
    # symmetric spot-check against Python sets
    def shingles(text):
        t = _norm_tokens(text)
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    by_src = {}
    for _, r in docs.iterrows():
        by_src.setdefault(r["source"], set()).update(shingles(r["text"]))
    a, b = sorted(docs["source"].unique())[:2]
    want = len(by_src[a] & by_src[b])
    got = out[(out["source_a"] == a) & (out["source_b"] == b)]["n_shared"]
    assert (int(got.iloc[0]) if len(got) else 0) == want


# ---------------------------------------------------------------------------
# sequence_packing
# ---------------------------------------------------------------------------
def test_sequence_packing_budget_and_determinism(spark, sf_dir):
    out = _run(spark, sf_dir, "sequence_packing")
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    assert len(out) == len(docs)  # every doc assigned exactly once
    # within (bucket, seq), the packed token total stays under budget +
    # one overhanging doc (streaming-fill invariant)
    tot = out.groupby(["bucket", "seq_id"])["tok_cnt"].sum()
    maxdoc = out["tok_cnt"].max()
    assert (tot <= 1024 + maxdoc).all()
    # sequences within a bucket are contiguous from 0
    for b, grp in out.groupby("bucket"):
        seqs = sorted(grp["seq_id"].unique())
        assert seqs == list(range(len(seqs)))
    # deterministic across reruns
    again = _run(spark, sf_dir, "sequence_packing")
    assert out.sort_values("doc_id").reset_index(drop=True).equals(
        again.sort_values("doc_id").reset_index(drop=True)
    )


def test_sequence_packing_single_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sequence_packing")
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------------------
# tfidf_top_terms
# ---------------------------------------------------------------------------
def test_tfidf_top_terms_ranks(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    out = _run(spark, sf_dir, "tfidf_top_terms")
    # exactly 3 ranked terms per doc (every doc has >= 3 distinct terms)
    assert len(out) == 3 * len(docs)
    assert set(out["rnk"]) == {1, 2, 3}
    # recompute one doc's scores in Python
    n_docs = len(docs)
    tf_all = {}
    df_all = {}
    for _, r in docs.iterrows():
        toks = _norm_tokens(r["text"])
        tf_all[r["doc_id"]] = pd.Series(toks).value_counts().to_dict()
    for d in tf_all.values():
        for t in d:
            df_all[t] = df_all.get(t, 0) + 1
    doc0 = docs["doc_id"].iloc[0]
    scores = sorted(
        (
            (-tf * ((n_docs * 1000) // df_all[t]), t)
            for t, tf in tf_all[doc0].items()
        )
    )[:3]
    sub = out[out["doc_id"] == doc0].sort_values("rnk")
    assert list(sub["term"]) == [t for _, t in scores]
    assert list(sub["score_milli"]) == [-s for s, _ in scores]


def test_tfidf_uses_window_group_limit(spark, sf_dir):
    """Per-doc top-3 must compile to WindowGroupLimit (rank heap), not
    a materialized full sort per group."""
    plan = _plan(spark, sf_dir, "tfidf_top_terms")
    assert "WindowGroupLimit" in plan


# ---------------------------------------------------------------------------
# dau_mau_stickiness
# ---------------------------------------------------------------------------
def test_dau_mau_bounds(spark, sf_dir):
    out = _run(spark, sf_dir, "dau_mau_stickiness")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    assert len(out) == ev["ts"].dt.to_period("M").nunique()
    # avg DAU never exceeds MAU; stickiness in (0, 1e6]
    assert (out["avg_dau_floor"] <= out["mau"]).all()
    assert (out["stickiness_ppm"] > 0).all()
    assert (out["stickiness_ppm"] <= 1_000_000).all()
    # cross-check one month exactly
    m0 = out.iloc[0]["month"]
    sub = ev[ev["ts"].dt.to_period("M").dt.start_time.dt.date == m0]
    assert out.iloc[0]["mau"] == sub["user_id"].nunique()


# ---------------------------------------------------------------------------
# feed_reconcile_daily
# ---------------------------------------------------------------------------
def test_feed_reconcile_all_three_states(spark, sf_dir):
    out = _run(spark, sf_dir, "feed_reconcile_daily")
    assert set(out["presence"]) == {"both", "orders_only", "shipments_only"}
    both = out[out["presence"] == "both"]
    assert (both["n_orders"] > 0).all() and (both["n_shipments"] > 0).all()
    assert (out[out["presence"] == "orders_only"]["n_shipments"] == 0).all()
    assert (out[out["presence"] == "shipments_only"]["n_orders"] == 0).all()
    assert out["day"].is_unique


def test_feed_reconcile_aggregates_before_join(spark, sf_dir):
    """Both sides must reduce to daily grain BEFORE the full-outer join
    (4 HashAggregates: partial+final per feed) — never a raw-grain
    fact-to-fact outer join."""
    plan = _plan(spark, sf_dir, "feed_reconcile_daily")
    assert "FullOuter" in plan
    assert plan.count("HashAggregate") >= 4


@pytest.mark.parametrize(
    "name",
    [
        "repetition_score",
        "decontam_overlap",
        "label_centroids",
        "token_len_decile_gate",
        "value_histogram",
        "user_value_outliers",
        "multimodal_resize",
        "frame_sample_stats",
        "doc_chunks",
        "source_overlap_matrix",
        "sequence_packing",
        "tfidf_top_terms",
        "dau_mau_stickiness",
        "feed_reconcile_daily",
    ],
)
def test_registered_with_oracle(name):
    assert QUERIES[name].oracle is not None
