"""Behavior tests for plans/pipeline_ops67.py (incremental corpus
maintenance + retrieval mining).

The DuckDB-oracle gate covers end-to-end equality; these pin the
semantic contracts on constructed inputs — base-preference, the
classification taxonomy, margin signs — where a wrong-but-consistent
dual formulation could slip past the differential."""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from bikes_data_warehouse_etl_spark.plans import QUERIES


def _run(spark, sf_dir, name: str) -> pd.DataFrame:
    return QUERIES[name].spark(spark, sf_dir).toPandas()


def _docs(rows):
    return pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )


def _write_docs(spark, tmp, rows):
    spark.createDataFrame(_docs(rows)).write.parquet(
        os.path.join(tmp, "documents.parquet")
    )


def test_incremental_dedup_taxonomy(spark):
    """Even ids are base, odd are ingest. A doc whose text exists in
    base is dup_of_base even if repeated intra-batch; novel content
    keeps exactly one keeper; the rest are intra_batch_dup."""
    rows = [
        (0, "alpha", "en", "s", 5),     # base
        (2, "beta", "en", "s", 4),      # base
        (1, "alpha", "en", "s", 5),     # ingest: dup_of_base
        (3, "gamma", "en", "s", 5),     # ingest: novel (keeper)
        (5, "gamma", "en", "s", 5),     # ingest: intra_batch_dup
        (7, "delta", "en", "s", 5),     # ingest: novel
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write_docs(spark, tmp, rows)
        out = _run(spark, tmp, "incremental_dedup_ingest")
        got = dict(zip(out["dedup_class"], out["n_docs"]))
        assert got == {"dup_of_base": 1, "novel": 2, "intra_batch_dup": 1}


def test_corpus_refresh_prefers_base_copy(spark):
    """Identical text in both snapshots: the kept copy must come from
    the BASE snapshot (stable id), so n_from_base counts it."""
    rows = [
        (1, "same text here", "en", "s", 14),  # ingest copy (lower id!)
        (2, "same text here", "en", "s", 14),  # base copy must win
        (3, "only ingest", "en", "s", 11),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write_docs(spark, tmp, rows)
        out = _run(spark, tmp, "corpus_refresh_merge")
        row = out.set_index("source").loc["s"]
        assert int(row["n_kept"]) == 2
        assert int(row["n_from_base"]) == 1
        assert int(row["n_from_ingest"]) == 1


def test_vocab_drift_disjoint_and_identical(spark):
    """Disjoint vocabularies → zero common, zero displacement; the
    only-counts carry each side's full top list."""
    rows = [
        (0, "aa bb cc", "en", "s", 8),   # base
        (1, "xx yy zz", "en", "s", 8),   # ingest
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write_docs(spark, tmp, rows)
        out = _run(spark, tmp, "snapshot_vocab_drift").iloc[0]
        assert int(out["n_common"]) == 0
        assert int(out["n_only_base"]) == 3
        assert int(out["n_only_ingest"]) == 3
        assert int(out["rank_disp"]) == 0


def test_hard_negative_margin_signs(spark, sf_dir):
    """On real data: margins are pos_bp - hard_neg_bp wherever both
    exist, and pos_bp ≤ 10000 (cosine ceiling in bp)."""
    out = _run(spark, sf_dir, "hard_negative_margin")
    both = out.dropna(subset=["pos_bp", "hard_neg_bp"])
    assert len(out) >= 1
    assert (
        both["margin_bp"] == both["pos_bp"] - both["hard_neg_bp"]
    ).all()
    assert (both["pos_bp"] <= 10000).all()


def test_band_curve_aggregates_accuracy(spark, sf_dir):
    """The curve's pair counts must total minhash_accuracy's row count
    and band_matches stays within [1, 4]."""
    acc = _run(spark, sf_dir, "minhash_accuracy")
    curve = _run(spark, sf_dir, "lsh_band_curve")
    assert int(curve["n_pairs"].sum()) == len(acc)
    assert curve["band_matches"].between(1, 4).all()
    assert (curve["min_exact_bp"] <= curve["mean_exact_bp"]).all()
    assert (curve["mean_exact_bp"] <= curve["max_exact_bp"]).all()
