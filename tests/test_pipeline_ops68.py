"""Behavior tests for plans/pipeline_ops68.py (split leakage, rater
kappa, dup-cluster census) on constructed corpora where the expected
numbers are hand-checkable."""

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


def _write(spark, tmp, rows):
    spark.createDataFrame(_docs(rows)).write.parquet(
        os.path.join(tmp, "documents.parquet")
    )


def test_split_leakage_flags_cross_split_neardup(spark):
    """Identical docs at ids 79 (train) and 95 (test) must surface as
    a (test, train) row with n_leaking ≥ 1 and jaccard 10000."""
    body = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (79, body, "en", "s", len(body)),
        (95, body, "en", "s", len(body)),
        (1, "one two three four five six seven eight", "en", "s", 40),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write(spark, tmp, rows)
        out = _run(spark, tmp, "split_leakage_pairs")
        cross = out[out["split_lo"] != out["split_hi"]]
        assert len(cross) == 1
        row = cross.iloc[0]
        assert (row["split_lo"], row["split_hi"]) == ("test", "train")
        assert int(row["n_leaking"]) >= 1
        assert int(row["mean_jaccard_bp"]) == 10000


def test_kappa_perfect_and_chance(spark):
    """Raters engineered to agree perfectly give kappa 1000; the
    confusion counts must sum to n_docs."""
    # every doc: >=25% stopwords AND in the length window -> both pass;
    # plus docs failing BOTH raters (no stopwords, too short)
    good = "the and of to in is a word " * 5          # ra=1 (stopword-heavy)
    bad = "zz"                                         # ra=0, rb=0
    rows = [(i, good, "en", "s", 150) for i in range(4)] + [
        (10 + i, bad, "en", "s", 2) for i in range(4)
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write(spark, tmp, rows)
        out = _run(spark, tmp, "quality_rater_kappa").iloc[0]
        assert int(out["n_docs"]) == 8
        assert (
            int(out["n00"]) + int(out["n01"]) + int(out["n10"]) + int(out["n11"])
            == 8
        )
        assert int(out["n00"]) == 4 and int(out["n11"]) == 4
        assert int(out["kappa_milli"]) == 1000


def test_dup_cluster_histogram_counts_reordered(spark):
    """A byte-exact pair, a token-REORDERED pair, and a singleton:
    fingerprint clustering puts both pairs at size 2."""
    rows = [
        (1, "aa bb cc", "en", "s", 8),
        (2, "aa bb cc", "en", "s", 8),      # exact dup of 1
        (3, "dd ee ff", "en", "s", 8),
        (4, "ff ee dd", "en", "s", 8),      # reordered dup of 3
        (5, "gg hh ii", "en", "s", 8),      # singleton
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write(spark, tmp, rows)
        out = _run(spark, tmp, "dup_cluster_histogram").set_index(
            "cluster_size"
        )
        assert int(out.loc[2, "n_clusters"]) == 2
        assert int(out.loc[2, "n_docs"]) == 4
        assert int(out.loc[2, "n_removable"]) == 2
        assert int(out.loc[1, "n_clusters"]) == 1
        assert int(out.loc[1, "n_removable"]) == 0
