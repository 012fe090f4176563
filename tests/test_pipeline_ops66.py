"""Behavior tests for plans/pipeline_ops66.py (Bloom-prefiltered
decontamination).

The DuckDB-oracle gate covers end-to-end equality; these pin the
no-false-negative contract on a constructed corpus and cross-check the
bloom path against a plain pandas anti-join on real data."""

from __future__ import annotations

import os
import re
import tempfile

import pandas as pd

from bikes_data_warehouse_etl_spark.plans import QUERIES


def _run(spark, sf_dir, name: str) -> pd.DataFrame:
    return QUERIES[name].spark(spark, sf_dir).toPandas()


def _docs(rows):
    return pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )


def test_bloom_keeps_clean_drops_contaminated(spark):
    """A corpus doc sharing ANY 3-shingle with src0 is dropped; docs
    with no shared shingle survive — exactly the anti-join contract."""
    bench_text = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, bench_text, "en", "src0", len(bench_text)),
        # shares the shingle "quick brown fox"
        (2, "a quick brown fox appeared", "en", "src1", 26),
        # same words, but never 3 consecutive benchmark words
        (3, "fox brown quick dog lazy the", "en", "src1", 28),
        (4, "completely unrelated text here now", "en", "src2", 34),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(_docs(rows)).write.parquet(
            os.path.join(tmp, "documents.parquet")
        )
        out = _run(spark, tmp, "bloom_decontam_keep")
        assert sorted(out["doc_id"]) == [3, 4]


def test_bloom_path_equals_plain_antijoin_real_data(spark, sf_dir):
    """No false negatives: the bloom-prefiltered result must equal the
    exact anti-join computed independently in pandas on sf0.001."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")

    def shingles(text: str) -> set[str]:
        toks = [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split() if t]
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    bench: set[str] = set()
    for t in docs.loc[docs["source"] == "src0", "text"]:
        bench |= shingles(t)
    corpus = docs[docs["source"] != "src0"]
    expected = sorted(
        int(r.doc_id)
        for r in corpus.itertuples()
        if not (shingles(r.text) & bench)
    )
    out = _run(spark, sf_dir, "bloom_decontam_keep")
    assert sorted(out["doc_id"]) == expected
