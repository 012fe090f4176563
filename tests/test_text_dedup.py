"""Unit tests: text functions + dedup family semantics."""

from __future__ import annotations

import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.text import (
    fingerprint,
    lang_id_guess,
    token_count,
    word_shingles,
)
from bikes_data_warehouse_etl_spark.operators.dedup import (
    exact_dedup,
    fingerprint_dedup,
    minhash_candidates,
    ngram_jaccard_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_shingles(spark):
    df = _docs(spark, [(1, "a b c d"), (2, "a b"), (3, "")])
    out = {r["doc_id"]: r["s"] for r in df.select("doc_id", word_shingles("text", 3).alias("s")).collect()}
    assert out[1] == ["a b c", "b c d"]
    assert out[2] == []  # fewer tokens than k
    assert out[3] == []


def test_token_count_and_fingerprint_order_insensitive(spark):
    df = _docs(spark, [(1, "Hello, world! hello"), (2, "world hello HELLO"), (3, "")])
    tc = {r["doc_id"]: r["n"] for r in df.select("doc_id", token_count("text").alias("n")).collect()}
    assert tc == {1: 3, 2: 3, 3: 0}
    fps = {r["doc_id"]: r["fp"] for r in df.select("doc_id", fingerprint("text").alias("fp")).collect()}
    # same token set in different order → identical fingerprint
    assert fps[1] == fps[2]


def test_lang_id_guess(spark):
    df = _docs(
        spark,
        [
            (1, "the cat and the dog of the house"),
            (2, "el perro y la casa de que"),
            (3, "der hund und die katze ist ein"),
            (4, "总结 一下"),
            (5, "zzz qqq xxx"),
        ],
    )
    out = {r["doc_id"]: r["g"] for r in df.select("doc_id", lang_id_guess("text").alias("g")).collect()}
    assert out == {1: "en", 2: "es", 3: "de", 4: "zh", 5: "und"}


def test_exact_and_fingerprint_dedup(spark):
    df = _docs(
        spark,
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "gamma beta alpha"), (4, "delta")],
    )
    exact = exact_dedup(df)
    assert exact.count() == 3  # 1&2 collapse
    assert exact.filter(F.col("dup_cnt") == 2).first()["keep_doc_id"] == 1
    fp = fingerprint_dedup(df)
    # reordering also collapses under the fingerprint
    assert fp.count() == 2
    assert {r["dup_cnt"] for r in fp.collect()} == {3, 1}


def test_minhash_lsh_finds_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different content about spark shuffles and partitions here"
    df = _docs(spark, [(1, base), (2, near), (3, far)])
    cands = minhash_candidates(df, n_hashes=8, bands=4)
    pairs = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs
    # verification stage: true jaccard confirms, in basis points
    verified = ngram_jaccard_pairs(df, threshold=0.2, candidates=cands)
    rows = verified.collect()
    assert len(rows) == 1 and rows[0]["id_a"] == 1 and rows[0]["id_b"] == 2
    assert rows[0]["jaccard_bp"] > 5000  # > 0.5 similar
