"""Python UDTF surface: the sentence-segmentation parser — lateral
row→rows expansion with abbreviation/decimal lookahead state."""

from __future__ import annotations

import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.udtfs import SentenceSplit


def test_sentence_split_handles_abbreviations_and_decimals(spark):
    rows = SentenceSplit(F.lit(
        "Dr. Smith paid 3.50 today. Amazing! Was it worth it? Maybe."
    )).collect()
    sentences = [r["sentence"] for r in rows]
    assert sentences == [
        "Dr. Smith paid 3.50 today.",
        "Amazing!",
        "Was it worth it?",
        "Maybe.",
    ]
    assert [r["sentence_idx"] for r in rows] == [0, 1, 2, 3]
    assert rows[0]["n_tokens"] == 5


def test_sentence_split_dotted_abbreviations_and_initials(spark):
    """'e.g.'/'i.e.' must not break at EITHER of their dots (the first
    dot's tail is the single letter 'e'/'i' — the initials rule; the
    second dot's tail is 'e.g' — the abbreviation list), and name
    initials must not end sentences."""
    rows = SentenceSplit(F.lit(
        "See e.g. the appendix for details. J. Smith agreed. Done."
    )).collect()
    assert [r["sentence"] for r in rows] == [
        "See e.g. the appendix for details.",
        "J. Smith agreed.",
        "Done.",
    ]


def test_sentence_split_lateral_over_table(spark, sf_dir):
    """Registered UDTF joins LATERAL per document row — the SQL calling
    convention a parse-once ingestion job uses."""
    from bikes_data_warehouse_etl_spark.sources.parquet import read_table

    spark.udtf.register("sentence_split", SentenceSplit)
    read_table(spark, sf_dir, "documents").limit(50).createOrReplaceTempView(
        "docs_head"
    )
    out = spark.sql(
        """
        SELECT d.doc_id, s.sentence_idx, s.n_tokens
        FROM docs_head d, LATERAL sentence_split(d.text) s
        """
    )
    rows = out.collect()
    assert len(rows) >= 50  # at least one sentence per doc
    assert all(r["n_tokens"] >= 1 for r in rows)


def test_sentence_split_empty_and_null(spark):
    assert SentenceSplit(F.lit("")).collect() == []
    df = spark.createDataFrame([(None,)], "text string")
    spark.udtf.register("sentence_split", SentenceSplit)
    df.createOrReplaceTempView("null_text")
    assert (
        spark.sql(
            "SELECT s.* FROM null_text t, LATERAL sentence_split(t.text) s"
        ).count()
        == 0
    )
