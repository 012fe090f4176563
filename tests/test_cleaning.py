"""Unit tests for the cleaning/derivation expressions (SURVEY §5.1).

Pin the semantics quirks that define correctness: \\W+ stripping,
day-first date parsing, birthday-aware age, right-closed age buckets.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.cleaning import (
    age_at,
    age_bucket,
    clean_name,
    parse_ddmmyyyy,
)


def _vals(spark, rows, schema, expr):
    df = spark.createDataFrame(rows, schema)
    return [r[0] for r in df.select(expr).collect()]


def test_clean_name_strips_all_non_word_chars(spark):
    rows = [("Laraine@%",), ("Bockman##",), ("Dearle*",), ("Sheila-kathryn",), (None,)]
    out = _vals(spark, rows, "name string", clean_name("name"))
    # \W+ also removes hyphens — reference semantics (README.md:7)
    assert out == ["Laraine", "Bockman", "Dearle", "Sheilakathryn", None]


def test_parse_ddmmyyyy_is_day_first(spark):
    rows = [("12-10-1953",), ("16-12-1980",)]
    out = _vals(spark, rows, "d string", parse_ddmmyyyy("d"))
    # '12-10-1953' is Oct 12 (the reference's astype() read it month-first
    # — documented divergence, SURVEY §1.5.2)
    assert out == [dt.date(1953, 10, 12), dt.date(1980, 12, 16)]


def test_age_at_is_birthday_aware(spark):
    as_of = F.lit("2020-06-15").cast("date")
    rows = [
        ("2000-06-15",),  # birthday today → 20
        ("2000-06-16",),  # birthday tomorrow → still 19
        ("2000-06-14",),  # birthday yesterday → 20
        ("2000-12-31",),  # later in year → 19
        ("2000-01-01",),  # earlier in year → 20
    ]
    out = _vals(
        spark, rows, "dob string", age_at(F.col("dob").cast("date"), as_of)
    )
    assert out == [20, 19, 20, 19, 20]


def test_age_bucket_right_closed_reference_semantics(spark):
    cases = {
        17: None,  # below range
        18: "18-29",  # include_lowest
        29: "18-29",
        30: "18-29",  # right-closed: 30 stays in the first bucket (§1.5.1)
        31: "30-39",
        40: "30-39",
        41: "40-49",
        70: "60-69",
        71: "70+",
        120: "70+",
        121: None,  # above range
    }
    out = _vals(
        spark, [(k,) for k in cases], "age long", age_bucket("age")
    )
    assert out == list(cases.values())
