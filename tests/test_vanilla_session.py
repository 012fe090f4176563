"""Queries must run under ANY SparkSession, not just session.get_spark().

The external correctness harness builds a bare ``SparkSession.builder``
without our nanosAsLong conf; round 1 showed every ``events.parquet``
reader crashing there with ``PARQUET_TYPE_ILLEGAL: INT64
(TIMESTAMP(NANOS))``. We simulate the vanilla session by cloning a new
session off the shared context and *unsetting* the legacy conf —
``read_table`` is responsible for setting it back before the scan.
"""

from __future__ import annotations

from pyspark.sql import types as T

from bikes_data_warehouse_etl_spark.plans import QUERIES

EVENTS_QUERIES = (
    "events_tumbling",
    "events_sessionize",
    "events_json_extract",
    "events_sliding",
    "asof_join_last_signup",
    "pivot_events",
)


def _vanilla(spark):
    s = spark.newSession()
    s.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    assert s.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "false"
    return s


def test_events_queries_run_under_vanilla_session(spark, sf_dir):
    s = _vanilla(spark)
    for name in EVENTS_QUERIES:
        df = QUERIES[name].spark(s, sf_dir)
        assert df.count() >= 0, name


def test_events_ts_normalized_to_timestamp(spark, sf_dir):
    from bikes_data_warehouse_etl_spark.sources.parquet import read_table

    s = _vanilla(spark)
    df = read_table(s, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)


def test_nanos_to_micros_is_exact_integer_division(spark):
    # epoch-ns ~1.7e18 exceeds double's 53-bit mantissa; `div` must be exact
    import pyspark.sql.functions as F

    ns = 1_700_000_000_123_456_789
    row = (
        spark.range(1)
        .select(F.timestamp_micros(F.expr(f"cast({ns} as bigint) div 1000")).alias("ts"))
        .select(F.unix_micros("ts").alias("us"))
        .first()
    )
    assert row.us == ns // 1000
