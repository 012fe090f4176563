"""Parquet table source for the synthetic star schema.

Reads are declarative ``spark.read.parquet`` scans, so column pruning
and predicate pushdown reach the parquet row groups automatically
(verify with ``df.explain('formatted')`` → ``PushedFilters`` /
``ReadSchema``). Nothing is cached or collected here — callers compose
lazily and Catalyst sees the whole plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one synthetic table.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS); vanilla Spark
    refuses that physical type (``PARQUET_TYPE_ILLEGAL``) unless the
    runtime SQL conf ``spark.sql.legacy.parquet.nanosAsLong`` is set, so
    we set it here — ``read_table`` must behave identically under ANY
    SparkSession, not just :func:`session.get_spark`. The column then
    arrives as ``bigint`` epoch-nanos and is normalized back to a
    microsecond timestamp with exact integer division (epoch-ns values
    ~1.7e18 exceed double's 53-bit mantissa, so ``/ 1000`` via double
    would be off by ±1 µs near boundaries — use ``div``).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {t: read_table(spark, sf_dir, t) for t in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every table as a temp view so queries also run as pure SQL."""
    for t in TABLES:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)
