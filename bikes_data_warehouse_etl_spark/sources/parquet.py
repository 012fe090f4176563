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

    ``events.ts`` is written as parquet TIMESTAMP(NANOS); Spark reads it
    as nanosecond-precision only via the long fallback on some builds,
    so we normalize: if the column arrives as ``bigint`` (nanos-as-long)
    we convert to a microsecond timestamp. Queries that must hash-match
    the DuckDB oracle truncate to whole seconds anyway.
    """
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {t: read_table(spark, sf_dir, t) for t in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every table as a temp view so queries also run as pure SQL."""
    for t in TABLES:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)
