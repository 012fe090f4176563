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


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to ``TimestampType`` whatever the parquet
    encoding was.

    The testdata generator has shipped ``ts`` two ways across rounds:

    * parquet TIMESTAMP(NANOS) — unreadable natively
      (``PARQUET_TYPE_ILLEGAL``) unless
      ``spark.sql.legacy.parquet.nanosAsLong`` is set, in which case it
      arrives as ``bigint`` epoch-nanos. Normalized with exact integer
      division (epoch-ns ~1.7e18 exceeds double's 53-bit mantissa, so
      ``/ 1000`` via double would be off by ±1 µs — use ``div``).
    * parquet ``timestamp[us]`` with no timezone — Spark infers
      ``TimestampNTZType``. Normalized by a cast that must interpret the
      naive value as UTC (the generator's convention, and what the
      DuckDB oracle does when extracting epochs). Spark resolves the
      cast's timezone at *analysis* time, so we pin the session tz to
      UTC while building the expression and restore it after — callers
      on non-UTC sessions still get naive-as-UTC semantics.
    """
    spark = df.sparkSession
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if ts_type == "timestamp_ntz":
        prev = spark.conf.get("spark.sql.session.timeZone")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        try:
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        finally:
            spark.conf.set("spark.sql.session.timeZone", prev)
    return df


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one synthetic table.

    ``events.ts`` needs the ``nanosAsLong`` conf *before* the scan in
    case the files are TIMESTAMP(NANOS) (harmless otherwise), then
    :func:`normalize_event_ts` handles whichever physical encoding the
    files actually carry — ``read_table`` must behave identically under
    ANY SparkSession, not just :func:`session.get_spark`.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_event_ts(df)
    return df


def read_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Scan a parquet dataset whose files were written under EVOLVING
    schemas (columns added over time — the normal life of a 100 TB
    table fed by a changing upstream).

    ``mergeSchema=true`` unions the footers of all files into one
    schema; rows from older files read the added columns as null.
    Default Spark behavior picks ONE footer and silently DROPS later
    columns when an old file is sampled — at scale that is a
    data-dependent heisenbug (whichever file is listed first wins), so
    ingestion paths here always read evolving locations through this
    helper. Cost: one footer read per file at planning (driver-side,
    metadata only) — noticeable at millions of files, irrelevant below;
    pin the final schema with a catalog table once it stabilizes.
    """
    return spark.read.option("mergeSchema", "true").parquet(path)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {t: read_table(spark, sf_dir, t) for t in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every table as a temp view so queries also run as pure SQL."""
    for t in TABLES:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)

def widen_scan(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Round-robin repartition a scan ONLY when it has fewer input
    splits than the cluster has cores.

    Row-local-heavy plans (per-char md5 fingerprinting, span censuses)
    have no shuffle at all, so their parallelism equals the number of
    file splits. At production scale that is thousands of splits and
    this helper is an audited NO-OP — ``df`` is returned untouched, no
    exchange enters the plan. On a single small parquet file (the
    sf0.1 testdata's ~10 MB documents table → one split) the same plan
    is pinned to one core while 31 idle; shipping the pre-compute rows
    once (~the file's size, orders of magnitude below what the
    compute-then-shuffle alternative moves) buys full-width execution.

    The split count comes from compiling the scan's RDD lineage — no
    job runs. Callers apply this BEFORE the expensive projection, on
    the thinnest column set they need.
    """
    n_splits = df.rdd.getNumPartitions()
    n_cores = spark.sparkContext.defaultParallelism
    if n_splits >= n_cores:
        return df
    return df.repartition(n_cores)
