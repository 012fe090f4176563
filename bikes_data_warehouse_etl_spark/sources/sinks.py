"""Sink layer: partitioned / bucketed table writes (SURVEY §2.1
S4/S6-S8 generalized to the layouts that matter at 100 TB).

* ``write_partitioned`` — hive-style directory partitioning; readers
  filtering on the partition columns scan only matching directories
  (PartitionFilters in the plan, verified by tests). The Spark analog
  of the reference's daily-refresh cycle is facts partitioned by
  year/date.
* ``write_bucketed`` — catalog table bucketed+sorted by join key: two
  bucketed tables with matching bucket counts join with NO shuffle on
  either side (the co-located join the reference's single-node SQL
  Server gets implicitly).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    (
        df.write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def read_partition_pruned(
    spark: SparkSession, path: str
) -> DataFrame:
    """Plain read; apply partition-column filters on the result and
    Spark prunes directories before listing files."""
    return spark.read.parquet(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_files: int = 1,
    partition_cols: Sequence[str] | None = None,
) -> None:
    """Small-files compaction: rewrite a parquet table into
    ``target_files`` files (per partition when ``partition_cols``).

    Streaming/incremental appends accumulate small files; at 100 TB the
    file-listing and per-file open costs dominate scans long before
    data volume does. Run this as the maintenance pass (Delta's
    OPTIMIZE equivalent). Commit is the crash-consistent
    manifest-pointer protocol of ``sources.snapshot`` — the compacted
    copy is written to a fresh snapshot dir and the table symlink is
    atomically retargeted, so readers never observe a missing or
    partial table (fault-injection-tested in
    tests/test_snapshot_swap.py).
    """
    from bikes_data_warehouse_etl_spark.sources import snapshot

    df = spark.read.parquet(path)
    staged = snapshot.next_snapshot_path(path)
    writer = (
        df.repartition(target_files, *partition_cols)
        if partition_cols
        else df.repartition(target_files)
    ).write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(staged)
    snapshot.commit_snapshot(path, staged)
