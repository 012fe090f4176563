"""CSV source with explicit schemas (reference parity: S1 in SURVEY §2.1).

``spark.read.csv`` with an explicit StructType replaces the reference's
inferred ``pd.read_csv`` (ref ``ETLScript_withSCDimplementation.py:22``).
Spark's CSV reader strips the UTF-8 BOM on Address/Store natively.

At 100 TB a CSV drop-directory source is the slow path — this reader is
the ingestion edge only; everything downstream persists as parquet (or a
table format) so subsequent scans get columnar pruning and pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bikes_data_warehouse_etl_spark.schemas import SOURCE_SCHEMAS


def read_source_csv(spark: SparkSession, path: str, table: str) -> DataFrame:
    """Read one bikes source extract with its declared schema.

    ``table`` is one of the nine SOURCE_SCHEMAS keys. ``mode=FAILFAST``
    surfaces malformed rows instead of silently nulling them — data
    quality is a first-class invariant (the reference relies on SQL
    Server NOT NULL constraints; Spark doesn't enforce constraints, so
    we fail at the edge).
    """
    schema = SOURCE_SCHEMAS[table]
    return spark.read.csv(path, header=True, schema=schema, mode="FAILFAST")
