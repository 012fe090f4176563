"""ORC source/sink — the second columnar interchange format (SURVEY
§2.1 widened; the reference reads CSVs and writes a SQL-Server DW,
but warehouse neighbors — Hive/Trino/legacy Hadoop estates — hand
over ORC as often as parquet).

Spark's ORC support is built-in (native vectorized reader), with the
same declarative scan properties as parquet: column pruning reaches
``ReadSchema`` and predicate pushdown reaches ``PushedFilters``, so a
filtered 2-column projection over a wide ORC fact reads only those
columns' streams. Everything downstream still persists as parquet —
ORC is an ingestion/interchange edge here, same policy as CSV/JSONL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """Scan an ORC table; pass ``schema`` to pin types on curated
    drops (inference reads footers only — cheap, but a pinned schema
    catches upstream type drift at read time instead of mid-job)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)
