"""Binary-file ingestion for the multimodal path: Spark's built-in
``binaryFile`` format reads a directory of opaque media files as
(path, modificationTime, length, content) rows — the raw-bytes
on-ramp that `operators/multimodal.py decode_media` consumes.

Scale notes: binaryFile is a FileFormat, so listing parallelizes and
``pathGlobFilter`` prunes at the driver before any task launches;
``spark.sql.files.maxPartitionBytes`` governs how many files pack into
one task (small media files get bin-packed, huge ones get their own
task). Content is NOT splittable — one file is one row — so a 100 TB
media lake should be sharded into object-store-friendly file sizes
upstream, exactly as any training-data pipeline stores it. The
``binaryFile`` reader never decodes: bytes go straight into the Arrow
batch for the Pandas-UDF decode stage.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def read_binary_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Read a directory of files as binary rows.

    Returns the native binaryFile schema: (path string,
    modificationTime timestamp, length long, content binary).
    ``glob`` (e.g. ``*.jpg``) prunes files during listing, before any
    read task runs.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def media_from_binary_files(
    spark: SparkSession,
    path: str,
    media_type: str,
    glob: str | None = None,
) -> DataFrame:
    """Adapt a binaryFile directory scan to the MEDIA_SCHEMA contract
    (`operators/multimodal.py`): media_id is the xxhash64 of the file
    path (deterministic across runs and executors — no
    monotonically_increasing_id, whose values depend on partition
    layout), source_uri preserves provenance, and content rides through
    untouched for the decode stage.
    """
    return read_binary_dir(spark, path, glob).select(
        F.xxhash64("path").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.col("content"),
        F.col("path").alias("source_uri"),
    )
