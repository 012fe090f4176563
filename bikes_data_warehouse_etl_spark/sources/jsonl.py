"""JSONL (newline-delimited JSON) source — the arrival format of web
training corpora (Common Crawl derivatives, chat logs, scraped docs).

Extends the reference's source surface (SURVEY §2.1 reads CSVs only)
with the ingest shape a training-data pipeline actually needs: an
explicit schema (inference re-reads the data and is non-deterministic
across samples), a FAILFAST mode for curated drops, and a PERMISSIVE
mode that *quarantines* malformed lines into a ``_corrupt_record``
column instead of silently nulling fields — at 100 TB a silent 0.1%
parse-loss is a million missing documents, so corruption must be
observable and routable to a quarantine sink.

Scale: ``spark.read.json`` with an explicit schema is a streaming
line-parser per split — no shuffle, no inference pass; gzip JSONL
splits per-file (not per-block), so shard uploads into many files.
Like the CSV edge, JSONL is ingestion-only: everything downstream
persists as parquet for columnar pruning.
"""

from __future__ import annotations

from collections.abc import Iterator
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DOCUMENTS_JSONL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)

_CORRUPT = "_corrupt_record"


def read_documents_jsonl(
    spark: SparkSession, path: str, mode: str = "FAILFAST"
) -> DataFrame:
    """Read a documents corpus from JSONL with the pinned schema.

    ``mode="FAILFAST"`` raises on the first malformed line (curated
    drops); ``mode="PERMISSIVE"`` returns good rows with a null
    ``_corrupt_record`` and malformed lines with ONLY that column set,
    so callers can split good/bad with one filter (see
    :func:`split_corrupt`).
    """
    schema = DOCUMENTS_JSONL_SCHEMA
    if mode == "PERMISSIVE":
        schema = StructType(
            schema.fields + [StructField(_CORRUPT, StringType(), True)]
        )
    return (
        spark.read.schema(schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )


@contextmanager
def split_corrupt(
    df: DataFrame,
) -> Iterator[tuple[DataFrame, DataFrame]]:
    """Split a PERMISSIVE read into (good, quarantine) — a context
    manager, so the cache it needs cannot leak.

    Spark requires caching/materializing the parsed frame before
    filtering on the corrupt column (the parser is lazy and
    re-parsing would race the filter) — the referenced quarantine
    pattern from the Spark JSON datasource docs. The cached parent is
    unpersisted on exit on ALL paths (including exceptions), so there
    is no caller-side unpersist obligation — the round-3 API returned
    the cached frame with a "caller MUST unpersist" comment, which an
    exception between call and unpersist silently defeated::

        with split_corrupt(df) as (good, bad):
            good.write.parquet(clean_path)
            bad.write.parquet(quarantine_path)

    Both splits must be *consumed inside* the block; after exit they
    still compute correctly but re-parse the source (cache gone).
    """
    df = df.cache()
    try:
        good = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
        bad = df.filter(F.col(_CORRUPT).isNotNull()).select(_CORRUPT)
        yield good, bad
    finally:
        df.unpersist()


def write_jsonl(df: DataFrame, path: str) -> None:
    """Write a corpus as JSONL (interchange/export edge)."""
    df.write.mode("overwrite").json(path)
