"""Anti-join change-data-capture (reference parity: J4, SURVEY §2.3).

The reference's incremental fact loads guard against reprocessing with
``LEFT JOIN existing_fact ON key WHERE existing.key IS NULL``
(ref BikesDWSQl.sql:60-67 single key, :92-100 composite key). Spark's
``left_anti`` join is the direct, null-safe expression of that pattern.

Scale note: the existing-fact side only needs its key columns — select
them before the join so the scan is pruned to the keys; with a
date-partitioned fact, pass a pre-filtered ``existing`` (e.g. last N
days) to get partition pruning too.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def anti_join_new_rows(
    incoming: DataFrame, existing: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Rows of ``incoming`` whose key is absent from ``existing``."""
    return incoming.join(
        existing.select(*keys).dropDuplicates(list(keys)),
        on=list(keys),
        how="left_anti",
    )
