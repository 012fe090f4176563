"""Data-quality invariant checks (SURVEY §2.1 S9: the reference's PK /
NOT NULL constraints become explicit checks — Spark doesn't enforce
constraints, so the engine surfaces violations as DataFrames).

Each check returns the *violating rows* (empty = invariant holds), so
callers can fail a pipeline, quarantine rows, or just count. All are
single declarative plans: uniqueness is one aggregation, referential
integrity is one anti-join — both map-side-combinable and
broadcast-friendly at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Key groups violating uniqueness (the reference's PRIMARY KEY,
    ref Createtables_BIKES.sql:48 etc.). Returns (keys…, n_rows>1)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def null_violations(df: DataFrame, not_null_cols: Sequence[str]) -> DataFrame:
    """Rows with NULLs in declared NOT NULL columns."""
    pred = F.lit(False)
    for c in not_null_cols:
        pred = pred | F.col(c).isNull()
    return df.filter(pred)


def orphan_rows(
    child: DataFrame,
    parent: DataFrame,
    fk: Sequence[str],
    pk: Sequence[str] | None = None,
) -> DataFrame:
    """Child rows whose FK has no parent (the referential integrity the
    reference keeps 'by convention only' — SURVEY §1.3). Anti-join on
    the parent's key columns only (scan pruned to the keys)."""
    pk = list(pk or fk)
    parent_keys = parent.select(
        *[F.col(p).alias(f) for p, f in zip(pk, fk)]
    ).dropDuplicates(list(fk))
    return child.join(parent_keys, on=list(fk), how="left_anti")


def check_report(checks: dict[str, DataFrame]) -> dict[str, int]:
    """Materialize named checks into violation counts."""
    return {name: df.count() for name, df in checks.items()}
