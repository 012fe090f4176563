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
    the parent's key columns only (scan pruned to the keys).

    NULL foreign keys are EXEMPT, per SQL's MATCH SIMPLE rule: a null
    FK is 'no reference', not a broken one — this codebase itself
    models null FKs as ordinary data (unattributed events, guest
    checkouts; see operators/skew.py). Without the exemption the
    anti-join (which never matches nulls) would report every null-FK
    row as a violation, drowning real orphans. Audit null FKs
    separately with :func:`null_violations` if they matter.
    """
    fk = list(fk)
    pk = list(pk or fk)
    non_null = F.lit(True)
    for c in fk:
        non_null = non_null & F.col(c).isNotNull()
    parent_keys = parent.select(
        *[F.col(p).alias(f) for p, f in zip(pk, fk)]
    ).dropDuplicates(fk)
    return child.filter(non_null).join(parent_keys, on=fk, how="left_anti")


def check_report(checks: dict[str, DataFrame]) -> dict[str, int]:
    """Materialize named checks into violation counts."""
    return {name: df.count() for name, df in checks.items()}


def observe_dq(
    df: DataFrame,
    name: str,
    not_null_cols: Sequence[str] = (),
    value_col: str | None = None,
):
    """Attach zero-extra-pass DQ counters to a frame via ``df.observe``.

    Every check in this module costs an extra ACTION over the data;
    ``observe`` instead piggybacks accumulator-style metrics on
    whatever action the caller was already running (the write, the
    aggregate) — at 100 TB that is the difference between "DQ counters
    are free" and "DQ doubles the scan". Metrics collected per action:
    ``n_rows``, ``n_null_<col>`` for each declared NOT NULL column,
    and min/max of ``value_col`` when given (range sanity).

    Returns ``(observed_df, observation)`` — run any action on
    ``observed_df`` (or a descendant), then read ``observation.get``
    as a plain dict. On a STREAMING frame pass a string observation
    instead (``df.observe("name", ...)``) and read
    ``lastProgress.observedMetrics`` per micro-batch — the metric
    expressions here work unchanged.
    """
    from pyspark.sql import Observation

    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in not_null_cols:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"n_null_{c}")
        )
    if value_col is not None:
        metrics.append(F.min(value_col).alias(f"min_{value_col}"))
        metrics.append(F.max(value_col).alias(f"max_{value_col}"))
    obs = Observation(name)
    return df.observe(obs, *metrics), obs
