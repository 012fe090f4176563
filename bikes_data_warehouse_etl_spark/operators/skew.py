"""Skew mitigation: salted joins (SURVEY §4 / 100 TB notes).

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled`` is on in session.py); salting
is the explicit fallback for pathological keys (one customer = 30% of
the fact) or for engines/stages AQE can't rewrite (e.g. aggregations
over a hot key).

``salted_join``: the skewed (large) side gets a random-ish salt in
[0, salt); the small side is exploded ``salt`` times so every salted
key finds its match. Result is row-identical to the plain join (tested)
— the shuffle key becomes (key, salt), spreading one hot key over
``salt`` reducers.

``two_phase_agg``: hot-key aggregation as partial-by-(key, salt) then
final-by-key — same trick for groupBy.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def _salt_col(keys: Sequence[str], salt: int):
    """Deterministic pseudo-random salt derived from the whole row's
    key + a per-row uuid-free spread: use hash of key and a
    monotonically varying component (partition-local) — here
    ``rand``-free via ``xxhash64`` over key + spark_partition_id and a
    row-local counter stand-in (``monotonically_increasing_id`` is
    acceptable for salting: it only needs spread, not determinism)."""
    return (
        F.xxhash64(*keys, F.monotonically_increasing_id()) % salt
    ).cast("int")


def salted_join(
    large: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with the large side salted and the small side replicated
    ``salt``x. Output columns = plain ``large.join(small, keys, how)``.

    Only ``inner`` and ``left`` (outer on the *large* side) are
    supported: the small side is replicated ``salt`` times, so a
    right/full outer join would emit every unmatched small-side row
    ``salt`` times — silently wrong, hence rejected."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "the replicated small side would duplicate unmatched rows "
            "under right/full outer joins"
        )
    key_list = list(keys)
    salted_large = large.withColumn("__salt__", F.abs(_salt_col(key_list, salt)))
    replicated_small = small.withColumn(
        "__salt__", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_large.join(
        replicated_small, on=key_list + ["__salt__"], how=how
    )
    return out.drop("__salt__")


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    salt: int = 8,
) -> DataFrame:
    """Hot-key sum aggregation in two phases: partial by (key, salt),
    final by key. Identical results to a direct groupBy-sum (tested);
    the first shuffle spreads a hot key across ``salt`` partitions."""
    key_list = list(keys)
    salted = df.withColumn("__salt__", F.abs(_salt_col(key_list, salt)))
    partial = salted.groupBy(*key_list, "__salt__").agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )
    return partial.groupBy(*key_list).agg(
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols]
    )


def null_split_left_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """LEFT JOIN that routes null-key rows *around* the shuffle.

    Null join keys never match, but a plain left join still shuffles
    them — and because every NULL hashes to the same value, they all
    land on ONE reducer: the classic silent straggler when 30% of a
    fact's foreign key is null (unattributed events, guest checkouts).
    Here the null-key rows split off as a scan-local filter, skip the
    join entirely, and re-enter via a narrow union with the right
    side's columns typed-null — row-identical to the plain left join
    (proved by the `null_skew_join` oracle hash), minus the hot
    partition.

    Precondition: ``left`` and ``right`` share no column names (the
    usual projected-join contract).
    """
    matched = left.filter(F.col(left_key).isNotNull()).join(
        right, F.col(left_key) == F.col(right_key), "left"
    )
    # one select, not a withColumn-per-field loop: each withColumn call
    # stacks a fresh Project node and re-analyzes — measurable on
    # hundreds-of-column dims (multimodal.py's resize_dims batches for
    # the same reason)
    nulls = left.filter(F.col(left_key).isNull()).select(
        "*",
        *[
            F.lit(None).cast(field.dataType).alias(field.name)
            for field in right.schema.fields
        ],
    )
    return matched.unionByName(nulls)
