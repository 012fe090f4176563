"""SCD1/SCD2 merge semantics (SURVEY §5.1/§5.4 property checks).

These pin the *intent* semantics with the reference's bugs fixed:
null-safe change detection (§1.5.4), all changed rows applied (§1.5.5),
SCD2 expires only the current version (§1.5.7), exactly one
current_flag=1 row per key.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.operators.merge import (
    classify_changes,
    scd1_merge,
    scd2_merge,
)

SCHEMA = "k long, a string, b long"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_classify_insert_update_noop_and_null_safety(spark):
    tgt = _df(spark, [(1, "x", 10), (2, None, 20), (3, "z", None)])
    src = _df(
        spark,
        [
            (1, "x", 10),     # identical → N
            (2, None, 20),    # NULL == NULL → N (reference bug §1.5.4 fixed)
            (3, "z", 99),     # changed → U
            (4, "new", 40),   # absent key → I
        ],
    )
    flags = {
        r["k"]: r["change_flag"]
        for r in classify_changes(src, tgt, ["k"], ["a", "b"]).collect()
    }
    assert flags == {1: "N", 2: "N", 3: "U", 4: "I"}


def test_scd1_merge_upserts_and_is_idempotent(spark):
    tgt = _df(spark, [(1, "x", 10), (2, "y", 20)])
    src = _df(spark, [(2, "y2", 21), (3, "z", 30)])
    merged = scd1_merge(tgt, src, ["k"])
    assert {(r["k"], r["a"], r["b"]) for r in merged.collect()} == {
        (1, "x", 10),
        (2, "y2", 21),
        (3, "z", 30),
    }
    # idempotence: merging the same source again changes nothing
    again = scd1_merge(merged, src, ["k"])
    assert sorted(again.collect()) == sorted(merged.collect())


def _scd2_target(spark, rows):
    schema = (
        "k string, price long, current_flag long, "
        "effective_timestamp timestamp, expire_timestamp timestamp"
    )
    return spark.createDataFrame(rows, schema)


def test_scd2_expire_and_append(spark):
    import datetime as dt

    t0 = dt.datetime(2020, 1, 1)
    hi = dt.datetime(9999, 12, 31)
    tgt = _scd2_target(
        spark,
        [
            ("A", 100, 1, t0, hi),
            ("B", 200, 1, t0, hi),
            # key C already has history: one expired + one current
            ("C", 300, 0, t0, dt.datetime(2021, 1, 1)),
            ("C", 310, 1, dt.datetime(2021, 1, 1), hi),
        ],
    )
    src = spark.createDataFrame(
        [("A", 150), ("B", 200), ("C", 320), ("D", 400)], "k string, price long"
    )
    out = scd2_merge(tgt, src, ["k"], ["price"], run_ts="2022-06-01 00:00:00")
    rows = out.collect()

    # invariant: exactly one current row per key
    current = [r for r in rows if r["current_flag"] == 1]
    assert sorted(r["k"] for r in current) == ["A", "B", "C", "D"]
    cur = {r["k"]: r for r in current}
    assert cur["A"]["price"] == 150 and cur["C"]["price"] == 320
    assert cur["B"]["price"] == 200  # unchanged → original row untouched
    assert cur["B"]["effective_timestamp"] == t0
    assert cur["D"]["price"] == 400  # brand-new key

    # changed keys: old current expired at run_ts, only that version
    expired_a = [r for r in rows if r["k"] == "A" and r["current_flag"] == 0]
    assert len(expired_a) == 1
    assert str(expired_a[0]["expire_timestamp"]) == "2022-06-01 00:00:00"
    # C's *historical* row keeps its original expiry (§1.5.7 fixed)
    c_hist = [
        r for r in rows if r["k"] == "C" and r["price"] == 300
    ]
    assert str(c_hist[0]["expire_timestamp"]) == "2021-01-01 00:00:00"
    # C's history row + B unchanged + expired currents of A and C + 3 new versions
    assert len(rows) == 7


def test_scd2_idempotent_on_rerun(spark):
    import datetime as dt

    t0 = dt.datetime(2020, 1, 1)
    hi = dt.datetime(9999, 12, 31)
    tgt = _scd2_target(spark, [("A", 100, 1, t0, hi)])
    src = spark.createDataFrame([("A", 100)], "k string, price long")
    out = scd2_merge(tgt, src, ["k"], ["price"], run_ts="2022-06-01 00:00:00")
    assert sorted(out.collect()) == sorted(tgt.collect())


def test_scd2_duplicate_key_source_keeps_one_current(spark):
    """A source batch with two rows for the same business key must
    produce exactly one new current row (greatest compare tuple wins)."""
    from bikes_data_warehouse_etl_spark.operators.merge import scd2_merge

    tgt = spark.createDataFrame(
        [(1, "old", 1, "2001-01-01 00:00:00", "9999-12-31 00:00:00")],
        "k long, attr string, current_flag long, effective_timestamp string, expire_timestamp string",
    ).selectExpr(
        "k",
        "attr",
        "current_flag",
        "cast(effective_timestamp as timestamp) effective_timestamp",
        "cast(expire_timestamp as timestamp) expire_timestamp",
    )
    src = spark.createDataFrame(
        [(1, "newer"), (1, "newest"), (2, "brand")], "k long, attr string"
    )
    out = scd2_merge(tgt, src, ["k"], ["attr"], run_ts="2002-01-01 00:00:00")
    cur = {r["k"]: r["attr"] for r in out.filter("current_flag = 1").collect()}
    # exactly one current row per key; 'newest' > 'newer' lexicographically
    assert cur == {1: "newest", 2: "brand"}
    per_key = (
        out.filter("current_flag = 1").groupBy("k").count().select("count").collect()
    )
    assert all(r["count"] == 1 for r in per_key)


def test_sequential_ids_match_global_window(spark):
    """Range-partitioned numbering must be bit-identical to the
    unpartitioned Window.orderBy formulation."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window
    from bikes_data_warehouse_etl_spark.operators.merge import _sequential_ids

    df = spark.range(0, 10_000).select(
        (F.col("id") * 2654435761 % 1_000_003).alias("k")
    ).distinct()
    got = {r["k"]: r["seq"] for r in _sequential_ids(df, ["k"], "seq", 16).collect()}
    want = {
        r["k"]: r["seq"]
        for r in df.withColumn("seq", F.row_number().over(Window.orderBy("k")))
        .collect()
    }
    assert got == want


def test_sequential_ids_no_single_partition_exchange(spark):
    """The surrogate path must not contain an Exchange SinglePartition
    feeding the numbering window."""
    import pyspark.sql.functions as F
    from bikes_data_warehouse_etl_spark.operators.merge import _sequential_ids

    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    plan = (
        _sequential_ids(df, ["k"], "seq")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the only SinglePartition allowed is the <=64-row offsets side
    lines = [ln for ln in plan.splitlines() if "Exchange SinglePartition" in ln]
    assert len(lines) <= 1


def test_scd1_merge_dedups_duplicate_key_batches(spark):
    """A source batch with two rows for one key must land EXACTLY one
    row in the target (PK invariant) — chosen deterministically
    (greatest non-key tuple), not both."""
    from bikes_data_warehouse_etl_spark.operators.merge import scd1_merge

    tgt = spark.createDataFrame([(1, "old")], "k long, v string")
    src = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "x"), (2, "w")], "k long, v string"
    )
    out = scd1_merge(tgt, src, ["k"]).collect()
    rows = {r["k"]: r["v"] for r in out}
    assert len(out) == 2  # one row per key — no duplicate PKs
    assert rows == {1: "b", 2: "x"}  # greatest non-key tuple wins


def test_scd2_merge_rejects_uncovered_target_columns(spark):
    """Target attributes outside keys+compare_cols+SCD bookkeeping
    would be unresolvable when building new version rows — must fail
    up front with the constraint spelled out, not UNRESOLVED_COLUMN
    from inside the plan."""
    import pytest

    from bikes_data_warehouse_etl_spark.operators.merge import scd2_merge

    tgt = spark.createDataFrame(
        [(1, "n", "a", 1, "2020-01-01 00:00:00", None)],
        "k long, name string, addr string, current_flag long, "
        "effective_timestamp string, expire_timestamp string",
    )
    src = spark.createDataFrame([(1, "n2")], "k long, name string")
    with pytest.raises(ValueError, match="addr"):
        scd2_merge(tgt, src, ["k"], ["name"], run_ts="2024-01-01 00:00:00")
