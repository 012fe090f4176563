"""Behavior tests for plans/pipeline_ops18.py (session quality, A/B
readout, hierarchy shares, cohort LTV, mix shift). The DuckDB-oracle
gate covers equality; these pin cross-query consistency and integer
invariants."""

from __future__ import annotations

import pandas as pd

from bikes_data_warehouse_etl_spark.plans import QUERIES


def _run(spark, sf_dir, name: str) -> pd.DataFrame:
    return QUERIES[name].spark(spark, sf_dir).toPandas()


def test_session_quality_consistent_with_sessionize(spark, sf_dir):
    """Same 30-min gap definition → same session population."""
    sq = _run(spark, sf_dir, "session_quality").iloc[0]
    sess = _run(spark, sf_dir, "events_sessionize")
    assert sq["n_sessions"] == len(sess)
    assert sq["n_bounce"] == int((sess["n_events"] == 1).sum())
    assert sq["bounce_bp"] == sq["n_bounce"] * 10000 // sq["n_sessions"]
    # median read off the histogram == pandas lower median of durations
    d = sess["duration_s"].sort_values().reset_index(drop=True)
    n = len(d)
    assert sq["med_duration_s"] == int(d.iloc[(n + n % 2 + 1) // 2 - 1])


def test_ab_readout_partitions_users(spark, sf_dir):
    out = _run(spark, sf_dir, "ab_test_readout")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    assert out["n_users"].sum() == ev["user_id"].nunique()
    assert (out["n_converters"] <= out["n_users"]).all()
    assert (
        out["conversion_ppm"]
        == out["n_converters"] * 1_000_000 // out["n_users"]
    ).all()
    assert out["n_events"].sum() == len(ev)


def test_hierarchy_shares_sum_to_whole(spark, sf_dir):
    out = _run(spark, sf_dir, "hierarchy_share")
    # per-region nation shares: floor-div leaves < |nations| bp slack
    for region, grp in out.groupby("region"):
        assert 10000 - len(grp) < grp["share_of_region_bp"].sum() <= 10000
    # region shares of the grand total, deduped per region
    regions = out.drop_duplicates("region")
    assert 10000 - len(regions) < regions["region_share_bp"].sum() <= 10000


def test_cohort_ltv_monotone(spark, sf_dir):
    out = _run(spark, sf_dir, "cohort_ltv").sort_values(
        ["cohort_wk", "wk_offset"]
    )
    for _, grp in out.groupby("cohort_wk"):
        assert grp["cum_cents"].is_monotonic_increasing
        assert (
            grp["ltv_cents_per_user"] == grp["cum_cents"] // grp["n_users"]
        ).all()


def test_priority_mix_shift_shares(spark, sf_dir):
    out = _run(spark, sf_dir, "priority_mix_shift")
    for col in ("early_bp", "late_bp"):
        assert 10000 - len(out) < out[col].sum() <= 10000
    assert (out["abs_shift_bp"] == (out["late_bp"] - out["early_bp"]).abs()).all()


def test_session_windows_agree_on_subsecond_ties(spark):
    """Regression: the boundary marker orders by (ts, event_id) — raw
    microsecond timestamps — while gap math runs on floor-second es.
    When two events share a floor second but their event_id order
    opposes their ts order, BOTH windows must still use the same (ts,
    event_id) order; an es-ordered cumsum would visit the rows in a
    different order than the marker was computed in and mis-group
    sessions."""
    import datetime as dt

    import pyspark.sql.functions as F
    from pyspark.sql import Window

    rows = [
        # user 1: B(id=2) at .100 precedes A(id=1) at .900 in ts order,
        # opposing event_id order; same floor second -> es tie
        (1, 2, dt.datetime(2024, 1, 1, 10, 0, 0, 100000)),
        (1, 1, dt.datetime(2024, 1, 1, 10, 0, 0, 900000)),
        # a later second event far enough to start a new session
        (1, 3, dt.datetime(2024, 1, 1, 11, 0, 0, 0)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    e = df.select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("es"), "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.withColumn(
        "is_new",
        F.when(
            F.lag("es").over(w).isNull()
            | (F.col("es") - F.lag("es").over(w) > 1800),
            1,
        ).otherwise(0),
    )
    ws = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = marked.withColumn("seq", F.sum("is_new").over(ws))
    per = sess.groupBy("user_id", "seq").count().collect()
    # exactly two sessions: {B, A} then {C} — the tie pair stays together
    assert sorted(r["count"] for r in per) == [1, 2]
