"""Round-4 batch 24: training-mixture re-weighting and the calendar
activity profile.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Mixture re-weighting: per-source sampling weights toward a target mix
# ---------------------------------------------------------------------------
_SQL_MIXTURE_WEIGHTS = """
    WITH per AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM documents GROUP BY 1),
    tot AS (
        SELECT CAST(SUM(n_chars) AS BIGINT) AS t,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM per)
    SELECT source, n_docs, n_chars,
           CAST(n_chars * 10000 // (SELECT t FROM tot) AS BIGINT)
               AS actual_bp,
           CAST(10000 // (SELECT k FROM tot) AS BIGINT) AS target_bp,
           CAST((SELECT t FROM tot) * 1000000
               // ((SELECT k FROM tot) * n_chars) AS BIGINT) AS weight_ppm
    FROM per
    """


@_q("mixture_weights", _SQL_MIXTURE_WEIGHTS)
def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture re-weighting: per-source char share vs a
    UNIFORM target mix, and the sampling weight (ppm of 1.0) that
    achieves it — weight = target_share / actual_share, so a source at
    2x its target weighs 500000 ppm (sample half) and a rare source
    weighs above 1e6 (upsample / repeat-epoch). This is the sizing
    table `source_rebalance_sample` executes and `source_quota_cap`
    hard-caps; the uniform target is the conventional default — any
    target vector substitutes by replacing the k-divide.

    Scale: one map-side-combined per-source aggregate (|sources| rows);
    the two scalars broadcast back. Integer division throughout —
    weights are floor-ppm, and the downstream sampler consumes them as
    integer thresholds against a 64-bit hash (`train_split_assign`
    form), so no float probability ever exists end-to-end.
    """
    per = _t(spark, sf_dir, "documents").groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )
    tot = per.agg(
        F.sum("n_chars").cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    return per.join(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_chars",
        F.expr("n_chars * 10000 div t").cast("long").alias("actual_bp"),
        F.expr("10000 div k").cast("long").alias("target_bp"),
        F.expr("t * 1000000 div (k * n_chars)").cast("long").alias("weight_ppm"),
    )


# ---------------------------------------------------------------------------
# Calendar profile: day-of-week x hour activity heatmap
# ---------------------------------------------------------------------------
_SQL_DOW_HOUR = """
    WITH e AS (
        SELECT CAST(dayofweek(ts) AS BIGINT) AS dow_sun0,
               CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr,
               CASE WHEN event_type = 'purchase'
                    THEN CAST(ROUND(value * 100, 0) AS BIGINT)
                    ELSE 0 END AS p_cents
        FROM events),
    per AS (
        SELECT dow_sun0, hr,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(p_cents) AS BIGINT) AS purchase_cents
        FROM e GROUP BY 1, 2),
    tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS t FROM per)
    SELECT dow_sun0, hr, n_events, purchase_cents,
           CAST(n_events * 10000 // (SELECT t FROM tot) AS BIGINT) AS share_bp
    FROM per
    """


@_q("dow_hour_heatmap", _SQL_DOW_HOUR)
def q_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar activity heatmap: event counts, purchase value, and
    traffic share for each (day-of-week x hour-of-day) cell — the 168-
    cell profile capacity planning and anomaly baselining read first
    (`daily_anomaly_flags` flags WHEN something broke; this shows the
    weekly shape it broke against). Day-of-week convention pinned to
    0=Sunday: DuckDB's dayofweek is already 0=Sunday while Spark's
    dayofweek is 1=Sunday, so the Spark side subtracts 1 — the same
    off-by-one `functions/datetime_fns.py` documents for the
    reference's SQL-Server calendar.

    Scale: one scan into a 168-key aggregate — map-side combine leaves
    nothing on the wire; the share total broadcasts back. Constant
    output size at any volume; the UTC session timezone (session.py)
    makes the hour extraction deterministic.
    """
    e = _t(spark, sf_dir, "events").select(
        (F.dayofweek("ts") - 1).cast("long").alias("dow_sun0"),
        F.hour("ts").cast("long").alias("hr"),
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 100, 0).cast("long"),
        )
        .otherwise(0)
        .alias("p_cents"),
    )
    per = e.groupBy("dow_sun0", "hr").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("p_cents").cast("long").alias("purchase_cents"),
    )
    tot = per.agg(F.sum("n_events").alias("t"))
    return per.join(F.broadcast(tot)).select(
        "dow_sun0",
        "hr",
        "n_events",
        "purchase_cents",
        F.expr("n_events * 10000 div t").cast("long").alias("share_bp"),
    )
