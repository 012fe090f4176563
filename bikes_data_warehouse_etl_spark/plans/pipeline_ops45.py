"""Round-4 batch 45: exact sliding-window COUNT DISTINCT via the
interval-merge +1/−1 sweep, and Kendall rank correlation of the daily
revenue series.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.plans.pipeline_ops29 import (
    _sdiv_expr,
    _sdiv_sql,
)
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Exact trailing-7-day distinct users per day (interval sweep)
# ---------------------------------------------------------------------------
_RD_W = 7  # window length in days: user counts at t iff active in [t-6, t]

_SQL_ROLLING_DISTINCT = f"""
    WITH act AS (
        SELECT DISTINCT user_id,
               CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS BIGINT) AS day
        FROM events),
    b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM act),
    spine AS (
        SELECT CAST(UNNEST(generate_series(
                   (SELECT lo FROM b), (SELECT hi FROM b))) AS BIGINT)
            AS day)
    SELECT s.day AS day,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active_7d
    FROM spine s
    LEFT JOIN act a ON a.day BETWEEN s.day - {_RD_W - 1} AND s.day
    GROUP BY 1
    """


@_q("rolling_distinct_users", _SQL_ROLLING_DISTINCT)
def q_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING-WINDOW COUNT DISTINCT, exactly: for every calendar day,
    the number of distinct users active in the trailing 7 days — the
    DAU/WAU-style metric that naive SQL can only express as a range
    join re-counting every window from scratch (which IS the oracle).
    The Spark plan instead MERGES each user's activity days into
    covered intervals (consecutive activities ≤7 days apart extend one
    coverage run; a user's run [first, last+6] contributes +1 at its
    start and −1 after its end) and prefix-sums the deltas — each user
    is processed ONCE regardless of window length, turning an
    O(days × users) recount into one per-user window pass plus a
    calendar-domain sweep. The same sweep that powers
    `active_orders_daily`, upgraded from interval endpoints to
    DISTINCT-entity semantics via interval merging.

    Scale: the (user, day) grid dedups map-side; the island window
    partitions by user (parallel, per-partition rows = user's active
    days); delta rows are ≤2 per island; the final prefix sum runs on
    the CALENDAR domain (bounded, single partition by construction —
    same contract as `theil_sen_trend`). Any window length W changes
    only the merge constant, not the shape.
    """
    act = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("day"),
        )
        .distinct()
    )
    uw = Window.partitionBy("user_id").orderBy("day")
    isl = act.select(
        "user_id",
        "day",
        F.when(
            F.col("day") - F.lag("day").over(uw) > _RD_W, F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("brk"),
    ).select(
        "user_id",
        "day",
        F.sum("brk").over(uw).alias("island"),
    )
    runs = isl.groupBy("user_id", "island").agg(
        F.min("day").alias("start"),
        (F.max("day") + F.lit(_RD_W - 1)).alias("end"),
    )
    deltas = runs.select(
        F.col("start").alias("day"), F.lit(1).cast("long").alias("d")
    ).unionAll(
        runs.select(
            (F.col("end") + 1).alias("day"), F.lit(-1).cast("long").alias("d")
        )
    )
    b = act.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = b.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day")
    )
    per_day = deltas.groupBy("day").agg(F.sum("d").cast("long").alias("d"))
    sw = Window.orderBy("day")
    return (
        spine.join(per_day, "day", "left")
        .select("day", F.coalesce(F.col("d"), F.lit(0)).alias("d"))
        .select(
            "day", F.sum("d").over(sw).cast("long").alias("n_active_7d")
        )
    )


# ---------------------------------------------------------------------------
# Kendall rank correlation (tau-a) of the daily revenue series
# ---------------------------------------------------------------------------
_SQL_KENDALL = f"""
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS BIGINT) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS cents
        FROM orders GROUP BY 1),
    pairs AS (
        SELECT CAST(SUM(CASE WHEN b.cents > a.cents THEN 1 ELSE 0 END)
                   AS BIGINT) AS conc,
               CAST(SUM(CASE WHEN b.cents < a.cents THEN 1 ELSE 0 END)
                   AS BIGINT) AS disc,
               CAST(SUM(CASE WHEN b.cents = a.cents THEN 1 ELSE 0 END)
                   AS BIGINT) AS ties,
               CAST(COUNT(*) AS BIGINT) AS n0
        FROM daily a JOIN daily b ON b.day > a.day)
    SELECT conc AS concordant, disc AS discordant, ties,
           CAST({_sdiv_sql("(conc - disc) * 1000", "n0")} AS BIGINT)
               AS kendall_tau_milli
    FROM pairs
    """


@_q("kendall_tau_daily", _SQL_KENDALL)
def q_kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KENDALL'S TAU of daily revenue against time: every ordered day
    pair classified concordant (later day earns more), discordant, or
    tied, with τ_a = (C − D)/n₀ in milli — the nonparametric trend
    test whose statistic IS `theil_sen_trend`'s sign structure
    (Theil–Sen takes the median slope; Mann-Kendall sums their signs)
    and the pair-counting sibling of `rank_corr_len_richness`
    (Spearman). All-integer, no ranks needed since days are distinct.

    Scale: the pair join runs on the DAILY census (calendar-bounded,
    ~2.4k rows → ~3M pairs row-locally classified and map-side
    summed), never on fact rows. At a 10⁶-point domain the O(n²)
    pair join yields to the O(n log n) inversion-count (merge-sort or
    BIT over the value ranks) — the documented upgrade, same output.
    """
    daily = (
        _t(spark, sf_dir, "orders")
        .select(
            F.datediff(
                F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("day"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c"),
        )
        .groupBy("day")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    a = daily.select(F.col("day").alias("da"), F.col("cents").alias("ca"))
    bb = daily.select(F.col("day").alias("db"), F.col("cents").alias("cb"))
    pairs = a.join(bb, F.col("db") > F.col("da")).agg(
        F.sum((F.col("cb") > F.col("ca")).cast("long"))
        .cast("long")
        .alias("conc"),
        F.sum((F.col("cb") < F.col("ca")).cast("long"))
        .cast("long")
        .alias("disc"),
        F.sum((F.col("cb") == F.col("ca")).cast("long"))
        .cast("long")
        .alias("ties"),
        F.count(F.lit(1)).cast("long").alias("n0"),
    )
    return pairs.select(
        F.col("conc").alias("concordant"),
        F.col("disc").alias("discordant"),
        "ties",
        F.expr(
            "CAST(" + _sdiv_expr("(conc - disc) * 1000", "n0") + " AS BIGINT)"
        ).alias("kendall_tau_milli"),
    )
