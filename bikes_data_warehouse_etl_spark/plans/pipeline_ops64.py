"""Round-4 batch 64: whale-persistence concentration risk, maximum
drawdown of cumulative net revenue, and daily growth streaks.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Whale persistence: last year's top decile in this year's revenue
# ---------------------------------------------------------------------------
_SQL_WHALES = """
    WITH spend AS (
        SELECT o_custkey,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS cents
        FROM orders
        WHERE EXTRACT(YEAR FROM o_orderdate) IN (2000, 2001)
        GROUP BY 1, 2),
    d0 AS (
        SELECT o_custkey,
               NTILE(10) OVER (ORDER BY cents DESC, o_custkey) AS dec0
        FROM spend WHERE yr = 2000),
    y1 AS (
        SELECT o_custkey, cents FROM spend WHERE yr = 2001),
    t AS (
        SELECT CAST(SUM(y1.cents) AS BIGINT) AS total_cents,
               CAST(SUM(CASE WHEN d0.dec0 = 1 THEN y1.cents ELSE 0 END)
                   AS BIGINT) AS whale_cents,
               CAST(SUM(CASE WHEN d0.dec0 = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_returning_whales,
               CAST(COUNT(*) AS BIGINT) AS n_customers_2001
        FROM y1 LEFT JOIN d0 ON y1.o_custkey = d0.o_custkey)
    SELECT total_cents, whale_cents, n_returning_whales,
           n_customers_2001,
           CAST(whale_cents * 10000 // total_cents AS BIGINT)
               AS whale_share_bp
    FROM t
    """


@_q("whale_persistence", _SQL_WHALES)
def q_whale_persistence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHALE PERSISTENCE: the share of THIS year's revenue carried by
    customers who were already top-decile LAST year — the
    concentration-risk number a board actually asks for ("how much
    of 2001 hangs on the accounts we already depended on in 2000?").
    High persistence means `lorenz_deciles`' inequality is STICKY
    (a stable whale pod: account-management risk); low persistence
    with equal inequality means churn-and-replace whales (acquisition
    risk) — the same Gini, opposite remedies. `segment_migration`
    gives the full matrix; this is the one cell × revenue weighting
    that prices it.

    Scale: year-filtered customer censuses; the 2000 decile is one
    customer-domain NTILE (histogram-rank upgrade documented at
    `rfm_segments`); the join is customer-grain to customer-grain.
    One 1-row rollup.
    """
    spend = (
        _t(spark, sf_dir, "orders")
        .where(F.year("o_orderdate").isin(2000, 2001))
        .groupBy(
            "o_custkey", F.year("o_orderdate").cast("long").alias("yr")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    d0 = spend.where(F.col("yr") == 2000).select(
        F.col("o_custkey").alias("ck0"),
        F.ntile(10)
        .over(Window.orderBy(F.col("cents").desc(), "o_custkey"))
        .alias("dec0"),
    )
    y1 = spend.where(F.col("yr") == 2001).select("o_custkey", "cents")
    t = y1.join(d0, y1.o_custkey == d0.ck0, "left").agg(
        F.sum("cents").cast("long").alias("total_cents"),
        F.sum(F.when(F.col("dec0") == 1, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("whale_cents"),
        F.sum((F.col("dec0") == 1).cast("long"))
        .cast("long")
        .alias("n_returning_whales"),
        F.count(F.lit(1)).cast("long").alias("n_customers_2001"),
    )
    return t.selectExpr(
        "total_cents",
        "whale_cents",
        "n_returning_whales",
        "n_customers_2001",
        "CAST(whale_cents * 10000 div total_cents AS BIGINT)"
        " AS whale_share_bp",
    )


# ---------------------------------------------------------------------------
# Maximum drawdown of cumulative net revenue vs trend
# ---------------------------------------------------------------------------
_SQL_DRAWDOWN = """
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS BIGINT) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice, 0) AS BIGINT)) // 1000
                   AS BIGINT) AS kd
        FROM orders GROUP BY 1),
    m AS (
        SELECT CAST(SUM(kd) // COUNT(*) AS BIGINT) AS mean_kd FROM daily),
    cum AS (
        SELECT day,
               CAST(SUM(kd - (SELECT mean_kd FROM m))
                    OVER (ORDER BY day) AS BIGINT) AS c
        FROM daily),
    dd AS (
        SELECT day, c,
               CAST(MAX(c) OVER (ORDER BY day) - c AS BIGINT) AS drawdown
        FROM cum)
    SELECT CAST(MAX(drawdown) AS BIGINT) AS max_drawdown_kd,
           CAST(MIN(CASE WHEN drawdown = (SELECT MAX(drawdown) FROM dd)
                         THEN day END) AS BIGINT) AS trough_day,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM dd
    """


@_q("max_drawdown", _SQL_DRAWDOWN)
def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMUM DRAWDOWN of demeaned cumulative daily revenue: the
    deepest running-peak-to-trough fall of the cumulative series
    (demeaned so the drawdown measures the worst SUSTAINED shortfall
    against trend rather than being zeroed by growth) — the finance
    risk statistic repurposed as "what's the worst slump this revenue
    stream ever sustained, and when did it bottom?". Kin to
    `cusum_change_detection` (same prefix-sum-minus-running-extreme
    algebra — CUSUM alarms ONLINE, drawdown summarizes the history)
    and the mirror image of `inventory_clamped_balance`'s reflection.

    Scale: one cumulative + one running-max window over the
    calendar-bounded census (single-partition-by-construction
    contract of `theil_sen_trend`), then a 1-row reduction; the
    trough locator re-reads the same 2.4k-row frame.
    """
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(
                F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("day")
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(ROUND(o_totalprice, 0) AS BIGINT))"
                " div 1000 AS BIGINT)"
            ).alias("kd")
        )
    )
    m = daily.agg(
        F.expr("CAST(SUM(kd) div COUNT(*) AS BIGINT)").alias("mean_kd")
    )
    w = Window.orderBy("day")
    cum = (
        daily.crossJoin(F.broadcast(m))
        .select(
            "day",
            F.sum(F.col("kd") - F.col("mean_kd"))
            .over(w)
            .cast("long")
            .alias("c"),
        )
    )
    dd = cum.select(
        "day",
        (F.max("c").over(w) - F.col("c")).cast("long").alias("drawdown"),
    )
    mx = dd.agg(F.max("drawdown").cast("long").alias("mdd"))
    return (
        dd.crossJoin(F.broadcast(mx))
        .agg(
            F.max("drawdown").cast("long").alias("max_drawdown_kd"),
            F.min(
                F.when(F.col("drawdown") == F.col("mdd"), F.col("day"))
            )
            .cast("long")
            .alias("trough_day"),
            F.count(F.lit(1)).cast("long").alias("n_days"),
        )
    )


# ---------------------------------------------------------------------------
# Daily growth streaks
# ---------------------------------------------------------------------------
_SQL_GROWTH_STREAKS = """
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS BIGINT) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS cents
        FROM orders GROUP BY 1),
    diffs AS (
        SELECT day, cents,
               CASE WHEN cents > LAG(cents) OVER (ORDER BY day)
                    THEN 1 ELSE 0 END AS up,
               ROW_NUMBER() OVER (ORDER BY day) AS rn
        FROM daily),
    isl AS (
        SELECT up, rn - ROW_NUMBER() OVER (PARTITION BY up ORDER BY rn)
                   AS island
        FROM diffs),
    runs AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS len
        FROM isl WHERE up = 1 GROUP BY island)
    SELECT CAST(MAX(len) AS BIGINT) AS longest_up_streak_days,
           CAST(COUNT(*) AS BIGINT) AS n_up_streaks,
           CAST(SUM(len) AS BIGINT) AS n_up_days
    FROM runs
    """


@_q("growth_streaks", _SQL_GROWTH_STREAKS)
def q_growth_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROWTH STREAKS: the longest run of consecutive revenue-up days,
    plus the up-streak census — the momentum readout whose expected
    maximum under a random walk is only ~log₂(n) days, so a streak
    far beyond that is trend evidence the narrative-hungry can cite
    while `runs_test_daily` (same islands machinery, two-sided)
    supplies the formal verdict. Gaps-and-islands on the SIGN of the
    daily diff (`order_streaks`' pattern on a derived boolean).

    Scale: one lag + two rank windows over the bounded day census,
    then an islands rollup — identical cost profile to
    `runs_test_daily`; the daily census is the only fact-scale work.
    """
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(
                F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("day")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.orderBy("day")
    diffs = daily.select(
        "day",
        F.when(F.col("cents") > F.lag("cents").over(w), 1)
        .otherwise(0)
        .alias("up"),
        F.row_number().over(w).alias("rn"),
    )
    isl = diffs.select(
        "up",
        (
            F.col("rn")
            - F.row_number().over(Window.partitionBy("up").orderBy("rn"))
        ).alias("island"),
    )
    runs = (
        isl.where(F.col("up") == 1)
        .groupBy("island")
        .agg(F.count(F.lit(1)).cast("long").alias("len"))
    )
    return runs.agg(
        F.max("len").cast("long").alias("longest_up_streak_days"),
        F.count(F.lit(1)).cast("long").alias("n_up_streaks"),
        F.sum("len").cast("long").alias("n_up_days"),
    )
