"""Round-4 batch 38: changepoint location and 2×2 effect size — binary
segmentation for the revenue series and the promo-return odds ratio.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Binary segmentation: the single best split of the daily series
# ---------------------------------------------------------------------------
_BS_MIN_SEG = 8

_SQL_BINSEG = f"""
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS BIGINT) AS day,
               CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) // 1000
                   AS BIGINT) AS kd
        FROM orders GROUP BY 1),
    pre AS (
        SELECT day, kd,
               CAST(SUM(kd) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS BIGINT) AS sl,
               CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS nl,
               (SELECT CAST(SUM(kd) AS BIGINT) FROM daily) AS s,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n
        FROM daily),
    scored AS (
        SELECT day, nl, n - nl AS nr, sl, s - sl AS sr,
               CAST(sl AS HUGEINT) * sl // nl
               + CAST(s - sl AS HUGEINT) * (s - sl) // (n - nl)
               - CAST(s AS HUGEINT) * s // n AS gain
        FROM pre
        WHERE nl >= {_BS_MIN_SEG} AND n - nl >= {_BS_MIN_SEG})
    SELECT day AS split_day, nl AS n_left, nr AS n_right,
           CAST(sl // nl AS BIGINT) AS mean_left_kd,
           CAST(sr // nr AS BIGINT) AS mean_right_kd,
           CAST(gain AS BIGINT) AS ssb_gain
    FROM scored
    ORDER BY gain DESC, day LIMIT 1
    """


@_q("changepoint_binseg", _SQL_BINSEG)
def q_changepoint_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BINARY SEGMENTATION changepoint locator: the single split of
    the daily revenue series that maximizes the between-segments sum
    of squares S_L²/n_L + S_R²/n_R − S²/n (equivalently, minimizes
    within-segment variance) with both segments ≥ 8 days —
    `cusum_change_detection` ALARMS on a shift; this says WHERE the
    level change most plausibly happened, and recursing on each side
    (the CC driver-loop pattern) yields the full multi-changepoint
    segmentation. Scores are integer (floor divisions per candidate;
    the argmax is tie-broken to the earliest day), so both engines
    pick the identical split.

    Scale: every candidate's score comes from ONE prefix-sum window
    over the calendar-bounded day domain — O(days) candidates scored
    in one pass, no per-candidate scan; the fact table is touched
    only by the daily rollup. int64 holds the prefix sums themselves;
    the S_L²/S_R² PRODUCTS in the gain left int64 at sf10's revenue
    volume (sweep-caught: two ~5e18 terms sum past 9.2e18), so the
    gain is formed in 128-bit exact arithmetic (HUGEINT /
    decimal(38,0)) and only the final gain (≤ S²/n ≈ 2e15) returns to
    int64 — headroom to ~1e19 total kilodollars, far past 100 TB.
    """
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("day")
        )
        .agg(
            F.expr(
                "CAST(sum(CAST(floor(o_totalprice) AS LONG)) div 1000 AS LONG)"
            ).alias("kd")
        )
    )
    tot = daily.agg(
        F.sum("kd").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    pre = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        "s",
        "n",
        F.sum("kd").over(w).cast("long").alias("sl"),
        F.row_number().over(Window.orderBy("day")).cast("long").alias("nl"),
    )
    scored = pre.where(
        (F.col("nl") >= _BS_MIN_SEG) & (F.col("n") - F.col("nl") >= _BS_MIN_SEG)
    ).select(
        "day",
        "nl",
        (F.col("n") - F.col("nl")).alias("nr"),
        "sl",
        (F.col("s") - F.col("sl")).alias("sr"),
        F.expr(
            "cast(sl as decimal(38,0)) * sl div nl"
            " + cast(s - sl as decimal(38,0)) * (s - sl) div (n - nl)"
            " - cast(s as decimal(38,0)) * s div n"
        ).alias("gain"),
    )
    return (
        scored.orderBy(F.col("gain").desc(), "day")
        .limit(1)
        .select(
            F.col("day").alias("split_day"),
            F.col("nl").alias("n_left"),
            F.col("nr").alias("n_right"),
            F.expr("sl div nl").cast("long").alias("mean_left_kd"),
            F.expr("sr div nr").cast("long").alias("mean_right_kd"),
            F.col("gain").cast("long").alias("ssb_gain"),
        )
    )


# ---------------------------------------------------------------------------
# Odds ratio: promo parts vs returned lineitems (2x2 effect size)
# ---------------------------------------------------------------------------
_SQL_ODDS_RATIO = """
    WITH cells AS (
        SELECT CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS promo,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
        FROM lineitem JOIN part ON l_partkey = p_partkey),
    t AS (
        SELECT CAST(SUM(promo * ret) AS BIGINT) AS a,
               CAST(SUM(promo * (1 - ret)) AS BIGINT) AS b,
               CAST(SUM((1 - promo) * ret) AS BIGINT) AS c,
               CAST(SUM((1 - promo) * (1 - ret)) AS BIGINT) AS d
        FROM cells)
    SELECT a AS n_promo_returned, b AS n_promo_kept,
           c AS n_other_returned, d AS n_other_kept,
           CAST(a * d * 1000 // GREATEST(b * c, 1) AS BIGINT)
               AS odds_ratio_milli,
           CAST(a * (c + d) * 10000 // GREATEST(c * (a + b), 1) AS BIGINT)
               AS relative_risk_bp
    FROM t
    """


@_q("odds_ratio_promo_return", _SQL_ODDS_RATIO)
def q_odds_ratio_promo_return(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2×2 EFFECT SIZE: are PROMO-type parts returned at different
    odds than other parts? Odds ratio a·d/(b·c) in milli and relative
    risk in bp over the (promo, returned) contingency —
    `independence_tvd` measures whether two dims associate at all;
    the OR/RR pair quantifies the DIRECTION and STRENGTH for the one
    2×2 question a merchandiser actually asks. Both are
    amplify-then-divide integers.

    Scale: one fact scan with the part dim broadcast (the `promo_
    revenue_share` join shape), four counts in one map-side-combined
    aggregate — the 2×2 sufficient statistics merge across shards by
    addition. int64: a·d caps at ~(N/2)² — pre-divide all four cells
    by 10 beyond ~6e9 lineitems (both ratios are cell-scale
    invariant).
    """
    cells = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_returnflag")
        .join(
            _t(spark, sf_dir, "part").select("p_partkey", "p_type"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            F.col("p_type").startswith("PROMO").cast("long").alias("promo"),
            (F.col("l_returnflag") == "R").cast("long").alias("ret"),
        )
    )
    t = cells.agg(
        F.sum(F.col("promo") * F.col("ret")).cast("long").alias("a"),
        F.sum(F.col("promo") * (1 - F.col("ret"))).cast("long").alias("b"),
        F.sum((1 - F.col("promo")) * F.col("ret")).cast("long").alias("c"),
        F.sum((1 - F.col("promo")) * (1 - F.col("ret"))).cast("long").alias("d"),
    )
    return t.select(
        F.col("a").alias("n_promo_returned"),
        F.col("b").alias("n_promo_kept"),
        F.col("c").alias("n_other_returned"),
        F.col("d").alias("n_other_kept"),
        F.expr("a * d * 1000 div GREATEST(b * c, 1)")
        .cast("long")
        .alias("odds_ratio_milli"),
        F.expr("a * (c + d) * 10000 div GREATEST(c * (a + b), 1)")
        .cast("long")
        .alias("relative_risk_bp"),
    )
