"""Round-4 batch 49: CUPED variance-reduced A/B readout, exact 1-D
Wasserstein distance between calendar eras, and autoregressive
coefficients of the daily revenue series.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.text import hash64
from bikes_data_warehouse_etl_spark.plans.extensions import _sql_hash64
from bikes_data_warehouse_etl_spark.plans.pipeline_ops29 import (
    _sdiv_expr,
    _sdiv_sql,
)
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# CUPED: covariate-adjusted A/B readout
# ---------------------------------------------------------------------------
_SQL_CUPED = f"""
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(SUM(CASE WHEN EXTRACT(YEAR FROM o_orderdate) = 2001
                             THEN CAST(ROUND(o_totalprice, 0) AS BIGINT)
                             ELSE 0 END) // 1000 AS BIGINT) AS y,
               CAST(SUM(CASE WHEN EXTRACT(YEAR FROM o_orderdate) = 2000
                             THEN CAST(ROUND(o_totalprice, 0) AS BIGINT)
                             ELSE 0 END) // 1000 AS BIGINT) AS x,
               ({_sql_hash64("CAST(o_custkey AS VARCHAR)")}) & 1 AS arm
        FROM orders GROUP BY 1),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM per_cust),
    theta AS (
        SELECT CAST({_sdiv_sql("(n * sxy - sx * sy) * 1000",
                               "GREATEST(n * sxx - sx * sx, 1)")}
                   AS BIGINT) AS th_milli
        FROM s),
    arms AS (
        SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x) AS BIGINT) AS sx
        FROM per_cust GROUP BY 1),
    wide AS (
        SELECT MAX(CASE WHEN arm = 1 THEN sy END) AS sy1,
               MAX(CASE WHEN arm = 1 THEN sx END) AS sx1,
               MAX(CASE WHEN arm = 1 THEN n END) AS n1,
               MAX(CASE WHEN arm = 0 THEN sy END) AS sy0,
               MAX(CASE WHEN arm = 0 THEN sx END) AS sx0,
               MAX(CASE WHEN arm = 0 THEN n END) AS n0
        FROM arms)
    SELECT CAST({_sdiv_sql("sy1", "n1")} - {_sdiv_sql("sy0", "n0")}
               AS BIGINT) AS raw_diff_kdollars,
           CAST(({_sdiv_sql("sy1 * 1000", "n1")}
                 - {_sdiv_sql("sy0 * 1000", "n0")})
                - th_milli * ({_sdiv_sql("sx1", "n1")}
                              - {_sdiv_sql("sx0", "n0")}) AS BIGINT)
               AS cuped_diff_milli_kdollars,
           th_milli AS theta_milli
    FROM wide, theta
    """


@_q("cuped_adjusted_ab", _SQL_CUPED)
def q_cuped_adjusted_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (controlled-experiment using pre-existing data): the A/B
    gap in 2001 customer spend, variance-reduced by regressing out
    each customer's 2000 spend — adjusted Δ = Δy − θ·Δx with θ the
    pooled OLS slope of outcome on covariate. Because pre-period
    spend is unaffected by treatment, subtracting θ·x shifts nothing
    in expectation but removes the covariate's share of the variance
    — the standard trick that cuts experiment runtimes 30-50%.
    Arms assigned by the portable hash bit (`permutation_test_
    priority`'s coin), so the readout is reproducible anywhere.
    `ab_test_readout` reports the raw contrast; this is its
    production upgrade.

    Scale: one orders pass to a customer-keyed census (map-side
    conditional sums), then five mergeable sums for θ and four per
    arm — all 1-row broadcasts, no second data pass. Dollar-floored
    to keep n·Σxy inside int64 at sf1 (the `daily_anomaly_flags`
    rule); kilodollars at 100× that.
    """
    per_cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.when(
                    F.year("o_orderdate") == 2001,
                    F.round(F.col("o_totalprice"), 0).cast("long"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("ysum"),
            F.sum(
                F.when(
                    F.year("o_orderdate") == 2000,
                    F.round(F.col("o_totalprice"), 0).cast("long"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("xsum"),
        )
        .select(
            "o_custkey",
            F.expr("ysum div 1000").cast("long").alias("y"),
            F.expr("xsum div 1000").cast("long").alias("x"),
        )
        .select(
            "x",
            "y",
            (hash64(F.col("o_custkey").cast("string")) % 2).alias("arm"),
        )
    )
    s = per_cust.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    theta = s.select(
        F.expr(
            "CAST("
            + _sdiv_expr(
                "(n * sxy - sx * sy) * 1000",
                "GREATEST(n * sxx - sx * sx, 1)",
            )
            + " AS BIGINT)"
        ).alias("th_milli")
    )
    arms = per_cust.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("x").cast("long").alias("sx"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 1, F.col("sy"))).alias("sy1"),
        F.max(F.when(F.col("arm") == 1, F.col("sx"))).alias("sx1"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 0, F.col("sy"))).alias("sy0"),
        F.max(F.when(F.col("arm") == 0, F.col("sx"))).alias("sx0"),
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
    )
    return wide.crossJoin(F.broadcast(theta)).selectExpr(
        "CAST("
        + _sdiv_expr("sy1", "n1")
        + " - "
        + _sdiv_expr("sy0", "n0")
        + " AS BIGINT) AS raw_diff_kdollars",
        "CAST(("
        + _sdiv_expr("sy1 * 1000", "n1")
        + " - "
        + _sdiv_expr("sy0 * 1000", "n0")
        + ") - th_milli * ("
        + _sdiv_expr("sx1", "n1")
        + " - "
        + _sdiv_expr("sx0", "n0")
        + ") AS BIGINT) AS cuped_diff_milli_kdollars",
        "th_milli AS theta_milli",
    )


# ---------------------------------------------------------------------------
# Exact 1-D Wasserstein distance between calendar eras
# ---------------------------------------------------------------------------
_SQL_WASSERSTEIN = """
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS BIGINT) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) // 1000
                   AS BIGINT) AS kc
        FROM orders GROUP BY 1),
    split AS (
        SELECT kc, CASE WHEN rk * 2 <= nd THEN 0 ELSE 1 END AS era
        FROM (SELECT kc, ROW_NUMBER() OVER (ORDER BY day) AS rk,
                     COUNT(*) OVER () AS nd
              FROM daily)),
    tot AS (
        SELECT CAST(SUM(1 - era) AS BIGINT) AS nx,
               CAST(SUM(era) AS BIGINT) AS ny
        FROM split),
    grid AS (
        SELECT kc AS v,
               CAST(SUM(CASE WHEN era = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS cx0,
               CAST(SUM(era) AS BIGINT) AS cy0
        FROM split GROUP BY 1),
    cum AS (
        SELECT v,
               CAST(SUM(cx0) OVER (ORDER BY v) AS BIGINT) AS cx,
               CAST(SUM(cy0) OVER (ORDER BY v) AS BIGINT) AS cy,
               CAST(LEAD(v) OVER (ORDER BY v) - v AS BIGINT) AS dv
        FROM grid)
    SELECT CAST(SUM(abs(cum.cx * tot.ny - cum.cy * tot.nx) * cum.dv) * 1000
                // (tot.nx * tot.ny) AS BIGINT) AS w1_milli_kc,
           CAST(tot.nx AS BIGINT) AS n_early, CAST(tot.ny AS BIGINT)
               AS n_late
    FROM cum, tot
    WHERE cum.dv IS NOT NULL
    GROUP BY tot.nx, tot.ny
    """


@_q("wasserstein_drift", _SQL_WASSERSTEIN)
def q_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 1-D WASSERSTEIN (earth-mover) distance between the two
    calendar halves of daily revenue: ∫|F−G| over the value axis,
    computed on the merged value grid as Σ |cx·ny − cy·nx|·Δv /
    (nx·ny) in milli-kilocents — the AREA between the empirical CDFs,
    completing the repo's drift triptych: `ks_value_drift` is the
    CDFs' max gap (where), `energy_distance_eras` a kernel form
    (whether), W₁ the literal COST of morphing one distribution into
    the other (how much), which is why monitoring stacks prefer it as
    an alarm threshold with units.

    Scale: the value grid is the distinct-value census of the
    calendar-bounded daily table; one cumulative window over it (same
    single-partition bounded-domain contract as `theil_sen_trend`)
    and one mergeable sum. Cross-multiplied counts (cx·ny) keep the
    CDF comparison integer-exact — no per-engine float CDFs.
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
        .agg(F.expr("CAST(SUM(c) div 1000 AS BIGINT)").alias("kc"))
    )
    ranked = daily.select(
        "kc",
        F.row_number().over(Window.orderBy("day")).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nd"),
    )
    split = ranked.select(
        "kc",
        F.when(F.col("rk") * 2 <= F.col("nd"), 0).otherwise(1).alias("era"),
    )
    tot = split.agg(
        F.sum(1 - F.col("era")).cast("long").alias("nx"),
        F.sum("era").cast("long").alias("ny"),
    )
    grid = split.groupBy(F.col("kc").alias("v")).agg(
        F.sum((F.col("era") == 0).cast("long")).cast("long").alias("cx0"),
        F.sum("era").cast("long").alias("cy0"),
    )
    vw = Window.orderBy("v")
    cum = grid.select(
        "v",
        F.sum("cx0").over(vw).cast("long").alias("cx"),
        F.sum("cy0").over(vw).cast("long").alias("cy"),
        (F.lead("v").over(vw) - F.col("v")).cast("long").alias("dv"),
    ).where(F.col("dv").isNotNull())
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("nx", "ny")
        .agg(
            F.expr(
                "CAST(SUM(abs(cx * ny - cy * nx) * dv) * 1000"
                " div (nx * ny) AS BIGINT)"
            ).alias("w1_milli_kc")
        )
        .select(
            "w1_milli_kc",
            F.col("nx").alias("n_early"),
            F.col("ny").alias("n_late"),
        )
    )


# ---------------------------------------------------------------------------
# Autoregressive coefficients of daily revenue at lags 1 / 7 / 28
# ---------------------------------------------------------------------------
_AR_LAGS = (1, 7, 28)

_SQL_AR = f"""
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS BIGINT) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                    // 100000 AS BIGINT) AS kc
        FROM orders GROUP BY 1),
    lagged AS (
        SELECT t.lag, b.kc AS y, a.kc AS x
        FROM (SELECT UNNEST(ARRAY{list(_AR_LAGS)}) AS lag) t
        JOIN daily a ON TRUE
        JOIN daily b ON b.day = a.day + t.lag),
    s AS (
        SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM lagged GROUP BY 1)
    SELECT CAST(lag AS BIGINT) AS lag, n AS n_pairs,
           CAST({_sdiv_sql(
               "(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)"
               " * 1000",
               "GREATEST(CAST(n AS HUGEINT) * sxx"
               " - CAST(sx AS HUGEINT) * sx, 1)")} AS BIGINT)
               AS ar_slope_milli
    FROM s
    """


@_q("ar_coefficients", _SQL_AR)
def q_ar_coefficients(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR DIAGNOSTICS: the lag-1 / lag-7 / lag-28 autoregression
    slopes of daily revenue (regression of y_t on y_{t−ℓ}, slope in
    milli — the sqrt-free cousin of the autocorrelation function,
    identical sign and zero-crossing structure) — lag-1 measures
    momentum, lag-7 confirms the weekly cycle
    (`weekday_seasonality_strength`'s time-domain echo), lag-28 the
    monthly one; together the order-selection evidence an AR
    forecaster (`brown_double_smoothing`'s alternative) reads first.

    Scale: each lag is an equi-join of the calendar-bounded daily
    census against itself shifted by a constant — three bounded
    joins fanned from one ARRAY unnest, five mergeable sums per lag.
    Missing days simply produce no pair (documented: gaps thin
    n_pairs, never bias the sums). The slope's n·Σ products (and the
    ×1000 milli scale on the numerator) left int64 at sf10's daily
    kilocents (sweep-caught) — formed 128-bit (HUGEINT /
    decimal(38,0)), quotient back to int64.
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
        .agg(F.expr("CAST(SUM(c) div 100000 AS BIGINT)").alias("kc"))
    )
    lags = daily.sparkSession.createDataFrame(
        [(int(x),) for x in _AR_LAGS], "lag long"
    )
    a = daily.select(F.col("day").alias("ad"), F.col("kc").alias("x"))
    bb = daily.select(F.col("day").alias("bd"), F.col("kc").alias("y"))
    lagged = (
        a.crossJoin(F.broadcast(lags))
        .join(bb, F.col("bd") == F.col("ad") + F.col("lag"))
        .select("lag", "x", "y")
    )
    s = lagged.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    return s.select(
        F.col("lag").cast("long").alias("lag"),
        F.col("n").alias("n_pairs"),
        F.expr(
            "CAST("
            + _sdiv_expr(
                "(cast(n as decimal(38,0)) * sxy"
                " - cast(sx as decimal(38,0)) * sy) * 1000",
                "GREATEST(cast(n as decimal(38,0)) * sxx"
                " - cast(sx as decimal(38,0)) * sx, 1)",
            )
            + " AS BIGINT)"
        ).alias("ar_slope_milli"),
    )
