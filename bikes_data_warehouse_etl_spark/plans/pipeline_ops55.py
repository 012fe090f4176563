"""Round-4 batch 55: jackknife influence of each nation on the global
mean, ANOVA main-effect variance shares as factor importance, and a
Chebyshev concentration audit without square roots.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.plans.pipeline_ops29 import (
    _sdiv_expr,
    _sdiv_sql,
)
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Jackknife: leave-one-nation-out influence on mean order value
# ---------------------------------------------------------------------------
_SQL_JACKKNIFE = f"""
    WITH per_nation AS (
        SELECT cn.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice, 0) AS BIGINT)) AS BIGINT)
                   AS s
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        GROUP BY 1),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(s) AS BIGINT) AS ts
        FROM per_nation)
    SELECT nation, n AS n_orders,
           CAST(ts * 1000 // tn AS BIGINT) AS mean_milli_dollars,
           CAST((ts - s) * 1000 // (tn - n) AS BIGINT)
               AS mean_without_milli,
           CAST((ts - s) * 1000 // (tn - n) - ts * 1000 // tn AS BIGINT)
               AS influence_milli
    FROM per_nation, tot
    """


@_q("jackknife_nation_influence", _SQL_JACKKNIFE)
def q_jackknife_nation_influence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """JACKKNIFE INFLUENCE: the global mean order value recomputed
    with each nation DELETED — influence_milli is how far the
    leave-one-out mean moves, the classic robustness probe for "is
    this aggregate one segment's artifact?" (a single nation moving
    the mean 2% owns your dashboard; `poisson_bootstrap_ci` sizes
    sampling noise, the jackknife sizes SEGMENT dependence —
    complementary resampling lenses). Deletion needs no rescan: the
    leave-one-out mean is (ΣS − s_i)/(ΣN − n_i) from the same
    per-nation sums.

    Scale: one fact pass to the ≤25-nation sums; all 25 deletions are
    arithmetic on that census against the broadcast total. Leave-one-
    out over ANY bounded partition key (source, tenant, day) is this
    same shape — the sums are the sufficient statistic.
    """
    per_nation = (
        _t(spark, sf_dir, "orders")
        .join(
            _t(spark, sf_dir, "customer").select(
                    "c_custkey", "c_nationkey"
                ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").select(
                    "n_nationkey", F.col("n_name").alias("nation")
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("o_totalprice"), 0).cast("long"))
            .cast("long")
            .alias("s"),
        )
    )
    tot = per_nation.agg(
        F.sum("n").cast("long").alias("tn"),
        F.sum("s").cast("long").alias("ts"),
    )
    return per_nation.crossJoin(F.broadcast(tot)).selectExpr(
        "nation",
        "n AS n_orders",
        "CAST(ts * 1000 div tn AS BIGINT) AS mean_milli_dollars",
        "CAST((ts - s) * 1000 div (tn - n) AS BIGINT)"
        " AS mean_without_milli",
        "CAST((ts - s) * 1000 div (tn - n) - ts * 1000 div tn AS BIGINT)"
        " AS influence_milli",
    )


# ---------------------------------------------------------------------------
# ANOVA main-effect variance shares as factor importance
# ---------------------------------------------------------------------------
def _sql_eta2(group_expr: str, label: str) -> str:
    return f"""
        SELECT '{label}' AS factor,
               CAST(COUNT(*) AS BIGINT) AS n_levels,
               CAST(SUM(CAST(cnt AS HUGEINT) * ({_sdiv_sql("s * 1000", "cnt")}
                               - (SELECT {_sdiv_sql("SUM(s) * 1000",
                                                    "SUM(cnt)")}
                                  FROM g_{label}))
                         * ({_sdiv_sql("s * 1000", "cnt")}
                            - (SELECT {_sdiv_sql("SUM(s) * 1000",
                                                 "SUM(cnt)")}
                               FROM g_{label}))) // 1000000 AS BIGINT)
                   AS between_var_n
        FROM g_{label}"""


_SQL_MAIN_EFFECTS = f"""
    WITH obs AS (
        SELECT CAST(l_quantity AS BIGINT) AS q,
               CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS d,
               l_returnflag AS rf,
               CAST(ROUND(l_extendedprice, 0) AS BIGINT) // 1000 AS y
        FROM lineitem),
    g_qty AS (
        SELECT q AS lvl, CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(y) AS BIGINT) AS s
        FROM obs GROUP BY 1),
    g_disc AS (
        SELECT d AS lvl, CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(y) AS BIGINT) AS s
        FROM obs GROUP BY 1),
    g_flag AS (
        SELECT rf AS lvl, CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(y) AS BIGINT) AS s
        FROM obs GROUP BY 1),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM obs),
    tss AS (
        SELECT CAST({_sdiv_sql(
            "(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy)",
            "n")} AS BIGINT)
            AS total_var_n
        FROM tot),
    eff AS (
        {_sql_eta2("qty", "qty")}
        UNION ALL
        {_sql_eta2("disc", "disc")}
        UNION ALL
        {_sql_eta2("flag", "flag")})
    SELECT eff.factor, eff.n_levels,
           CAST(eff.between_var_n * 10000
                // GREATEST(tss.total_var_n, 1) AS BIGINT) AS eta2_bp
    FROM eff, tss
    """


@_q("main_effects_variance", _SQL_MAIN_EFFECTS)
def q_main_effects_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANOVA FACTOR IMPORTANCE: the share of line-price variance
    explained by each candidate factor alone — quantity levels,
    discount levels, return flag — as between-group/total η² in
    basis points, the model-free feature-importance ranking that
    belongs BEFORE anyone fits `ols2_cramer` (a factor at 50 bp is
    noise; don't give it a coefficient). Same η² machinery as
    `weekday_seasonality_strength`, generalized to a factor TABLE
    (quantity should dominate — price ≈ qty × unit price — which
    makes the ranking self-validating).

    Scale: each factor needs only its level census (bounded: 50 /
    11 / 3 levels) of mergeable (count, sum) pairs, all from one
    logical pass; the grand terms come from three global sums.
    Between-group variance is computed on level means in milli then
    de-scaled — identical truncation on both engines.
    """
    obs = _t(spark, sf_dir, "lineitem").selectExpr(
        "CAST(l_quantity AS BIGINT) AS q",
        "CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS d",
        "l_returnflag AS rf",
        "CAST(ROUND(l_extendedprice, 0) AS BIGINT) div 1000 AS y",
    )
    tot = obs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    tss = tot.select(
        F.expr(
            "CAST("
            + _sdiv_expr(
                "(cast(n as decimal(38,0)) * syy"
                " - cast(sy as decimal(38,0)) * sy)",
                "n",
            )
            + " AS BIGINT)"
        ).alias("total_var_n")
    )

    def eta(col: str, label: str) -> DataFrame:
        g = obs.groupBy(F.col(col).alias("lvl")).agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("y").cast("long").alias("s"),
        )
        gm = g.agg(
            F.expr(
                _sdiv_expr("SUM(s) * 1000", "SUM(cnt)")
            ).alias("grand_milli")
        )
        return (
            g.crossJoin(F.broadcast(gm))
            .select(
                F.lit(label).alias("factor"),
                F.expr(
                    "cast(cnt as decimal(38,0)) * ("
                    + _sdiv_expr("s * 1000", "cnt")
                    + " - grand_milli) * ("
                    + _sdiv_expr("s * 1000", "cnt")
                    + " - grand_milli)"
                ).alias("contrib"),
            )
            .groupBy("factor")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_levels"),
                F.expr("CAST(SUM(contrib) div 1000000 AS BIGINT)").alias(
                    "between_var_n"
                ),
            )
        )

    eff = (
        eta("q", "qty")
        .unionAll(eta("d", "disc"))
        .unionAll(eta("rf", "flag"))
    )
    return eff.crossJoin(F.broadcast(tss)).select(
        "factor",
        "n_levels",
        F.expr(
            "CAST(between_var_n * 10000 div GREATEST(total_var_n, 1)"
            " AS BIGINT)"
        ).alias("eta2_bp"),
    )


# ---------------------------------------------------------------------------
# Chebyshev concentration audit without square roots
# ---------------------------------------------------------------------------
_SQL_CHEBYSHEV = f"""
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS BIGINT) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice, 0) AS BIGINT)) // 1000
                   AS BIGINT) AS kd
        FROM orders GROUP BY 1),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(kd) AS BIGINT) AS sx,
               CAST(SUM(kd * kd) AS BIGINT) AS sxx
        FROM daily),
    ks AS (
        SELECT t.k FROM generate_series(2, 4) AS t(k)),
    hits AS (
        SELECT ks.k,
               CAST(SUM(CASE WHEN (CAST(d.kd AS HUGEINT) * s.n - s.sx)
                                  * (CAST(d.kd AS HUGEINT) * s.n - s.sx)
                                > CAST(ks.k * ks.k AS HUGEINT)
                                  * (CAST(s.n AS HUGEINT) * s.sxx
                                     - CAST(s.sx AS HUGEINT) * s.sx)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_out,
               CAST(MAX(s.n) AS BIGINT) AS n
        FROM daily d, s, ks
        GROUP BY 1)
    SELECT CAST(k AS BIGINT) AS k_sigma,
           CAST(n_out * 10000 // n AS BIGINT) AS observed_bp,
           CAST(10000 // (k * k) AS BIGINT) AS chebyshev_bound_bp
    FROM hits
    """


@_q("chebyshev_audit", _SQL_CHEBYSHEV)
def q_chebyshev_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHEBYSHEV CONCENTRATION AUDIT: the share of days whose revenue
    sits beyond k standard deviations (k = 2, 3, 4) against the
    distribution-free bound 1/k² — WITHOUT ever taking a square
    root: |x − μ| > kσ ⇔ (x·n − Σx)² > k²·(n·Σx² − (Σx)²), so the
    whole test is exact int64 arithmetic. Observed ≪ bound is
    normal-ish behavior (`daily_anomaly_flags`' z-thresholds are
    calibrated); observed NEAR the bound means heavy tails and every
    σ-based alert underestimates — the tail-sanity gate for the
    monitoring family.

    Scale: three sums over the calendar census; each k is a row-local
    predicate over the same broadcast sums. The squared comparison's
    (kd·n − Σx)² and k²(n·Σx² − Σx²) terms left int64 exactly at sf10
    (sweep-caught), so both comparison sides are formed 128-bit —
    HUGEINT / decimal(38,0) — keeping the audit exact with no
    magnitude rescale out to ~1e19 daily kilodollars.
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
    s = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("kd").cast("long").alias("sx"),
        F.sum(F.col("kd") * F.col("kd")).cast("long").alias("sxx"),
    )
    ks = daily.sparkSession.createDataFrame(
        [(k,) for k in (2, 3, 4)], "k long"
    )
    hits = (
        daily.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum(
                F.expr(
                    "(cast(kd as decimal(38,0)) * n - sx)"
                    " * (cast(kd as decimal(38,0)) * n - sx)"
                    " > cast(k * k as decimal(38,0))"
                    " * (cast(n as decimal(38,0)) * sxx"
                    "    - cast(sx as decimal(38,0)) * sx)"
                ).cast("long")
            )
            .cast("long")
            .alias("n_out"),
            F.max("n").cast("long").alias("n"),
        )
    )
    return hits.selectExpr(
        "CAST(k AS BIGINT) AS k_sigma",
        "CAST(n_out * 10000 div n AS BIGINT) AS observed_bp",
        "CAST(10000 div (k * k) AS BIGINT) AS chebyshev_bound_bp",
    )
