"""Round-4 batch 53: Bradley–Terry strength ranking from pairwise
daily wins, a Simpson's-paradox detector, and Benjamini–Hochberg FDR
across nation deviation tests.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic; the z-score ladder uses the `wilson_interval_weekly` float
exception, with the BH thresholds embedded as identical literals on
both sides (computed once in Python at import).
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
# Bradley-Terry strengths from pairwise daily revenue wins
# ---------------------------------------------------------------------------
_SQL_BT = """
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS BIGINT) AS day,
               c_mktsegment AS seg,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2),
    duel AS (
        SELECT a.seg AS i, b.seg AS j,
               CAST(SUM(CASE WHEN a.cents > b.cents THEN 1 ELSE 0 END)
                   AS BIGINT) AS w,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM daily a JOIN daily b
          ON a.day = b.day AND a.seg <> b.seg
        GROUP BY 1, 2),
    wins AS (
        SELECT i AS seg, CAST(SUM(w) AS BIGINT) AS wins,
               CAST(SUM(n) AS BIGINT) AS games
        FROM duel GROUP BY 1),
    upd AS (
        SELECT d.i AS seg, CAST(SUM(d.n * 1000 // 2000) AS BIGINT) AS denom
        FROM duel d GROUP BY 1)
    SELECT w.seg AS segment, w.wins, w.games,
           CAST(w.wins * 10000 // w.games AS BIGINT) AS win_rate_bp,
           CAST(w.wins * 1000 // GREATEST(u.denom, 1) AS BIGINT)
               AS bt_strength_milli
    FROM wins w JOIN upd u ON w.seg = u.seg
    """


@_q("bradley_terry_segments", _SQL_BT)
def q_bradley_terry_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BRADLEY–TERRY strengths from pairwise daily head-to-heads:
    every day each market-segment pair duels on revenue, and one MM
    update from uniform strengths (sᵢ ← Wᵢ / Σⱼ nᵢⱼ/(sᵢ+sⱼ), with
    s=1 the denominator is Σ nᵢⱼ/2) turns the win matrix into a
    strength scale — the pairwise-preference model that also powers
    RLHF reward fitting and sports ratings; unlike the raw win rate
    it remains comparable when the duel schedule is unbalanced (full
    BT iterates the same update with sᵢ from the previous round —
    each round this same bounded shape). All-integer: wins and duels
    are counts, the update one truncating division.

    Scale: duels join the calendar-bounded day × segment grid to
    itself (≤5 segments — the pair stream is 20× the day count);
    the win matrix is ≤25 cells. Fact rows only feed the daily
    census. At k strata the duel grid is O(days·k²) — still
    calendar-bounded.
    """
    daily = (
        _t(spark, sf_dir, "orders")
        .join(
            _t(spark, sf_dir, "customer").select(
                    "c_custkey", F.col("c_mktsegment").alias("seg")
                ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.datediff(
                F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("day"),
            "seg",
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    a = daily.select(
        F.col("day").alias("da"), F.col("seg").alias("i"),
        F.col("cents").alias("ca"),
    )
    b = daily.select(
        F.col("day").alias("db"), F.col("seg").alias("j"),
        F.col("cents").alias("cb"),
    )
    duel = (
        a.join(b, (F.col("da") == F.col("db")) & (F.col("i") != F.col("j")))
        .groupBy("i", "j")
        .agg(
            F.sum((F.col("ca") > F.col("cb")).cast("long"))
            .cast("long")
            .alias("w"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    wins = duel.groupBy(F.col("i").alias("seg")).agg(
        F.sum("w").cast("long").alias("wins"),
        F.sum("n").cast("long").alias("games"),
    )
    upd = duel.groupBy(F.col("i").alias("seg")).agg(
        F.expr("CAST(SUM(n * 1000 div 2000) AS BIGINT)").alias("denom")
    )
    return wins.join(upd, "seg").select(
        F.col("seg").alias("segment"),
        "wins",
        "games",
        F.expr("CAST(wins * 10000 div games AS BIGINT)").alias(
            "win_rate_bp"
        ),
        F.expr(
            "CAST(wins * 1000 div GREATEST(denom, 1) AS BIGINT)"
        ).alias("bt_strength_milli"),
    )


# ---------------------------------------------------------------------------
# Simpson's paradox detector: qty ~ discount, overall vs within brand
# ---------------------------------------------------------------------------
_SQL_SIMPSON = f"""
    WITH obs AS (
        SELECT p_brand AS g,
               CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS x,
               CAST(l_quantity AS BIGINT) AS y
        FROM lineitem JOIN part ON l_partkey = p_partkey),
    per_g AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM obs GROUP BY 1),
    g_slopes AS (
        SELECT g, n,
               {_sdiv_sql("(n * sxy - sx * sy) * 1000",
                          "GREATEST(n * sxx - sx * sx, 1)")} AS slope_milli
        FROM per_g),
    overall AS (
        SELECT {_sdiv_sql(
            "(SUM(n) * SUM(sxy) - SUM(sx) * SUM(sy)) * 1000",
            "GREATEST(SUM(n) * SUM(sxx) - SUM(sx) * SUM(sx), 1)")}
            AS slope_milli
        FROM per_g)
    SELECT CAST(o.slope_milli AS BIGINT) AS overall_slope_milli,
           CAST({_sdiv_sql("SUM(g.slope_milli * g.n)", "SUM(g.n)")}
               AS BIGINT) AS within_weighted_slope_milli,
           CAST(SUM(CASE WHEN (g.slope_milli > 0) <> (o.slope_milli > 0)
                          AND g.slope_milli <> 0 AND o.slope_milli <> 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_brands_reversed,
           CAST(COUNT(*) AS BIGINT) AS n_brands
    FROM g_slopes g, overall o
    GROUP BY o.slope_milli
    """


@_q("simpson_check", _SQL_SIMPSON)
def q_simpson_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIMPSON'S PARADOX DETECTOR: the discount→quantity slope fitted
    on the POOLED stream versus the size-weighted mean of WITHIN-brand
    slopes, plus the count of brands whose slope sign opposes the
    pooled sign — when pooled and within disagree, the pooled
    number is a composition artifact (brand mix confounds the
    discount effect) and every dashboard reading it is wrong. The
    aggregation-literacy audit that belongs beside `mix_shift_drift`
    (which measures the mix change this paradox rides on);
    `ols_discount_quantity` reports the pooled slope this query
    interrogates.

    Scale: per-brand sufficient sums from one pass (bounded brand
    domain); the pooled slope REUSES the same sums (Σ over brands) —
    no second scan; one ≤25-row rollup compares them.
    """
    obs = (
        _t(spark, sf_dir, "lineitem")
        .join(
            _t(spark, sf_dir, "part").select("p_partkey", "p_brand"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            F.col("p_brand").alias("g"),
            F.round(F.col("l_discount") * 100, 0).cast("long").alias("x"),
            F.col("l_quantity").cast("long").alias("y"),
        )
    )
    per_g = obs.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    g_slopes = per_g.select(
        "g",
        "n",
        F.expr(
            _sdiv_expr(
                "(n * sxy - sx * sy) * 1000",
                "GREATEST(n * sxx - sx * sx, 1)",
            )
        ).alias("slope_milli"),
    )
    overall = per_g.agg(
        F.expr(
            _sdiv_expr(
                "(SUM(n) * SUM(sxy) - SUM(sx) * SUM(sy)) * 1000",
                "GREATEST(SUM(n) * SUM(sxx) - SUM(sx) * SUM(sx), 1)",
            )
        ).alias("o_slope")
    )
    return (
        g_slopes.crossJoin(F.broadcast(overall))
        .groupBy("o_slope")
        .agg(
            F.expr(
                "CAST("
                + _sdiv_expr("SUM(slope_milli * n)", "SUM(n)")
                + " AS BIGINT)"
            ).alias("within_weighted_slope_milli"),
            F.sum(
                (
                    ((F.col("slope_milli") > 0) != (F.col("o_slope") > 0))
                    & (F.col("slope_milli") != 0)
                    & (F.col("o_slope") != 0)
                ).cast("long")
            )
            .cast("long")
            .alias("n_brands_reversed"),
            F.count(F.lit(1)).cast("long").alias("n_brands"),
        )
        .select(
            F.col("o_slope").cast("long").alias("overall_slope_milli"),
            "within_weighted_slope_milli",
            "n_brands_reversed",
            "n_brands",
        )
    )


# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR over per-nation return-rate deviations
# ---------------------------------------------------------------------------
def _norm_ppf(p: float) -> float:
    """Acklam's rational approximation to the standard normal inverse
    CDF — used only at import time to embed IDENTICAL threshold
    literals in both engines' query text (never evaluated per-row)."""
    a = [-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00]
    plow, phigh = 0.02425, 1 - 0.02425
    import math

    if p < plow:
        q = math.sqrt(-2 * math.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4])
                * q + c[5]) / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3])
                               * q + 1)
    if p > phigh:
        return -_norm_ppf(1 - p)
    q = p - 0.5
    r = q * q
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4])
            * r + a[5]) * q / (((((b[0] * r + b[1]) * r + b[2]) * r + b[3])
                                * r + b[4]) * r + 1)


_BH_M = 25  # number of nations / hypotheses
_BH_ALPHA = 0.05
# z threshold for rank k (two-sided): Phi^{-1}(1 - alpha*k/(2m)), in
# milli, rounded once in Python so both engines compare identical longs
_BH_THRESHOLDS = tuple(
    int(round(-_norm_ppf(_BH_ALPHA * k / (2 * _BH_M)) * 1000))
    for k in range(1, _BH_M + 1)
)


def _sql_bh() -> str:
    ladder = ", ".join(
        f"({k}, {t})" for k, t in enumerate(_BH_THRESHOLDS, start=1)
    )
    return f"""
    WITH per_nation AS (
        SELECT cn.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                   AS BIGINT) AS r
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        GROUP BY 1),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(r) AS BIGINT) AS tr
        FROM per_nation),
    z AS (
        SELECT nation,
               CAST(FLOOR(abs(
                   (CAST(r AS DOUBLE) / CAST(n AS DOUBLE)
                    - CAST(tr AS DOUBLE) / CAST(tn AS DOUBLE))
                   / SQRT((CAST(tr AS DOUBLE) / CAST(tn AS DOUBLE))
                          * (1.0 - CAST(tr AS DOUBLE) / CAST(tn AS DOUBLE))
                          / CAST(n AS DOUBLE))) * 1000.0) AS BIGINT)
                   AS absz_milli
        FROM per_nation, tot),
    ranked AS (
        SELECT nation, absz_milli,
               ROW_NUMBER() OVER (ORDER BY absz_milli DESC, nation) AS rk
        FROM z),
    ladder(rk, thr_milli) AS (VALUES {ladder}),
    hits AS (
        SELECT r.rk FROM ranked r JOIN ladder l ON r.rk = l.rk
        WHERE r.absz_milli >= l.thr_milli),
    kstar AS (SELECT COALESCE(MAX(rk), 0) AS k FROM hits)
    SELECT r.nation, r.absz_milli, CAST(r.rk AS BIGINT) AS z_rank,
           CAST(CASE WHEN r.rk <= (SELECT k FROM kstar)
                     THEN 1 ELSE 0 END AS BIGINT) AS bh_significant
    FROM ranked r
    """


@_q("bh_fdr_nations", _sql_bh())
def q_bh_fdr_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENJAMINI–HOCHBERG FDR control over 25 simultaneous tests:
    each nation's return rate vs the pooled rate as a two-proportion
    z (the `wilson_interval_weekly` IEEE-sqrt exception), then BH's
    step-up rule — largest k with |z|₍ₖ₎ ≥ Φ⁻¹(1 − αk/2m) — flags
    nations while bounding the expected FALSE-discovery share at α =
    5%. Without this, 25 parallel `daily_anomaly_flags`-style reads
    at 5% each produce ~1.25 false alarms per refresh BY DESIGN. The
    Φ⁻¹ ladder is 25 literals computed once in Python (Acklam) and
    embedded identically in both engines' query text — the
    thresholds are data-independent constants, not per-row float
    math.

    Scale: one fact pass to the ≤25-nation census; ranking and the
    step-up scan run on 25 rows joined to a 25-row VALUES ladder.
    More hypotheses widen the literal ladder, nothing else.
    """
    per_nation = (
        _t(spark, sf_dir, "lineitem")
        .join(
            _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
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
            F.sum((F.col("l_returnflag") == "R").cast("long"))
            .cast("long")
            .alias("r"),
        )
    )
    tot = per_nation.agg(
        F.sum("n").cast("long").alias("tn"),
        F.sum("r").cast("long").alias("tr"),
    )
    z = per_nation.crossJoin(F.broadcast(tot)).selectExpr(
        "nation",
        "CAST(FLOOR(abs("
        "(CAST(r AS DOUBLE) / CAST(n AS DOUBLE)"
        " - CAST(tr AS DOUBLE) / CAST(tn AS DOUBLE))"
        " / SQRT((CAST(tr AS DOUBLE) / CAST(tn AS DOUBLE))"
        " * (1.0 - CAST(tr AS DOUBLE) / CAST(tn AS DOUBLE))"
        " / CAST(n AS DOUBLE))) * 1000.0) AS BIGINT) AS absz_milli",
    )
    ranked = z.select(
        "nation",
        "absz_milli",
        F.row_number()
        .over(Window.orderBy(F.col("absz_milli").desc(), "nation"))
        .alias("rk"),
    )
    ladder = ranked.sparkSession.createDataFrame(
        [(k, t) for k, t in enumerate(_BH_THRESHOLDS, start=1)],
        "rk int, thr_milli long",
    )
    kstar = (
        ranked.join(F.broadcast(ladder), "rk")
        .where(F.col("absz_milli") >= F.col("thr_milli"))
        .agg(F.coalesce(F.max("rk"), F.lit(0)).alias("k"))
    )
    return ranked.crossJoin(F.broadcast(kstar)).select(
        "nation",
        "absz_milli",
        F.col("rk").cast("long").alias("z_rank"),
        (F.col("rk") <= F.col("k")).cast("long").alias("bh_significant"),
    )
