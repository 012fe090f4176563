"""Round-4 batch 50: Poisson dispersion index per nation, prominence
peak detection on the daily series, and a delta-method vs Poisson-
bootstrap variance cross-check for a ratio metric.

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
from bikes_data_warehouse_etl_spark.plans.pipeline_ops32 import (
    _PB_CDF,
    _sql_multiplicity,
)
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Index of dispersion (variance-to-mean) of daily order counts
# ---------------------------------------------------------------------------
_SQL_DISPERSION = f"""
    WITH o AS (
        SELECT cn.n_name AS nation,
               CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS BIGINT) AS day
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey),
    b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM o),
    spine AS (
        SELECT CAST(UNNEST(generate_series(
                   (SELECT lo FROM b), (SELECT hi FROM b))) AS BIGINT)
            AS day),
    counts AS (
        SELECT n.nation, s.day, CAST(COUNT(o.day) AS BIGINT) AS x
        FROM (SELECT DISTINCT nation FROM o) n
        CROSS JOIN spine s
        LEFT JOIN o ON o.nation = n.nation AND o.day = s.day
        GROUP BY 1, 2),
    s AS (
        SELECT nation, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM counts GROUP BY 1)
    SELECT nation, n AS n_days,
           CAST(sx * 1000 // n AS BIGINT) AS mean_milli,
           CAST({_sdiv_sql("(n * sxx - sx * sx) * 1000",
                           "n * GREATEST(sx, 1)")} AS BIGINT) AS vmr_milli
    FROM s
    """


@_q("dispersion_index", _SQL_DISPERSION)
def q_dispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INDEX OF DISPERSION: each nation's daily order-count
    variance-to-mean ratio over the FULL calendar (zero-order days
    included — omitting them is the classic way this statistic gets
    faked) — 1000 milli means Poisson-like arrivals,  ≫1000 means
    bursty/contagious demand, ≪1000 means regularized (quota-fed)
    flow. The overdispersion gate that decides whether
    `late_rate_pchart`-style ±3σ binomial bands are even valid, and
    the arrival-process companion of `interarrival_hist`.

    Scale: one fact pass to (nation, day) counts; the zero-filled
    grid is |nations| × calendar (bounded); three mergeable sums per
    nation finish it. VMR = (nΣx² − (Σx)²)/(n·Σx) keeps the ratio
    one exact truncating division.
    """
    o = (
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
        .select(
            "nation",
            F.datediff(
                F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("day"),
        )
    )
    b = o.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = b.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day")
    )
    nations = o.select("nation").distinct()
    per_day = o.groupBy("nation", "day").agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    counts = (
        nations.crossJoin(spine)
        .join(per_day, ["nation", "day"], "left")
        .select(
            "nation", "day", F.coalesce(F.col("x"), F.lit(0)).alias("x")
        )
    )
    s = counts.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    return s.select(
        "nation",
        F.col("n").alias("n_days"),
        F.expr("CAST(sx * 1000 div n AS BIGINT)").alias("mean_milli"),
        F.expr(
            "CAST("
            + _sdiv_expr(
                "(n * sxx - sx * sx) * 1000", "n * GREATEST(sx, 1)"
            )
            + " AS BIGINT)"
        ).alias("vmr_milli"),
    )


# ---------------------------------------------------------------------------
# Peak detection: strict local maxima over a +/-3-day neighborhood
# ---------------------------------------------------------------------------
_SQL_PEAKS = """
    WITH rev AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS BIGINT) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS cents
        FROM orders GROUP BY 1),
    b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM rev),
    spine AS (
        SELECT CAST(UNNEST(generate_series(
                   (SELECT lo FROM b), (SELECT hi FROM b))) AS BIGINT)
            AS day),
    filled AS (
        SELECT s.day, COALESCE(r.cents, 0) AS cents
        FROM spine s LEFT JOIN rev r ON r.day = s.day),
    flagged AS (
        SELECT day, cents,
               CASE WHEN cents > COALESCE(MAX(cents) OVER (
                        ORDER BY day
                        ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), -1)
                     AND cents > COALESCE(MAX(cents) OVER (
                        ORDER BY day
                        ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING), -1)
                    THEN 1 ELSE 0 END AS is_peak
        FROM filled)
    SELECT CAST(EXTRACT(YEAR FROM DATE '1970-01-01'
                        + CAST(day AS INTEGER)) AS BIGINT) AS yr,
           CAST(SUM(is_peak) AS BIGINT) AS n_peaks,
           CAST(MAX(CASE WHEN is_peak = 1 THEN cents END) AS BIGINT)
               AS tallest_peak_cents
    FROM flagged GROUP BY 1
    """


@_q("peak_detection_daily", _SQL_PEAKS)
def q_peak_detection_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PEAK DETECTION: days whose revenue strictly tops every day
    within ±3 calendar days (gap days count as zero, so isolated
    spikes next to quiet stretches register) — the signal-processing
    primitive behind promotion-spike counting and alert dedup
    (`daily_anomaly_flags` asks "is today extreme vs global
    variance?"; this asks "is today the LOCAL summit?", which is
    what "how many distinct demand spikes last year?" actually
    means). Per year: peak count and the tallest peak.

    Scale: the two neighborhood windows run over the gap-filled
    calendar spine (bounded domain, single-partition contract as
    `record_days`); fact rows collapse to the day census first. The
    ±k neighborhood is a ROWS frame — widening k changes a constant,
    not the shape.
    """
    rev = (
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
    b = rev.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = b.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day")
    )
    filled = spine.join(rev, "day", "left").select(
        "day", F.coalesce(F.col("cents"), F.lit(0)).alias("cents")
    )
    wprev = Window.orderBy("day").rowsBetween(-3, -1)
    wnext = Window.orderBy("day").rowsBetween(1, 3)
    flagged = filled.select(
        "day",
        "cents",
        (
            (
                F.col("cents")
                > F.coalesce(F.max("cents").over(wprev), F.lit(-1))
            )
            & (
                F.col("cents")
                > F.coalesce(F.max("cents").over(wnext), F.lit(-1))
            )
        )
        .cast("long")
        .alias("is_peak"),
    )
    return flagged.groupBy(
        F.expr(
            "CAST(year(date_add(DATE'1970-01-01', CAST(day AS INT)))"
            " AS BIGINT)"
        ).alias("yr")
    ).agg(
        F.sum("is_peak").cast("long").alias("n_peaks"),
        F.max(F.when(F.col("is_peak") == 1, F.col("cents")))
        .cast("long")
        .alias("tallest_peak_cents"),
    )


# ---------------------------------------------------------------------------
# Delta-method vs Poisson-bootstrap variance of a ratio metric
# ---------------------------------------------------------------------------
_DB_B = 32

_SQL_DELTA_BOOT = f"""
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS BIGINT) AS day,
               CAST(COUNT(*) AS BIGINT) AS x,
               CAST(SUM(CAST(ROUND(o_totalprice, 0) AS BIGINT)) // 1000
                   AS BIGINT) AS y
        FROM orders GROUP BY 1),
    tot AS (
        SELECT CAST(SUM(x) AS BIGINT) AS tx, CAST(SUM(y) AS BIGINT) AS ty
        FROM daily),
    r AS (
        SELECT CAST(ty * 1000 // tx AS BIGINT) AS r_milli FROM tot),
    delta AS (
        SELECT CAST(SUM(q * q) // 1000000 AS BIGINT) AS delta_var_milli2
        FROM (
            SELECT {_sdiv_sql(
                "(d.y * 1000 - r.r_milli * d.x) * 1000",
                "GREATEST((SELECT tx FROM tot), 1)")} AS q
            FROM daily d, r)),
    rep AS (
        SELECT t.b,
               CAST(SUM(w.m * d.y) * 1000
                    // GREATEST(SUM(w.m * d.x), 1) AS BIGINT) AS rb
        FROM daily d
        CROSS JOIN generate_series(0, {_DB_B} - 1) AS t(b)
        CROSS JOIN LATERAL (
            SELECT {_sql_multiplicity(
                _sql_hash64(
                    "CAST(d.day AS VARCHAR) || ':' || CAST(t.b AS VARCHAR)")
                + " % 1000000")} AS m) w
        GROUP BY 1),
    boot AS (
        SELECT CAST(SUM((rb - rbar) * (rb - rbar)) // {_DB_B} AS BIGINT)
            AS boot_var_milli2
        FROM rep, (SELECT CAST(SUM(rb) // {_DB_B} AS BIGINT) AS rbar
                   FROM rep) m)
    SELECT r.r_milli AS ratio_milli_kd_per_order,
           delta.delta_var_milli2,
           boot.boot_var_milli2,
           CAST(boot.boot_var_milli2 * 10000
                // GREATEST(delta.delta_var_milli2, 1) AS BIGINT)
               AS boot_vs_delta_bp
    FROM r, delta, boot
    """


@_q("delta_vs_bootstrap_var", _SQL_DELTA_BOOT)
def q_delta_vs_bootstrap_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNCERTAINTY CROSS-CHECK for a ratio metric (revenue per order,
    day as the sampling unit): the DELTA-METHOD variance — linearize
    R = ΣY/ΣX via day residuals (y_i − R·x_i), Σresid²/(ΣX)², the
    survey-sampling ratio-estimator formula — against the Poisson-
    BOOTSTRAP variance over 32 derandomized replicates
    (`poisson_bootstrap_ci`'s hash-CDF multiplicities applied to
    DAYS). Two estimators from different theory; boot_vs_delta_bp ≈
    10000 is the agreement check that certifies either for the
    dashboard — the uncertainty-layer sibling of `littles_law_check`
    (two plans, one truth).

    Scale: the unit table is the calendar-bounded daily census; delta
    is one mergeable sum of squared kilodollar-quantized residuals
    (quantization documented — it bounds Σq² under int64 at sf1);
    the bootstrap fans the census ×32 row-locally. Neither path
    rescans facts.
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
            F.count(F.lit(1)).cast("long").alias("x"),
            F.expr(
                "CAST(SUM(CAST(ROUND(o_totalprice, 0) AS BIGINT))"
                " div 1000 AS BIGINT)"
            ).alias("y"),
        )
    )
    tot = daily.agg(
        F.sum("x").cast("long").alias("tx"),
        F.sum("y").cast("long").alias("ty"),
    )
    r = tot.select(
        F.expr("CAST(ty * 1000 div tx AS BIGINT)").alias("r_milli"), "tx"
    )
    delta = (
        daily.crossJoin(F.broadcast(r))
        .select(
            F.expr(
                _sdiv_expr(
                    "(y * 1000 - r_milli * x) * 1000", "GREATEST(tx, 1)"
                )
            ).alias("q")
        )
        .agg(
            F.expr(
                "CAST(SUM(q * q) div 1000000 AS BIGINT)"
            ).alias("delta_var_milli2")
        )
    )
    mult = F.lit(len(_PB_CDF)).cast("long")
    u = (
        hash64(
            F.concat(
                F.col("day").cast("string"),
                F.lit(":"),
                F.col("b").cast("string"),
            )
        )
        % 1000000
    )
    rep_src = daily.select(
        "day",
        "x",
        "y",
        F.explode(F.sequence(F.lit(0), F.lit(_DB_B - 1))).alias("b"),
    ).withColumn("u", u)
    for k in range(len(_PB_CDF) - 1, -1, -1):
        mult = F.when(
            F.col("u") < _PB_CDF[k], F.lit(k).cast("long")
        ).otherwise(mult)
    rep = (
        rep_src.withColumn("m", mult)
        .groupBy("b")
        .agg(
            F.expr(
                "CAST(SUM(m * y) * 1000 div GREATEST(SUM(m * x), 1)"
                " AS BIGINT)"
            ).alias("rb")
        )
    )
    rbar = rep.agg(
        F.expr(f"CAST(SUM(rb) div {_DB_B} AS BIGINT)").alias("rbar")
    )
    boot = rep.crossJoin(F.broadcast(rbar)).agg(
        F.expr(
            f"CAST(SUM((rb - rbar) * (rb - rbar)) div {_DB_B} AS BIGINT)"
        ).alias("boot_var_milli2")
    )
    return (
        r.select("r_milli")
        .crossJoin(F.broadcast(delta))
        .crossJoin(F.broadcast(boot))
        .selectExpr(
            "r_milli AS ratio_milli_kd_per_order",
            "delta_var_milli2",
            "boot_var_milli2",
            "CAST(boot_var_milli2 * 10000"
            " div GREATEST(delta_var_milli2, 1) AS BIGINT)"
            " AS boot_vs_delta_bp",
        )
    )
