"""Round-4 batch 57: Laspeyres/Paasche/Fisher price indices
year-over-year, Taylor's power law across nations, and Lorenz-curve
deciles of customer revenue.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic; Fisher's geometric mean uses the `wilson_interval_weekly`
IEEE-sqrt exception.
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
# Laspeyres / Paasche / Fisher price indices, 2000 -> 2001
# ---------------------------------------------------------------------------
_PI_Y0 = 2000
_PI_Y1 = 2001

_SQL_PRICE_INDEX = f"""
    WITH pq AS (
        SELECT l_partkey AS pk,
               CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS spend_cents
        FROM lineitem
        WHERE EXTRACT(YEAR FROM l_shipdate) IN ({_PI_Y0}, {_PI_Y1})
        GROUP BY 1, 2),
    wide AS (
        SELECT pk,
               MAX(CASE WHEN yr = {_PI_Y0} THEN q END) AS q0,
               MAX(CASE WHEN yr = {_PI_Y0} THEN spend_cents END) AS s0,
               MAX(CASE WHEN yr = {_PI_Y1} THEN q END) AS q1,
               MAX(CASE WHEN yr = {_PI_Y1} THEN spend_cents END) AS s1
        FROM pq GROUP BY 1),
    both_years AS (
        SELECT pk, q0, q1,
               s0 // q0 AS p0_cents,
               s1 // q1 AS p1_cents
        FROM wide
        WHERE q0 IS NOT NULL AND q1 IS NOT NULL AND q0 > 0 AND q1 > 0),
    idx AS (
        SELECT CAST(SUM(p1_cents * q0) * 10000 // SUM(p0_cents * q0)
                   AS BIGINT) AS laspeyres_bp,
               CAST(SUM(p1_cents * q1) * 10000 // SUM(p0_cents * q1)
                   AS BIGINT) AS paasche_bp,
               CAST(COUNT(*) AS BIGINT) AS n_parts
        FROM both_years)
    SELECT laspeyres_bp, paasche_bp, n_parts,
           CAST(FLOOR(SQRT(CAST(laspeyres_bp AS DOUBLE)
                           * CAST(paasche_bp AS DOUBLE))) AS BIGINT)
               AS fisher_bp
    FROM idx
    """


@_q("price_indices_yoy", _SQL_PRICE_INDEX)
def q_price_indices_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRICE INDICES, {y0}→{y1}: Laspeyres (base-year basket — "what
    would LAST year's purchases cost at today's prices"), Paasche
    (current basket), and Fisher's ideal index (their geometric mean,
    one IEEE sqrt over two exact int64 basis-point indices — the
    `wilson_interval_weekly` exception) over parts traded in BOTH
    years. Laspeyres > Paasche signals substitution away from
    items that got pricier — the index-number spread every CPI
    methodology note discusses. Unit prices are per-part yearly
    spend/quantity in whole cents (cent quantization keeps the basket sums int64-exact at sf1 — milli-cent units overflowed Σp·q·10⁴ there); `yoy_revenue` reports the raw
    revenue delta this family DECOMPOSES into price vs volume.

    Scale: one year-filtered fact pass to (part, year) spend/volume
    cells (map-side combined), a part-keyed pivot, then two mergeable
    basket sums — no joins beyond the pivot, no sort. Chained or
    multi-year indices reuse the same census with more year columns.
    """
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.year("l_shipdate").isin(_PI_Y0, _PI_Y1))
        .select(
            F.col("l_partkey").alias("pk"),
            F.year("l_shipdate").cast("long").alias("yr"),
            F.col("l_quantity").cast("long").alias("q"),
            F.round(F.col("l_extendedprice") * 100, 0)
            .cast("long")
            .alias("cents"),
        )
    )
    pq = li.groupBy("pk", "yr").agg(
        F.sum("q").cast("long").alias("q"),
        F.sum("cents").cast("long").alias("spend_cents"),
    )
    wide = pq.groupBy("pk").agg(
        F.max(F.when(F.col("yr") == _PI_Y0, F.col("q"))).alias("q0"),
        F.max(F.when(F.col("yr") == _PI_Y0, F.col("spend_cents"))).alias(
            "s0"
        ),
        F.max(F.when(F.col("yr") == _PI_Y1, F.col("q"))).alias("q1"),
        F.max(F.when(F.col("yr") == _PI_Y1, F.col("spend_cents"))).alias(
            "s1"
        ),
    )
    both = wide.where(
        F.col("q0").isNotNull()
        & F.col("q1").isNotNull()
        & (F.col("q0") > 0)
        & (F.col("q1") > 0)
    ).selectExpr(
        "q0",
        "q1",
        "s0 div q0 AS p0_cents",
        "s1 div q1 AS p1_cents",
    )
    idx = both.agg(
        F.expr(
            "CAST(SUM(p1_cents * q0) * 10000 div SUM(p0_cents * q0)"
            " AS BIGINT)"
        ).alias("laspeyres_bp"),
        F.expr(
            "CAST(SUM(p1_cents * q1) * 10000 div SUM(p0_cents * q1)"
            " AS BIGINT)"
        ).alias("paasche_bp"),
        F.count(F.lit(1)).cast("long").alias("n_parts"),
    )
    return idx.selectExpr(
        "laspeyres_bp",
        "paasche_bp",
        "n_parts",
        "CAST(FLOOR(SQRT(CAST(laspeyres_bp AS DOUBLE)"
        " * CAST(paasche_bp AS DOUBLE))) AS BIGINT) AS fisher_bp",
    )


# ---------------------------------------------------------------------------
# Taylor's power law: log-variance vs log-mean across nations
# ---------------------------------------------------------------------------
_SQL_TAYLOR = f"""
    WITH o AS (
        SELECT cn.n_name AS nation,
               CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS BIGINT) AS day
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey),
    counts AS (
        SELECT nation, day, CAST(COUNT(*) AS BIGINT) AS x
        FROM o GROUP BY 1, 2),
    s AS (
        SELECT nation, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM counts GROUP BY 1),
    mv AS (
        SELECT nation,
               CAST(LENGTH(BIN(GREATEST(sx * 1000 // n, 1))) AS BIGINT)
                   AS lm,
               CAST(LENGTH(BIN(GREATEST(
                   {_sdiv_sql("(n * sxx - sx * sx) * 1000", "n * n")}, 1)))
                   AS BIGINT) AS lv
        FROM s),
    fit AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(lm) AS BIGINT) AS slm,
               CAST(SUM(lv) AS BIGINT) AS slv,
               CAST(SUM(lm * lv) AS BIGINT) AS slmv,
               CAST(SUM(lm * lm) AS BIGINT) AS slmm
        FROM mv)
    SELECT m AS n_nations,
           CAST({_sdiv_sql("(m * slmv - slm * slv) * 1000",
                           "GREATEST(m * slmm - slm * slm, 1)")} AS BIGINT)
               AS taylor_slope_milli
    FROM fit
    """


@_q("taylor_power_law", _SQL_TAYLOR)
def q_taylor_power_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TAYLOR'S POWER LAW: across nations, the slope of log₂(daily-
    count variance) on log₂(daily-count mean) — ecology's
    variance-mean scaling exponent, with both logs as exact integer
    bit lengths (`zipf_slope_bits`' quantization; ±½-bit granularity
    is the honest resolution for a 25-point fit). Slope ≈ 1000 milli
    means Poisson-like scaling across segment sizes (variance grows
    with mean), ≈ 2000 means clustered/bursty demand whose variance
    grows with mean² — which determines whether per-segment alert
    thresholds should scale with √mean or with mean. The cross-
    segment generalization of `dispersion_index` (one ratio per
    nation; this fits the LAW relating them).

    Scale: per-(nation, day) counts map-side combine; three sums per
    nation; the log-log fit runs over 25 rows. Nothing scales past
    the census.
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
    counts = o.groupBy("nation", "day").agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    s = counts.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    mv = s.selectExpr(
        "nation",
        "CAST(LENGTH(BIN(GREATEST(sx * 1000 div n, 1))) AS BIGINT) AS lm",
        "CAST(LENGTH(BIN(GREATEST("
        + _sdiv_expr("(n * sxx - sx * sx) * 1000", "n * n")
        + ", 1))) AS BIGINT) AS lv",
    )
    fit = mv.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("lm").cast("long").alias("slm"),
        F.sum("lv").cast("long").alias("slv"),
        F.sum(F.col("lm") * F.col("lv")).cast("long").alias("slmv"),
        F.sum(F.col("lm") * F.col("lm")).cast("long").alias("slmm"),
    )
    return fit.selectExpr(
        "m AS n_nations",
        "CAST("
        + _sdiv_expr(
            "(m * slmv - slm * slv) * 1000",
            "GREATEST(m * slmm - slm * slm, 1)",
        )
        + " AS BIGINT) AS taylor_slope_milli",
    )


# ---------------------------------------------------------------------------
# Lorenz curve deciles of customer revenue
# ---------------------------------------------------------------------------
_SQL_LORENZ = """
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS cents
        FROM orders GROUP BY 1),
    ranked AS (
        SELECT cents, NTILE(10) OVER (ORDER BY cents, o_custkey) AS dec
        FROM per_cust),
    d AS (
        SELECT dec, CAST(COUNT(*) AS BIGINT) AS n_cust,
               CAST(SUM(cents) AS BIGINT) AS cents
        FROM ranked GROUP BY 1),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS tc FROM d)
    SELECT CAST(d.dec AS BIGINT) AS decile, d.n_cust,
           CAST(d.cents * 10000 // tot.tc AS BIGINT) AS share_bp,
           CAST(SUM(d.cents) OVER (ORDER BY d.dec) * 10000 // tot.tc
               AS BIGINT) AS cum_share_bp
    FROM d, tot
    """


@_q("lorenz_deciles", _SQL_LORENZ)
def q_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LORENZ CURVE in deciles: customers sorted by total spend, each
    decile's revenue share and the cumulative share — the ten points
    a dashboard actually plots behind "top 10% of customers drive X%
    of revenue", and the curve whose area `gini_customer_revenue`
    collapses to one number (deciles keep the SHAPE: two segments
    with equal Gini can concentrate at the whale end or the middle).
    Ties broken by custkey so both engines cut identical deciles.

    Scale: the customer census is one map-side-combined pass; NTILE
    over customers is the one global sort (histogram-rank upgrade at
    10⁹ customers, as `rfm_segments` documents); the decile rollup
    and cumulative window run on 10 rows.
    """
    per_cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    ranked = per_cust.select(
        "cents",
        F.ntile(10)
        .over(Window.orderBy("cents", "o_custkey"))
        .alias("dec"),
    )
    d = ranked.groupBy("dec").agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.sum("cents").cast("long").alias("cents"),
    )
    tot = d.agg(F.sum("cents").cast("long").alias("tc"))
    return (
        d.crossJoin(F.broadcast(tot))
        .select(
            F.col("dec").cast("long").alias("decile"),
            "n_cust",
            F.expr("CAST(cents * 10000 div tc AS BIGINT)").alias(
                "share_bp"
            ),
            F.expr(
                "CAST(SUM(cents) OVER (ORDER BY dec) * 10000 div tc"
                " AS BIGINT)"
            ).alias("cum_share_bp"),
        )
    )
