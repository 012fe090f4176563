"""Round-4 batch 51: a portable KMV distinct-count sketch audited
against the exact count, the 4-variable covariance matrix in one
pass, and Wilson score intervals for weekly late rates.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline. The Wilson query documents the one sanctioned float
exception: correctly-rounded IEEE sqrt/divide over exact integer
inputs, composed in the same op order on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.text import hash64
from bikes_data_warehouse_etl_spark.plans.extensions import _sql_hash64
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct estimate vs exact
# ---------------------------------------------------------------------------
_KMV_K = 64
_KMV_MAX = 1 << 40  # estimator space: hash64 truncated to 40 bits

_SQL_KMV = f"""
    WITH h AS (
        SELECT DISTINCT ({_sql_hash64("CAST(l_partkey AS VARCHAR)")}
                         >> 20) AS hv
        FROM lineitem),
    kth AS (
        SELECT MAX(hv) AS hk, COUNT(*) AS k
        FROM (SELECT hv FROM h ORDER BY hv LIMIT {_KMV_K})),
    exact AS (
        SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_exact
        FROM lineitem)
    SELECT n_exact,
           CAST(CASE WHEN k < {_KMV_K} THEN k
                     ELSE (k - 1) * {_KMV_MAX} // hk END AS BIGINT)
               AS kmv_estimate,
           CAST(abs(CASE WHEN k < {_KMV_K} THEN k
                         ELSE (k - 1) * {_KMV_MAX} // hk END - n_exact)
                * 10000 // n_exact AS BIGINT) AS err_bp
    FROM kth, exact
    """


@_q("kmv_distinct_estimate", _SQL_KMV)
def q_kmv_distinct_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV DISTINCT-COUNT SKETCH, transparently: keep the k=64
    smallest values of a portable 60-bit content hash over part keys;
    since k uniform points span ≈ k/n of the hash space, n̂ =
    (k−1)·2⁴⁰/h₍ₖ₎ (hash truncated to 40 bits so (k−1)·2⁴⁰ stays
    int64-exact; collisions at ~n²/2⁴¹ are negligible and in any case
    identical on both engines) — the order-statistics estimator underlying
    theta sketches, built here from plain SQL so BOTH engines compute
    the IDENTICAL estimate (no engine-private HLL state, unlike
    `approx_distinct_parts`, where only the error is comparable) and
    the audit column shows the actual relative error (~1/√k ≈ 12%).
    Mergeable: the union of two KMV sets, re-truncated to k, is the
    sketch of the union — the property that makes it a per-partition
    combiner at 100 TB.

    Scale: the distinct-hash census collapses map-side; the k
    smallest survive a TakeOrdered heap (k rows to one reducer, not a
    sort). The exact count is the expensive branch — shown here
    as the audit, dropped in production where the sketch IS the
    answer.
    """
    li = _t(spark, sf_dir, "lineitem")
    h = li.select(
        F.shiftright(
            hash64(F.col("l_partkey").cast("string")), 20
        ).alias("hv")
    ).distinct()
    kth = (
        h.orderBy("hv")
        .limit(_KMV_K)
        .agg(
            F.max("hv").alias("hk"),
            F.count(F.lit(1)).cast("long").alias("k"),
        )
    )
    exact = li.agg(
        F.countDistinct("l_partkey").cast("long").alias("n_exact")
    )
    est = (
        f"CASE WHEN k < {_KMV_K} THEN k"
        f" ELSE (k - 1) * {_KMV_MAX} div hk END"
    )
    return kth.crossJoin(F.broadcast(exact)).selectExpr(
        "n_exact",
        f"CAST({est} AS BIGINT) AS kmv_estimate",
        f"CAST(abs({est} - n_exact) * 10000 div n_exact AS BIGINT)"
        " AS err_bp",
    )


# ---------------------------------------------------------------------------
# Covariance matrix of four line-item variables in one pass
# ---------------------------------------------------------------------------
_SQL_COV = """
    WITH obs AS (
        SELECT CAST(l_quantity AS BIGINT) AS q,
               CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS d,
               CAST(ROUND(l_extendedprice, 0) AS BIGINT) // 1000 AS p,
               CAST(ROUND(l_tax * 100, 0) AS BIGINT) AS t
        FROM lineitem),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(q) AS BIGINT) AS sq, CAST(SUM(d) AS BIGINT) AS sd,
               CAST(SUM(p) AS BIGINT) AS sp, CAST(SUM(t) AS BIGINT) AS st,
               CAST(SUM(q * q) AS BIGINT) AS sqq,
               CAST(SUM(q * d) AS BIGINT) AS sqd,
               CAST(SUM(q * p) AS BIGINT) AS sqp,
               CAST(SUM(q * t) AS BIGINT) AS sqt,
               CAST(SUM(d * d) AS BIGINT) AS sdd,
               CAST(SUM(d * p) AS BIGINT) AS sdp,
               CAST(SUM(d * t) AS BIGINT) AS sdt,
               CAST(SUM(p * p) AS BIGINT) AS spp,
               CAST(SUM(p * t) AS BIGINT) AS spt,
               CAST(SUM(t * t) AS BIGINT) AS stt
        FROM obs)
    SELECT n AS n_lines,
           CAST((CAST(n AS HUGEINT) * sqq - CAST(sq AS HUGEINT) * sq) // n AS BIGINT) AS var_qty,
           CAST((CAST(n AS HUGEINT) * sdd - CAST(sd AS HUGEINT) * sd) // n AS BIGINT) AS var_disc,
           CAST((CAST(n AS HUGEINT) * spp - CAST(sp AS HUGEINT) * sp) // n AS BIGINT) AS var_price_kd,
           CAST((CAST(n AS HUGEINT) * stt - CAST(st AS HUGEINT) * st) // n AS BIGINT) AS var_tax,
           CAST((CAST(n AS HUGEINT) * sqd - CAST(sq AS HUGEINT) * sd) // n AS BIGINT) AS cov_qty_disc,
           CAST((CAST(n AS HUGEINT) * sqp - CAST(sq AS HUGEINT) * sp) // n AS BIGINT) AS cov_qty_price,
           CAST((CAST(n AS HUGEINT) * sqt - CAST(sq AS HUGEINT) * st) // n AS BIGINT) AS cov_qty_tax,
           CAST((CAST(n AS HUGEINT) * sdp - CAST(sd AS HUGEINT) * sp) // n AS BIGINT) AS cov_disc_price,
           CAST((CAST(n AS HUGEINT) * sdt - CAST(sd AS HUGEINT) * st) // n AS BIGINT) AS cov_disc_tax,
           CAST((CAST(n AS HUGEINT) * spt - CAST(sp AS HUGEINT) * st) // n AS BIGINT) AS cov_price_tax
    FROM s
    """


@_q("covariance_matrix", _SQL_COV)
def q_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COVARIANCE MATRIX of (quantity, discount%, price-kilodollars,
    tax%) — all ten upper-triangle entries from ONE scan of fourteen
    mergeable sums, n·cov = nΣxy − ΣxΣy floored by n (population
    covariance, times n for exactness until the last division).
    The multivariate-profile step before any PCA/whitening
    (`pca_power_iter` consumes exactly this matrix shape) and the
    bulk extension of `table_profile` (marginal stats) to PAIRWISE
    structure. cov_qty_price dominating is the expected
    line-economics signal; discount uncorrelated with tax is the
    designed independence of TPC-H generators — a drifted cov is a
    data-quality alarm.

    Scale: the textbook sufficient-statistics pattern — one
    map-side-combined pass, a 1-row result, O(k²) sums for k
    variables and never a second scan. Price kilodollar-floored to
    hold the Σ sums inside int64 (`cuped_adjusted_ab`'s rule); the
    n·Σ PRODUCTS still left int64 at sf10's 60M lines (sweep-caught:
    n·Σqq ≈ 9e18), so every matrix entry is formed 128-bit (HUGEINT /
    decimal(38,0)) with only the n-floored entry returning to int64.
    """
    obs = _t(spark, sf_dir, "lineitem").selectExpr(
        "CAST(l_quantity AS BIGINT) AS q",
        "CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS d",
        "CAST(ROUND(l_extendedprice, 0) AS BIGINT) div 1000 AS p",
        "CAST(ROUND(l_tax * 100, 0) AS BIGINT) AS t",
    )
    s = obs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[
            F.sum(F.expr(e)).cast("long").alias(a)
            for e, a in [
                ("q", "sq"),
                ("d", "sd"),
                ("p", "sp"),
                ("t", "st"),
                ("q * q", "sqq"),
                ("q * d", "sqd"),
                ("q * p", "sqp"),
                ("q * t", "sqt"),
                ("d * d", "sdd"),
                ("d * p", "sdp"),
                ("d * t", "sdt"),
                ("p * p", "spp"),
                ("p * t", "spt"),
                ("t * t", "stt"),
            ]
        ],
    )
    return s.selectExpr(
        "n AS n_lines",
        "CAST((cast(n as decimal(38,0)) * sqq - cast(sq as decimal(38,0)) * sq) div n AS BIGINT) AS var_qty",
        "CAST((cast(n as decimal(38,0)) * sdd - cast(sd as decimal(38,0)) * sd) div n AS BIGINT) AS var_disc",
        "CAST((cast(n as decimal(38,0)) * spp - cast(sp as decimal(38,0)) * sp) div n AS BIGINT) AS var_price_kd",
        "CAST((cast(n as decimal(38,0)) * stt - cast(st as decimal(38,0)) * st) div n AS BIGINT) AS var_tax",
        "CAST((cast(n as decimal(38,0)) * sqd - cast(sq as decimal(38,0)) * sd) div n AS BIGINT) AS cov_qty_disc",
        "CAST((cast(n as decimal(38,0)) * sqp - cast(sq as decimal(38,0)) * sp) div n AS BIGINT) AS cov_qty_price",
        "CAST((cast(n as decimal(38,0)) * sqt - cast(sq as decimal(38,0)) * st) div n AS BIGINT) AS cov_qty_tax",
        "CAST((cast(n as decimal(38,0)) * sdp - cast(sd as decimal(38,0)) * sp) div n AS BIGINT) AS cov_disc_price",
        "CAST((cast(n as decimal(38,0)) * sdt - cast(sd as decimal(38,0)) * st) div n AS BIGINT) AS cov_disc_tax",
        "CAST((cast(n as decimal(38,0)) * spt - cast(sp as decimal(38,0)) * st) div n AS BIGINT) AS cov_price_tax",
    )


# ---------------------------------------------------------------------------
# Wilson score intervals for weekly late-shipment rates
# ---------------------------------------------------------------------------
_SQL_WILSON = """
    WITH wk AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', l_shipdate) // 7
                   AS BIGINT) AS week,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                   AS BIGINT) AS r
        FROM lineitem GROUP BY 1)
    SELECT week, n AS n_lines, r AS n_returned,
           CAST(r * 10000 // n AS BIGINT) AS rate_bp,
           CAST(FLOOR(((CAST(r AS DOUBLE) + 2.0)
                - 2.0 * SQRT((CAST(r AS DOUBLE)
                              * CAST(n - r AS DOUBLE))
                             / CAST(n AS DOUBLE) + 1.0))
               * 10000.0 / (CAST(n AS DOUBLE) + 4.0)) AS BIGINT)
               AS wilson_lo_bp,
           CAST(FLOOR(((CAST(r AS DOUBLE) + 2.0)
                + 2.0 * SQRT((CAST(r AS DOUBLE)
                              * CAST(n - r AS DOUBLE))
                             / CAST(n AS DOUBLE) + 1.0))
               * 10000.0 / (CAST(n AS DOUBLE) + 4.0)) AS BIGINT)
               AS wilson_hi_bp
    FROM wk
    """


@_q("wilson_interval_weekly", _SQL_WILSON)
def q_wilson_interval_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WILSON SCORE INTERVALS (z=2, ≈95%) for the weekly return rate —
    the proportion interval that behaves at the boundaries where the
    naive ±z√(p(1−p)/n) collapses (r=0 still yields a positive upper
    bound; nothing ever leaves [0,1]), via the z=2 closed form
    (r+2 ± 2√(r(n−r)/n + 1))/(n+4). The interval layer on top of
    `late_rate_pchart`'s fixed control bands: bands flag points,
    intervals SIZE the uncertainty per point.

    Float discipline exception, justified: inputs are exact int64
    counts < 2⁵³ (exact as doubles); IEEE-754 mandates sqrt and
    divide be CORRECTLY ROUNDED, so the same expression tree over the
    same inputs yields bit-identical doubles on any compliant engine
    — the hash gate itself verifies this claim every run. FLOOR then
    returns to integers. This is the sanctioned route for the
    sqrt-bearing stats family (Wilson, t-stats, Hill) that exact
    integers cannot reach.

    Scale: one fact pass to the weekly census (bounded), row-local
    arithmetic after. Nothing grows with cardinality.
    """
    wk = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(
            F.expr(
                "CAST(datediff(l_shipdate, DATE'1970-01-01') div 7"
                " AS BIGINT)"
            ).alias("week")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum((F.col("l_returnflag") == "R").cast("long"))
            .cast("long")
            .alias("r"),
        )
    )
    half = (
        "2.0 * SQRT((CAST(r AS DOUBLE) * CAST(n - r AS DOUBLE))"
        " / CAST(n AS DOUBLE) + 1.0)"
    )
    return wk.selectExpr(
        "week",
        "n AS n_lines",
        "r AS n_returned",
        "CAST(r * 10000 div n AS BIGINT) AS rate_bp",
        f"CAST(FLOOR(((CAST(r AS DOUBLE) + 2.0) - {half})"
        " * 10000.0 / (CAST(n AS DOUBLE) + 4.0)) AS BIGINT)"
        " AS wilson_lo_bp",
        f"CAST(FLOOR(((CAST(r AS DOUBLE) + 2.0) + {half})"
        " * 10000.0 / (CAST(n AS DOUBLE) + 4.0)) AS BIGINT)"
        " AS wilson_hi_bp",
    )
