"""Round-4 batch 59: ABC-XYZ inventory classification, newsvendor
critical-fractile stocking from the exact demand histogram, and
dead-stock detection.

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
# ABC-XYZ classification of parts
# ---------------------------------------------------------------------------
_SQL_ABC_XYZ = f"""
    WITH per_part AS (
        SELECT l_partkey AS pk,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS cents
        FROM lineitem GROUP BY 1),
    monthly AS (
        SELECT l_partkey AS pk,
               CAST(EXTRACT(YEAR FROM l_shipdate) * 12
                    + EXTRACT(MONTH FROM l_shipdate) - 1 AS BIGINT) AS mabs,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
        FROM lineitem GROUP BY 1, 2),
    b AS (SELECT MAX(mabs) - MIN(mabs) + 1 AS nm FROM monthly),
    varq AS (
        SELECT pk,
               CAST(SUM(q) * 1000 // (SELECT nm FROM b) AS BIGINT)
                   AS mean_milli,
               CAST({_sdiv_sql(
                   "((SELECT nm FROM b) * SUM(q * q) - SUM(q) * SUM(q))"
                   " * 1000",
                   "(SELECT nm FROM b) * (SELECT nm FROM b)")} AS BIGINT)
                   AS var_milli
        FROM monthly GROUP BY 1),
    abc AS (
        SELECT p.pk, p.cents,
               CAST(SUM(p.cents) OVER (ORDER BY p.cents DESC, p.pk)
                   AS BIGINT) AS cum,
               CAST(SUM(p.cents) OVER () AS BIGINT) AS tot
        FROM per_part p),
    classed AS (
        SELECT a.pk,
               CASE WHEN a.cum * 100 <= a.tot * 80 THEN 'A'
                    WHEN a.cum * 100 <= a.tot * 95 THEN 'B'
                    ELSE 'C' END AS abc,
               CASE WHEN v.var_milli * 1000
                         <= 250 * v.mean_milli * v.mean_milli // 1000
                    THEN 'X'
                    WHEN v.var_milli * 1000
                         <= 1000 * v.mean_milli * v.mean_milli // 1000
                    THEN 'Y'
                    ELSE 'Z' END AS xyz
        FROM abc a JOIN varq v ON a.pk = v.pk)
    SELECT abc, xyz, CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM classed GROUP BY 1, 2
    """


@_q("abc_xyz_classification", _SQL_ABC_XYZ)
def q_abc_xyz_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-XYZ MATRIX: every part classified by revenue importance
    (A = the parts covering the top 80% of cumulative revenue, B to
    95%, C the tail) crossed with demand PREDICTABILITY (X/Y/Z by
    squared coefficient of variation of monthly quantity — CV² ≤
    0.25 / ≤ 1.0 / above, computed sqrt-free as var·1000 ≤
    k·mean²/1000) — the 9-cell planning matrix that decides stocking
    policy per cell (AX: automate replenishment; CZ: make-to-order).
    Combines `pareto_suppliers`' cumulative-share cut with
    `dispersion_index`'s variability lens, per part, with zero-month
    gaps counted as zero demand via the global month span.

    Scale: two part-keyed censuses (revenue; monthly quantity) from
    one fact table; the ABC cumulative window sorts the PART domain
    (histogram-rank upgrade as `rfm_segments`); CV² banding is
    row-local; the output is 9 cells.
    """
    li = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("cents")
    )
    monthly = li.groupBy(
        F.col("l_partkey").alias("pk"),
        (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1)
        .cast("long")
        .alias("mabs"),
    ).agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"))
    b = monthly.agg(
        (F.max("mabs") - F.min("mabs") + 1).cast("long").alias("nm")
    )
    varq = (
        monthly.groupBy("pk")
        .agg(
            F.sum("q").cast("long").alias("sq"),
            F.sum(F.col("q") * F.col("q")).cast("long").alias("sqq"),
        )
        .crossJoin(F.broadcast(b))
        .selectExpr(
            "pk",
            "CAST(sq * 1000 div nm AS BIGINT) AS mean_milli",
            "CAST("
            + _sdiv_expr("(nm * sqq - sq * sq) * 1000", "nm * nm")
            + " AS BIGINT) AS var_milli",
        )
    )
    aw = Window.orderBy(F.col("cents").desc(), "pk")
    abc = per_part.select(
        "pk",
        F.sum("cents").over(aw).cast("long").alias("cum"),
        F.sum("cents").over(Window.partitionBy()).cast("long").alias("tot"),
    )
    classed = abc.join(varq, "pk").selectExpr(
        "CASE WHEN cum * 100 <= tot * 80 THEN 'A'"
        " WHEN cum * 100 <= tot * 95 THEN 'B' ELSE 'C' END AS abc",
        "CASE WHEN var_milli * 1000"
        " <= 250 * mean_milli * mean_milli div 1000 THEN 'X'"
        " WHEN var_milli * 1000"
        " <= 1000 * mean_milli * mean_milli div 1000 THEN 'Y'"
        " ELSE 'Z' END AS xyz",
    )
    return classed.groupBy("abc", "xyz").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts")
    )


# ---------------------------------------------------------------------------
# Newsvendor critical-fractile stock level per brand
# ---------------------------------------------------------------------------
_NV_FRACTILE_BP = 8000  # cu/(cu+co) = 0.8

_SQL_NEWSVENDOR = f"""
    WITH monthly AS (
        SELECT p.p_brand AS brand,
               CAST(EXTRACT(YEAR FROM l.l_shipdate) * 12
                    + EXTRACT(MONTH FROM l.l_shipdate) - 1 AS BIGINT)
                   AS mabs,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2),
    hist AS (
        SELECT brand, q, CAST(COUNT(*) AS BIGINT) AS w
        FROM monthly GROUP BY 1, 2),
    cum AS (
        SELECT brand, q, w,
               CAST(SUM(w) OVER (PARTITION BY brand ORDER BY q)
                   AS BIGINT) AS cw,
               CAST(SUM(w) OVER (PARTITION BY brand) AS BIGINT) AS tw
        FROM hist)
    SELECT brand AS p_brand,
           CAST(MIN(q) AS BIGINT) AS stock_level_qty,
           CAST(MIN(tw) AS BIGINT) AS n_months
    FROM cum WHERE cw * 10000 >= tw * {_NV_FRACTILE_BP}
    GROUP BY 1
    """


@_q("newsvendor_stock", _SQL_NEWSVENDOR)
def q_newsvendor_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEWSVENDOR STOCKING: per brand, the monthly stock level that
    solves the critical-fractile condition — the smallest quantity
    whose empirical demand CDF reaches cu/(cu+co) = 80% — i.e. the
    EXACT quantile of observed monthly demand, read off the
    cumulative histogram with integer cross-multiplication (cw·10⁴ ≥
    tw·8000). The inventory-theory optimum that
    `inventory_clamped_balance`'s flat replenishment ignores, and the
    20%-stockout-tolerance answer to "how much should we hold?".
    Distribution-free: no normality, just the histogram.

    Scale: the monthly demand census collapses map-side to (brand,
    month) then to the (brand, qty) histogram; the cumulative window
    partitions by brand over observed-quantity levels (bounded).
    The same shape answers any service level by changing one
    constant — and `weighted_median_price` is this query at 5000 bp.
    """
    monthly = (
        _t(spark, sf_dir, "lineitem")
        .join(
            _t(spark, sf_dir, "part").select("p_partkey", "p_brand"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(
            F.col("p_brand").alias("brand"),
            (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1)
            .cast("long")
            .alias("mabs"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q")
        )
    )
    hist = monthly.groupBy("brand", "q").agg(
        F.count(F.lit(1)).cast("long").alias("w")
    )
    bw = Window.partitionBy("brand")
    cum = hist.select(
        "brand",
        "q",
        F.sum("w").over(bw.orderBy("q")).cast("long").alias("cw"),
        F.sum("w").over(bw).cast("long").alias("tw"),
    )
    return (
        cum.where(F.col("cw") * 10000 >= F.col("tw") * _NV_FRACTILE_BP)
        .groupBy(F.col("brand").alias("p_brand"))
        .agg(
            F.min("q").cast("long").alias("stock_level_qty"),
            F.min("tw").cast("long").alias("n_months"),
        )
    )


# ---------------------------------------------------------------------------
# Dead-stock detection
# ---------------------------------------------------------------------------
_DS_DAYS = 180

_SQL_DEAD_STOCK = f"""
    WITH per_part AS (
        SELECT l_partkey AS pk,
               CAST(MAX(date_diff('day', DATE '1970-01-01', l_shipdate))
                   AS BIGINT) AS last_day,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS life_qty
        FROM lineitem GROUP BY 1),
    mx AS (SELECT MAX(last_day) AS horizon FROM per_part),
    flagged AS (
        SELECT p.pk, p.life_qty,
               CAST(m.horizon - p.last_day AS BIGINT) AS idle_days
        FROM per_part p, mx m)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(CASE WHEN idle_days > {_DS_DAYS} THEN 1 ELSE 0 END)
               AS BIGINT) AS n_dead,
           CAST(SUM(CASE WHEN idle_days > {_DS_DAYS} THEN life_qty
                         ELSE 0 END) AS BIGINT) AS dead_lifetime_qty,
           CAST(SUM(CASE WHEN idle_days > {_DS_DAYS} THEN 1 ELSE 0 END)
                * 10000 // COUNT(*) AS BIGINT) AS dead_share_bp
    FROM flagged
    """


@_q("dead_stock_detection", _SQL_DEAD_STOCK)
def q_dead_stock_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEAD-STOCK SCREEN: parts with NO shipment in the trailing 180
    days of the data horizon, counted with their lifetime volume —
    the working-capital audit that feeds clearance decisions
    (`abc_xyz_classification` says how to stock what moves; this
    finds what STOPPED moving, the C/Z cell's terminal state). The
    idle threshold is measured against the data's own horizon so the
    query is reproducible on any snapshot.

    Scale: one part-keyed MAX/SUM census (map-side combined), a
    1-row horizon broadcast, a 1-row rollup — the cheapest possible
    shape for a full-catalog screen; a per-warehouse variant adds
    the location key to the census.
    """
    per_part = _t(spark, sf_dir, "lineitem").groupBy(
        F.col("l_partkey").alias("pk")
    ).agg(
        F.max(
            F.datediff(
                F.col("l_shipdate"), F.lit("1970-01-01").cast("date")
            )
        )
        .cast("long")
        .alias("last_day"),
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias(
            "life_qty"
        ),
    )
    mx = per_part.agg(F.max("last_day").alias("horizon"))
    flagged = per_part.crossJoin(F.broadcast(mx)).select(
        "life_qty",
        (F.col("horizon") - F.col("last_day")).cast("long").alias(
            "idle_days"
        ),
    )
    return flagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum((F.col("idle_days") > _DS_DAYS).cast("long"))
        .cast("long")
        .alias("n_dead"),
        F.sum(
            F.when(F.col("idle_days") > _DS_DAYS, F.col("life_qty")).otherwise(
                0
            )
        )
        .cast("long")
        .alias("dead_lifetime_qty"),
        F.expr(
            f"CAST(SUM(CASE WHEN idle_days > {_DS_DAYS} THEN 1 ELSE 0 END)"
            " * 10000 div COUNT(*) AS BIGINT)"
        ).alias("dead_share_bp"),
    )
