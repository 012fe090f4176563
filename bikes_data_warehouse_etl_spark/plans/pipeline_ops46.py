"""Round-4 batch 46: isotonic regression by the minimax interval
formula, Tukey median polish of the weekday × month revenue grid, and
a duplicate-charge audit.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Isotonic regression of return rate on discount level (minimax PAV)
# ---------------------------------------------------------------------------
_SQL_ISOTONIC = """
    WITH lev AS (
        SELECT CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS x,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                   AS BIGINT) AS r
        FROM lineitem GROUP BY 1),
    iv AS (
        SELECT a.x AS j, b.x AS k,
               CAST(SUM(c.r) * 10000 // SUM(c.n) AS BIGINT) AS wavg_bp
        FROM lev a
        JOIN lev b ON b.x >= a.x
        JOIN lev c ON c.x BETWEEN a.x AND b.x
        GROUP BY 1, 2),
    inner_min AS (
        SELECT l.x, iv.j, CAST(MIN(iv.wavg_bp) AS BIGINT) AS m
        FROM lev l JOIN iv ON iv.j <= l.x AND iv.k >= l.x
        GROUP BY 1, 2)
    SELECT i.x AS discount_pct,
           CAST(l.r * 10000 // l.n AS BIGINT) AS raw_rate_bp,
           CAST(MAX(i.m) AS BIGINT) AS iso_rate_bp,
           l.n AS n_lines
    FROM inner_min i JOIN lev l ON l.x = i.x
    GROUP BY 1, 2, 4
    """


@_q("isotonic_calibration", _SQL_ISOTONIC)
def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISOTONIC REGRESSION (pool-adjacent-violators) of return rate on
    discount level, computed NOT by the sequential pooling loop but by
    the minimax identity iso(x) = max_{j≤x} min_{k≥x} wavg(j..k) over
    all level intervals containing x — the closed form that turns
    PAV's "inherently iterative" pooling into three joins over the
    11-level domain. The monotone-fit calibrator behind isotonic
    probability calibration and monotone dose-response curves;
    `decile_lift` ranks a score, this FITS the best monotone response
    to it. Weighted correctly (each interval average pools raw counts,
    not rates), integer basis points end-to-end.

    Scale: the fact stream collapses to the LEVEL census first
    (11 rows, map-side combine) — the minimax join lattice runs on
    intervals of an 11-value domain (66 intervals), driver-free and
    constant-cost at any fact cardinality. A 10³-level domain would
    switch to the O(n) stack PAV via `applyInPandas` on one partition
    — the documented upgrade; the identity gives the oracle either
    way.
    """
    li = _t(spark, sf_dir, "lineitem")
    lev = li.groupBy(
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("x")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("l_returnflag") == "R").cast("long"))
        .cast("long")
        .alias("r"),
    )
    a = lev.select(F.col("x").alias("j"))
    bn = lev.select(F.col("x").alias("k"))
    c = lev.select(F.col("x").alias("cx"), "n", "r")
    iv = (
        a.join(bn, F.col("k") >= F.col("j"))
        .join(c, (F.col("cx") >= F.col("j")) & (F.col("cx") <= F.col("k")))
        .groupBy("j", "k")
        .agg(
            F.expr("CAST(SUM(r) * 10000 div SUM(n) AS BIGINT)").alias(
                "wavg_bp"
            )
        )
    )
    l2 = lev.select(F.col("x"), "n", "r")
    inner_min = (
        l2.select("x")
        .join(iv, (F.col("j") <= F.col("x")) & (F.col("k") >= F.col("x")))
        .groupBy("x", "j")
        .agg(F.min("wavg_bp").cast("long").alias("m"))
    )
    return (
        inner_min.groupBy("x")
        .agg(F.max("m").cast("long").alias("iso_rate_bp"))
        .join(l2, "x")
        .select(
            F.col("x").alias("discount_pct"),
            F.expr("CAST(r * 10000 div n AS BIGINT)").alias("raw_rate_bp"),
            "iso_rate_bp",
            F.col("n").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Tukey median polish of the weekday x month revenue grid
# ---------------------------------------------------------------------------
_SQL_MEDIAN_POLISH = """
    WITH grid AS (
        SELECT CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mth,
               CAST((CAST(EXTRACT(dow FROM o_orderdate) AS BIGINT) + 6) % 7
                   AS BIGINT) AS dow,
               CAST(SUM(CAST(ROUND(o_totalprice, 0) AS BIGINT)) AS BIGINT)
                   AS v
        FROM orders GROUP BY 1, 2),
    rowmed AS (
        SELECT dow, CAST(MAX(v) FILTER (WHERE rk * 2 <= n + 1) AS BIGINT)
            AS rmed
        FROM (SELECT dow, v,
                     ROW_NUMBER() OVER (PARTITION BY dow
                                        ORDER BY v, mth) AS rk,
                     COUNT(*) OVER (PARTITION BY dow) AS n
              FROM grid)
        GROUP BY 1),
    r1 AS (
        SELECT g.mth, g.dow, g.v - rm.rmed AS v, rm.rmed
        FROM grid g JOIN rowmed rm ON g.dow = rm.dow),
    colmed AS (
        SELECT mth, CAST(MAX(v) FILTER (WHERE rk * 2 <= n + 1) AS BIGINT)
            AS cmed
        FROM (SELECT mth, v,
                     ROW_NUMBER() OVER (PARTITION BY mth
                                        ORDER BY v, dow) AS rk,
                     COUNT(*) OVER (PARTITION BY mth) AS n
              FROM r1)
        GROUP BY 1)
    SELECT r1.dow AS dow, r1.mth AS mth,
           CAST(r1.rmed AS BIGINT) AS weekday_effect_dollars,
           CAST(cm.cmed AS BIGINT) AS month_effect_dollars,
           CAST(r1.v - cm.cmed AS BIGINT) AS residual_dollars
    FROM r1 JOIN colmed cm ON r1.mth = cm.mth
    """


@_q("median_polish_weekday_month", _SQL_MEDIAN_POLISH)
def q_median_polish_weekday_month(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TUKEY MEDIAN POLISH (one sweep each way): the weekday × month
    revenue grid decomposed into a weekday effect (row LOWER-median),
    a month effect (column lower-median of the row residuals), and a
    residual — the robust two-way decomposition that ANOVA-style
    means (`weekday_seasonality_strength`) can't protect from a
    single outlier cell. Residuals far from zero flag
    weekday-month interactions (e.g. "December Saturdays"). Lower
    medians (rank ⌈n/2⌉ with a deterministic in-group tie order) keep
    every effect an exact integer both engines agree on.

    Scale: the grid census is map-side combined to ≤84 cells; every
    window partitions by a ≤12-value key over ≤12 rows. The polish
    costs nothing at any fact cardinality — the classic full-polish
    iterates the two sweeps to convergence, each sweep this same
    bounded shape.
    """
    o = _t(spark, sf_dir, "orders")
    grid = o.groupBy(
        F.month("o_orderdate").cast("long").alias("mth"),
        ((F.dayofweek("o_orderdate") + 5) % 7).cast("long").alias("dow"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice"), 0).cast("long"))
        .cast("long")
        .alias("v")
    )
    rw = Window.partitionBy("dow").orderBy("v", "mth")
    rn = Window.partitionBy("dow")
    rowmed = (
        grid.select(
            "dow",
            "v",
            F.row_number().over(rw).alias("rk"),
            F.count(F.lit(1)).over(rn).alias("n"),
        )
        .where(F.col("rk") * 2 <= F.col("n") + 1)
        .groupBy("dow")
        .agg(F.max("v").cast("long").alias("rmed"))
    )
    r1 = grid.join(rowmed, "dow").select(
        "mth", "dow", (F.col("v") - F.col("rmed")).alias("v"), "rmed"
    )
    cw = Window.partitionBy("mth").orderBy("v", "dow")
    cn = Window.partitionBy("mth")
    colmed = (
        r1.select(
            "mth",
            "v",
            F.row_number().over(cw).alias("rk"),
            F.count(F.lit(1)).over(cn).alias("n"),
        )
        .where(F.col("rk") * 2 <= F.col("n") + 1)
        .groupBy("mth")
        .agg(F.max("v").cast("long").alias("cmed"))
    )
    return r1.join(colmed, "mth").select(
        "dow",
        "mth",
        F.col("rmed").cast("long").alias("weekday_effect_dollars"),
        F.col("cmed").cast("long").alias("month_effect_dollars"),
        (F.col("v") - F.col("cmed")).cast("long").alias("residual_dollars"),
    )


# ---------------------------------------------------------------------------
# Duplicate-charge audit
# ---------------------------------------------------------------------------
_SQL_DUP_CHARGE = """
    WITH o AS (
        SELECT o_orderkey AS ok, o_custkey AS ck,
               CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
               CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS BIGINT) AS day
        FROM orders)
    SELECT a.ck AS o_custkey, a.ok AS orderkey_a, b.ok AS orderkey_b,
           CAST(abs(a.cents - b.cents) AS BIGINT) AS cents_gap,
           CAST(abs(a.cents - b.cents) * 10000
                // GREATEST(LEAST(a.cents, b.cents), 1) AS BIGINT)
               AS gap_bp
    FROM o a JOIN o b
      ON a.ck = b.ck AND a.day = b.day AND a.ok < b.ok
    """


@_q("dup_charge_audit", _SQL_DUP_CHARGE)
def q_dup_charge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOUBLE-CHARGE AUDIT: same-customer order pairs placed the SAME
    DAY, with the cent gap and relative gap between their totals —
    the billing screen for double-submits and split charges (gap_bp =
    0 is a textbook duplicate; small gaps are retries after a price
    tweak; the analyst thresholds downstream because a refund needs
    the evidence row either way). ID-canonical pair order (ok_a <
    ok_b) keeps each incident one row. The transactional sibling of
    `event_debounce` (which collapses rapid-fire events; this AUDITS
    rather than collapses).

    Scale: the self-join keys on (customer, day) — per-key fan-out is
    the customer's SAME-DAY order count (~1; 355 pairs from 150k
    orders at sf0.1), so the join output is the anomaly set, not a
    cross product. A pathological tenant (one account, thousands of
    same-day orders) gets the `salted_join_revenue` treatment or a
    per-key cap with an overflow ledger.
    """
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_custkey").alias("ck"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day"),
    )
    a = o.select(
        F.col("ck").alias("a_ck"),
        F.col("ok").alias("a_ok"),
        F.col("cents").alias("a_cents"),
        F.col("day").alias("a_day"),
    )
    b = o.select(
        F.col("ck").alias("b_ck"),
        F.col("ok").alias("b_ok"),
        F.col("cents").alias("b_cents"),
        F.col("day").alias("b_day"),
    )
    return (
        a.join(
            b,
            (F.col("a_ck") == F.col("b_ck"))
            & (F.col("a_day") == F.col("b_day"))
            & (F.col("a_ok") < F.col("b_ok")),
        )
        .select(
            F.col("a_ck").alias("o_custkey"),
            F.col("a_ok").alias("orderkey_a"),
            F.col("b_ok").alias("orderkey_b"),
            F.abs(F.col("a_cents") - F.col("b_cents"))
            .cast("long")
            .alias("cents_gap"),
            F.expr(
                "CAST(abs(a_cents - b_cents) * 10000"
                " div GREATEST(LEAST(a_cents, b_cents), 1) AS BIGINT)"
            ).alias("gap_bp"),
        )
    )
