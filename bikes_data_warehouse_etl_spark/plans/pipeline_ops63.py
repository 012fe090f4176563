"""Round-4 batch 63: Markov steady-state of the spend-quintile chain,
month-end revenue loading, cross-supplier price dispersion, and a
date-inversion data-quality gate.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Markov chain: two power-iteration steps on the quintile transitions
# ---------------------------------------------------------------------------
_SQL_MARKOV = """
    WITH spend AS (
        SELECT o_custkey,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS cents
        FROM orders
        WHERE EXTRACT(YEAR FROM o_orderdate) IN (2000, 2001)
        GROUP BY 1, 2),
    q AS (
        SELECT o_custkey, yr,
               CAST(NTILE(5) OVER (PARTITION BY yr
                                   ORDER BY cents, o_custkey) AS BIGINT)
                   AS quintile
        FROM spend),
    trans AS (
        SELECT a.quintile AS i, b.quintile AS j,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM q a JOIN q b
          ON a.o_custkey = b.o_custkey AND a.yr = 2000 AND b.yr = 2001
        GROUP BY 1, 2),
    p AS (
        SELECT i, j,
               CAST(n * 10000 // SUM(n) OVER (PARTITION BY i) AS BIGINT)
                   AS p_bp
        FROM trans),
    v1 AS (
        SELECT j AS state, CAST(SUM(2000 * p_bp) // 10000 AS BIGINT) AS m
        FROM p GROUP BY 1),
    v2 AS (
        SELECT p.j AS state, CAST(SUM(v1.m * p.p_bp) // 10000 AS BIGINT)
            AS m
        FROM v1 JOIN p ON v1.state = p.i
        GROUP BY 1)
    SELECT v2.state AS quintile, v1.m AS mass_after_1_bp,
           v2.m AS mass_after_2_bp
    FROM v2 JOIN v1 ON v2.state = v1.state
    """


@_q("markov_steady_segments", _SQL_MARKOV)
def q_markov_steady_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MARKOV PROJECTION: the `segment_migration` transition matrix
    row-normalized to basis points and applied TWICE to the uniform
    start vector — where the quintile population is heading if this
    year's dynamics persist (mass_after_2 drifting from uniform
    toward the poles means the tier system polarizes; power
    iteration to the fixed point is more of the same bounded matmul,
    one level per CTE). The projector whose input matrix
    `segment_migration` reports raw; `revenue_decay_projection`
    recurses a scalar, this recurses a VECTOR through a 5×5 kernel.

    Scale: fact work ends at the year-quintile census; each
    iteration is a 25-cell join-aggregate (a matrix-vector product
    on the census) — k steps cost k bounded joins, no fact rescans.
    Quantization: one truncating //10⁴ per step, identical both
    engines; the mass columns drift below 10⁴ total accordingly
    (documented, not renormalized — renormalizing would hide the
    quantization the differential gate is pinning).
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
    q = spend.select(
        "o_custkey",
        "yr",
        F.ntile(5)
        .over(Window.partitionBy("yr").orderBy("cents", "o_custkey"))
        .cast("long")
        .alias("quintile"),
    )
    a = q.where(F.col("yr") == 2000).select(
        F.col("o_custkey").alias("ck"), F.col("quintile").alias("i")
    )
    b = q.where(F.col("yr") == 2001).select(
        F.col("o_custkey").alias("ck2"), F.col("quintile").alias("j")
    )
    trans = (
        a.join(b, F.col("ck") == F.col("ck2"))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    p = trans.select(
        "i",
        "j",
        F.expr(
            "CAST(n * 10000 div SUM(n) OVER (PARTITION BY i) AS BIGINT)"
        ).alias("p_bp"),
    )
    v1 = p.groupBy(F.col("j").alias("state")).agg(
        F.expr("CAST(SUM(2000 * p_bp) div 10000 AS BIGINT)").alias("m")
    )
    v2 = (
        v1.join(p, v1.state == p.i)
        .groupBy(F.col("j").alias("state2"))
        .agg(
            F.expr("CAST(SUM(m * p_bp) div 10000 AS BIGINT)").alias("m2")
        )
    )
    return (
        v2.join(v1, v2.state2 == v1.state)
        .select(
            F.col("state").alias("quintile"),
            F.col("m").alias("mass_after_1_bp"),
            F.col("m2").alias("mass_after_2_bp"),
        )
    )


# ---------------------------------------------------------------------------
# Month-end loading: revenue share landing in the last 3 days
# ---------------------------------------------------------------------------
_SQL_MONTH_END = """
    WITH m AS (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) * 12
                    + EXTRACT(MONTH FROM o_orderdate) - 1 AS BIGINT)
                   AS mabs,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS cents,
               CAST(SUM(CASE WHEN EXTRACT(day FROM o_orderdate)
                                  > EXTRACT(day FROM last_day(
                                        CAST(o_orderdate AS DATE))) - 3
                             THEN CAST(ROUND(o_totalprice * 100, 0)
                                       AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS tail_cents
        FROM orders GROUP BY 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_months,
           CAST(SUM(tail_cents) * 10000 // SUM(cents) AS BIGINT)
               AS month_end_share_bp,
           CAST(MAX(tail_cents * 10000 // cents) AS BIGINT)
               AS worst_month_bp
    FROM m
    """


@_q("month_end_loading", _SQL_MONTH_END)
def q_month_end_loading(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MONTH-END LOADING: the share of each month's revenue booked in
    its LAST THREE calendar days, pooled and worst-month — the
    quota-stuffing / hockey-stick detector every revenue-recognition
    review runs (a uniform month puts ~10% in the last 3 days;
    persistent 2× that means the sales cycle is deadline-driven and
    mid-month forecasts will systematically lag). Calendar-correct
    via last_day(), so February's 3-day tail is the 26th–28th, not a
    fixed day-of-month cut. `milestone_days` paces the YEAR; this
    audits the MONTH's final sprint.

    Scale: one fact pass with a row-local last_day() comparison into
    a months-bounded census; two 1-row reductions. Nothing but the
    scan touches fact cardinality.
    """
    m = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
            .cast("long")
            .alias("mabs")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents"),
            F.sum(
                F.when(
                    F.dayofmonth("o_orderdate")
                    > F.dayofmonth(F.last_day("o_orderdate")) - 3,
                    F.round(F.col("o_totalprice") * 100, 0).cast("long"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("tail_cents"),
        )
    )
    return m.agg(
        F.count(F.lit(1)).cast("long").alias("n_months"),
        F.expr(
            "CAST(SUM(tail_cents) * 10000 div SUM(cents) AS BIGINT)"
        ).alias("month_end_share_bp"),
        F.expr(
            "CAST(MAX(tail_cents * 10000 div cents) AS BIGINT)"
        ).alias("worst_month_bp"),
    )


# ---------------------------------------------------------------------------
# Cross-supplier price dispersion per part
# ---------------------------------------------------------------------------
_SQL_DISPERSION_PRICE = """
    WITH unit AS (
        SELECT l_partkey AS pk, l_suppkey AS sk,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                    * 1000
                    // SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                   AS unit_milli
        FROM lineitem
        WHERE l_quantity > 0
        GROUP BY 1, 2),
    spread AS (
        SELECT pk, CAST(COUNT(*) AS BIGINT) AS n_supp,
               CAST(MIN(unit_milli) AS BIGINT) AS lo,
               CAST(MAX(unit_milli) AS BIGINT) AS hi
        FROM unit GROUP BY 1
        HAVING COUNT(*) >= 2),
    scored AS (
        SELECT pk, n_supp,
               CAST((hi - lo) * 10000 // lo AS BIGINT) AS spread_bp
        FROM spread WHERE lo > 0)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_multi_sourced_parts,
           CAST(SUM(spread_bp) // COUNT(*) AS BIGINT) AS mean_spread_bp,
           CAST(MAX(spread_bp) AS BIGINT) AS max_spread_bp,
           CAST(SUM(CASE WHEN spread_bp > 2000 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_parts_over_20pct
    FROM scored
    """


@_q("price_dispersion_parts", _SQL_DISPERSION_PRICE)
def q_price_dispersion_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRICE DISPERSION: for every multi-sourced part, the spread
    between its cheapest and dearest supplier's realized unit price
    (max−min over min, basis points) — the procurement-arbitrage
    scan whose n_parts_over_20pct column is the negotiation target
    list ("we pay supplier A 20% more than supplier B for the SAME
    part"). Realized unit price = yearly spend/quantity per
    (part, supplier), so one-off promo lines don't fake dispersion
    the way per-line min/max would. `weighted_median_price` profiles
    a brand's price LEVEL; this profiles cross-supplier
    INCONSISTENCY at identical goods.

    Scale: one fact pass to the (part, supplier) unit-price census —
    bounded composite key, map-side combined — then a part-keyed
    min/max rollup and a 1-row summary. The per-part detail table is
    the same query minus the final rollup.
    """
    unit = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") > 0)
        .groupBy(
            F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))"
                " * 1000 div SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)"
            ).alias("unit_milli")
        )
    )
    spread = (
        unit.groupBy("pk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_supp"),
            F.min("unit_milli").cast("long").alias("lo"),
            F.max("unit_milli").cast("long").alias("hi"),
        )
        .where(F.col("n_supp") >= 2)
        .where(F.col("lo") > 0)
        .selectExpr(
            "CAST((hi - lo) * 10000 div lo AS BIGINT) AS spread_bp"
        )
    )
    return spread.agg(
        F.count(F.lit(1)).cast("long").alias("n_multi_sourced_parts"),
        F.expr("CAST(SUM(spread_bp) div COUNT(*) AS BIGINT)").alias(
            "mean_spread_bp"
        ),
        F.max("spread_bp").cast("long").alias("max_spread_bp"),
        F.sum((F.col("spread_bp") > 2000).cast("long"))
        .cast("long")
        .alias("n_parts_over_20pct"),
    )


# ---------------------------------------------------------------------------
# Date-inversion data-quality gate
# ---------------------------------------------------------------------------
_SQL_DATE_INVERSIONS = """
    WITH j AS (
        SELECT CAST(date_diff('day', o.o_orderdate, l.l_shipdate)
                   AS BIGINT) AS lag
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN lag < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_ship_before_order,
           CAST(SUM(CASE WHEN lag > 365 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_lag_over_1y,
           CAST(MIN(lag) AS BIGINT) AS min_lag_days,
           CAST(MAX(lag) AS BIGINT) AS max_lag_days
    FROM j
    """


@_q("dq_date_inversions", _SQL_DATE_INVERSIONS)
def q_dq_date_inversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPORAL-INTEGRITY GATE: lines shipped BEFORE their order was
    placed (physically impossible — a loader bug, clock skew, or a
    join against the wrong key) and lines lagging over a year
    (process outliers worth a look), plus the observed lag envelope.
    The causality cousin of `dq_orphans` (referential integrity) —
    every derived duration in the repo (`littles_law_check`,
    `ship_sla_percentiles`, `backlog_aging`) silently assumes this
    gate is clean, which is exactly why it must run first and
    scream loudly.

    Scale: one orderkey equi-join (the repo's cheapest fact⋈fact
    shape) with row-local lag arithmetic into a 1-row reduction; at
    100 TB the join is the dominant cost and shares its exchange
    with any other order-grain audit batched alongside.
    """
    j = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .join(
            _t(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderdate"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
            .cast("long")
            .alias("lag")
        )
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum((F.col("lag") < 0).cast("long"))
        .cast("long")
        .alias("n_ship_before_order"),
        F.sum((F.col("lag") > 365).cast("long"))
        .cast("long")
        .alias("n_lag_over_1y"),
        F.min("lag").cast("long").alias("min_lag_days"),
        F.max("lag").cast("long").alias("max_lag_days"),
    )
