"""Round-4 batch 60: order sourcing-mix census, the bullwhip
variance-amplification ratio, and a backlog aging waterfall at a
point-in-time cutoff.

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
# Order sourcing mix: distinct suppliers per order
# ---------------------------------------------------------------------------
_SQL_SOURCING = """
    WITH per_order AS (
        SELECT l_orderkey AS ok,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS cents
        FROM lineitem GROUP BY 1),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_orders FROM per_order)
    SELECT n_supp AS n_suppliers,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) * 10000 // MAX(tot.n_orders) AS BIGINT)
               AS order_share_bp,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents
    FROM per_order, tot GROUP BY 1
    """


@_q("order_sourcing_mix", _SQL_SOURCING)
def q_order_sourcing_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOURCING-MIX CENSUS: how many distinct suppliers fulfill each
    order, rolled up to the distribution (share of orders and revenue
    at 1, 2, 3… suppliers) — the fulfillment-complexity profile that
    prices consolidation ("orders touching 4+ suppliers pay 4×
    shipping") and sizes the blast radius of losing one supplier
    (single-sourced revenue is `hhi_supplier_concentration`'s
    order-grain twin). The count-distinct per order is exact, not
    sketched — per-order line counts are bounded by design.

    Scale: one orderkey-keyed aggregate with an in-group distinct
    (bounded per-order fan-in, so the Expand is cheap), then a
    ≤7-cell rollup. The 1-row total broadcasts.
    """
    per_order = _t(spark, sf_dir, "lineitem").groupBy(
        F.col("l_orderkey").alias("ok")
    ).agg(
        F.countDistinct("l_suppkey").cast("long").alias("n_supp"),
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("cents"),
    )
    tot = per_order.agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    return (
        per_order.crossJoin(F.broadcast(tot))
        .groupBy(F.col("n_supp").alias("n_suppliers"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders_g"),
            F.expr(
                "CAST(COUNT(*) * 10000 div MAX(n_orders) AS BIGINT)"
            ).alias("order_share_bp"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .select(
            "n_suppliers",
            F.col("n_orders_g").alias("n_orders"),
            "order_share_bp",
            "revenue_cents",
        )
    )


# ---------------------------------------------------------------------------
# Bullwhip ratio: order-date vs ship-date daily volume variance
# ---------------------------------------------------------------------------
_SQL_BULLWHIP = f"""
    WITH od AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', o.o_orderdate)
                   AS BIGINT) AS day,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1),
    sd AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', l_shipdate)
                   AS BIGINT) AS day,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
        FROM lineitem GROUP BY 1),
    so AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(q) AS BIGINT) AS s,
               CAST(SUM(q * q) AS BIGINT) AS ss
        FROM od),
    ss2 AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(q) AS BIGINT) AS s,
               CAST(SUM(q * q) AS BIGINT) AS ss
        FROM sd)
    SELECT CAST({_sdiv_sql("(so.n * so.ss - so.s * so.s)", "so.n * so.n")}
               AS BIGINT) AS order_day_var,
           CAST({_sdiv_sql("(ss2.n * ss2.ss - ss2.s * ss2.s)",
                           "ss2.n * ss2.n")} AS BIGINT) AS ship_day_var,
           CAST({_sdiv_sql(
               "(" + _sdiv_sql("(so.n * so.ss - so.s * so.s)",
                               "so.n * so.n") + ") * 1000",
               "GREATEST(" + _sdiv_sql(
                   "(ss2.n * ss2.ss - ss2.s * ss2.s)",
                   "ss2.n * ss2.n") + ", 1)")} AS BIGINT)
               AS bullwhip_milli
    FROM so, ss2
    """


@_q("bullwhip_ratio", _SQL_BULLWHIP)
def q_bullwhip_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BULLWHIP RATIO: variance of daily quantity on the ORDER-date
    axis over variance on the SHIP-date axis — the supply-chain
    amplification metric (ratio > 1000 milli: ordering is spikier
    than fulfillment, i.e. the warehouse absorbs demand shocks;
    < 1000: shipping batches amplify, pushing the whip downstream).
    The same daily volumes viewed through two timestamps of the same
    rows, which is what makes the comparison clean — composition is
    identical, only the TIMING differs. `ship_sla_percentiles`
    measures per-line delay; this measures the FLEET-level smoothing
    that delay buys.

    Scale: two calendar-keyed censuses from one fact table (the
    order-date one rides the orderkey join), three mergeable sums
    each, 1-row arithmetic. Per-echelon bullwhip adds a stage key.
    """
    li = _t(spark, sf_dir, "lineitem")
    od = (
        li.select("l_orderkey", F.col("l_quantity").cast("long").alias("q"))
        .join(
            _t(spark, sf_dir, "orders").select(
                "o_orderkey",
                F.datediff(
                    F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
                )
                .cast("long")
                .alias("day"),
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("day")
        .agg(F.sum("q").cast("long").alias("q"))
    )
    sd = (
        li.select(
            F.datediff(
                F.col("l_shipdate"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("day"),
            F.col("l_quantity").cast("long").alias("q"),
        )
        .groupBy("day")
        .agg(F.sum("q").cast("long").alias("q"))
    )

    def sums(df: DataFrame, p: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("long").alias(f"{p}n"),
            F.sum("q").cast("long").alias(f"{p}s"),
            F.sum(F.col("q") * F.col("q")).cast("long").alias(f"{p}ss"),
        )

    so = sums(od, "o_")
    s2 = sums(sd, "h")
    return (
        so.crossJoin(F.broadcast(s2))
        .selectExpr(
            "CAST("
            + _sdiv_expr("(o_n * o_ss - o_s * o_s)", "o_n * o_n")
            + " AS BIGINT) AS order_day_var",
            "CAST("
            + _sdiv_expr("(hn * hss - hs * hs)", "hn * hn")
            + " AS BIGINT) AS ship_day_var",
            "CAST("
            + _sdiv_expr(
                "("
                + _sdiv_expr("(o_n * o_ss - o_s * o_s)", "o_n * o_n")
                + ") * 1000",
                "GREATEST("
                + _sdiv_expr("(hn * hss - hs * hs)", "hn * hn")
                + ", 1)",
            )
            + " AS BIGINT) AS bullwhip_milli",
        )
    )


# ---------------------------------------------------------------------------
# Backlog aging waterfall at a point-in-time cutoff
# ---------------------------------------------------------------------------
_BA_CUTOFF = "2001-01-01"

_SQL_BACKLOG = f"""
    WITH open_orders AS (
        SELECT o.o_orderkey,
               CAST(date_diff('day', o.o_orderdate,
                              TIMESTAMP '{_BA_CUTOFF}') AS BIGINT) AS age,
               CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders o
        JOIN (SELECT l_orderkey,
                     MAX(l_shipdate) AS last_ship
              FROM lineitem GROUP BY 1) s
          ON o.o_orderkey = s.l_orderkey
        WHERE o.o_orderdate < TIMESTAMP '{_BA_CUTOFF}'
          AND s.last_ship >= TIMESTAMP '{_BA_CUTOFF}'),
    bucketed AS (
        SELECT CASE WHEN age <= 30 THEN '0-30'
                    WHEN age <= 60 THEN '31-60'
                    WHEN age <= 90 THEN '61-90'
                    ELSE '90+' END AS age_bucket,
               cents
        FROM open_orders)
    SELECT age_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS backlog_cents
    FROM bucketed GROUP BY 1
    """


@_q("backlog_aging", _SQL_BACKLOG)
def q_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BACKLOG AGING WATERFALL: orders OPEN at the {cutoff} snapshot
    (placed before it, final shipment after it) bucketed by age into
    the 30/60/90-day waterfall with order count and tied-up revenue
    — the point-in-time receivables-style report whose 90+ bucket is
    the escalation queue. Point-in-time discipline as
    `pit_dim_join`: open-ness is derived from BOTH boundary facts
    (placement date and last shipment), never from a mutable status
    flag, so any historical cutoff replays exactly.

    Scale: the last-ship census is one orderkey-keyed MAX; the open
    set is an equi-join filtered by the two date predicates (both
    pushable to the scans); the waterfall is a 4-cell rollup. Daily
    snapshots would fan the cutoff from a literal to a spine column.
    """
    last_ship = _t(spark, sf_dir, "lineitem").groupBy(
        F.col("l_orderkey").alias("ok")
    ).agg(F.max("l_shipdate").alias("last_ship"))
    open_orders = (
        _t(spark, sf_dir, "orders")
        .where(
            F.col("o_orderdate") < F.lit(_BA_CUTOFF).cast("timestamp")
        )
        .join(
            last_ship.where(
                F.col("last_ship") >= F.lit(_BA_CUTOFF).cast("timestamp")
            ),
            F.col("o_orderkey") == F.col("ok"),
        )
        .select(
            F.datediff(
                F.lit(_BA_CUTOFF).cast("date"), F.col("o_orderdate")
            )
            .cast("long")
            .alias("age"),
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("long")
            .alias("cents"),
        )
    )
    bucketed = open_orders.select(
        F.when(F.col("age") <= 30, "0-30")
        .when(F.col("age") <= 60, "31-60")
        .when(F.col("age") <= 90, "61-90")
        .otherwise("90+")
        .alias("age_bucket"),
        "cents",
    )
    return bucketed.groupBy("age_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("backlog_cents"),
    )
