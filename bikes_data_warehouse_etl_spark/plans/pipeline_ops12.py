"""Classic reporting-query shapes, round 2 batch 12 — the TPC-H
Q1/Q3/Q4/Q6/Q10/Q14 patterns on the synthetic schema: the pricing
summary, top-k unshipped revenue, EXISTS-with-inequality order
priority, single-scan forecast delta, returned-item reporting, and
conditional revenue share.

Together with pipeline_ops11 (Q2/Q11/Q13/Q15/Q22) this completes the
TPC-H query-shape families expressible on the driver schema (no
partsupp / commit-receipt-shipmode columns, so Q8/Q9/Q12/Q16-21 are
either impossible verbatim or covered by an equivalent shape
elsewhere: Q7 = `nation_trade_matrix`, Q18's HAVING-in set =
`semi_join_urgent_customers` family).

Standing contract: integer cross-engine arithmetic (cents / bp),
identical column aliases on both sides, deterministic total orders
under every LIMIT, scale note per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Q1: pricing summary report
# ---------------------------------------------------------------------------
_SQL_PRICING_SUMMARY = """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS BIGINT)
               AS sum_qty_cents,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
               AS BIGINT) AS sum_base_cents,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                         AS BIGINT)) AS BIGINT) AS sum_disc_cents,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                               * (1 + l_tax) * 100, 0) AS BIGINT))
               AS BIGINT) AS sum_charge_cents,
           CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT))
                // COUNT(*) AS BIGINT) AS avg_qty_cents,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                // COUNT(*) AS BIGINT) AS avg_price_cents,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """


@_q("pricing_summary", _SQL_PRICING_SUMMARY)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: the canonical pricing-summary report — per
    (returnflag, linestatus), sums of quantity / base price /
    discounted price / charged price, averages, and row counts, over
    all lines shipped on or before a cutoff. Every amount is rounded
    to integer cents AT THE ROW before summing, and the averages are
    integer `div` of those sums — bit-identical across engines (the
    float `ROUND(AVG(double))` form is the classic cross-engine trap).

    Scale: THE benchmark for map-side combine — 6 key groups total,
    so partial aggregation reduces each input partition to ≤6 rows
    and the single shuffle carries a few hundred bytes per task
    regardless of fact size. The cutoff predicate pushes to the scan.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp")
    )
    cents = lambda c: F.round(c * 100, 0).cast("long")  # noqa: E731
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.select(
            "l_returnflag",
            "l_linestatus",
            cents(F.col("l_quantity")).alias("q"),
            cents(F.col("l_extendedprice")).alias("b"),
            cents(disc).alias("d"),
            cents(disc * (1 + F.col("l_tax"))).alias("ch"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("q").cast("long").alias("sum_qty_cents"),
            F.sum("b").cast("long").alias("sum_base_cents"),
            F.sum("d").cast("long").alias("sum_disc_cents"),
            F.sum("ch").cast("long").alias("sum_charge_cents"),
            F.expr("CAST(SUM(q) div COUNT(*) AS LONG)").alias(
                "avg_qty_cents"
            ),
            F.expr("CAST(SUM(b) div COUNT(*) AS LONG)").alias(
                "avg_price_cents"
            ),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Q3: shipping-priority top-k
# ---------------------------------------------------------------------------
_SQL_SHIPPING_PRIORITY = """
    SELECT l_orderkey,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                         AS BIGINT)) AS BIGINT) AS revenue_cents,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '2000-03-15'
      AND l_shipdate  > TIMESTAMP '2000-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue_cents DESC, o_orderdate, l_orderkey
    LIMIT 10
    """


@_q("shipping_priority", _SQL_SHIPPING_PRIORITY)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: the 10 highest-revenue orders placed before a date in
    one market segment whose lines ship after it — the classic
    "unshipped backlog" report. The ORDER BY is made a TOTAL order
    (revenue, orderdate, orderkey) so LIMIT 10 is deterministic and
    hash-comparable across engines — an under-specified top-k with
    ties at the boundary is not a well-defined query.

    Scale: both filters reach their scans (segment on customer, dates
    on orders/lineitem) BEFORE any join, the orderkey rollup reuses
    the lineitem-side join partitioning, and the top-10 is
    TakeOrderedAndProject — per-partition heaps, no global sort.
    """
    c = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("2000-03-15").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("2000-03-15").cast("timestamp")
    ).select(
        "l_orderkey",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
        ).cast("long").alias("cents"),
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum("cents").cast("long").alias("revenue_cents"))
        .select("l_orderkey", "revenue_cents", "o_orderdate")
        .orderBy(
            F.col("revenue_cents").desc(), "o_orderdate", "l_orderkey"
        )
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q4: order-priority EXISTS with an inequality correlate
# ---------------------------------------------------------------------------
_SQL_LATE_ORDER_PRIORITY = """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01'
      AND o_orderdate <  TIMESTAMP '2000-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """


@_q("late_order_priority", _SQL_LATE_ORDER_PRIORITY)
def q_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4's shape with the schema's columns: orders from one
    half-year having AT LEAST ONE line shipped more than 60 days
    after the order date, counted by priority. The correlated EXISTS
    carries an INEQUALITY against the outer row (`l_shipdate >
    o_orderdate + 60d`), so it decorrelates to a left-semi join with
    a mixed equi + non-equi condition — the semi join dedups
    multi-late-line orders for free (no DISTINCT pass).

    Scale: the date range pushes into the orders scan (~1/13 of
    rows); the semi join shuffles on orderkey with the inequality
    evaluated post-match; the final groupBy is 5 priority keys,
    fully map-side combined.
    """
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q6: forecast revenue change — single-scan filtered sum
# ---------------------------------------------------------------------------
_SQL_REVENUE_DELTA = """
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 100, 0)
                         AS BIGINT)) AS BIGINT) AS revenue_delta_cents,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01'
      AND l_shipdate <  TIMESTAMP '2001-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """


@_q("forecast_revenue_delta", _SQL_REVENUE_DELTA)
def q_forecast_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue that would be gained by eliminating small
    discounts on low-quantity lines in one year — a pure
    filter-and-sum with NO join and NO grouping. The discount
    comparisons are against the same stored doubles in both engines
    (no arithmetic before the compare), so the row set is identical;
    the summed amount is rounded to cents per row.

    Scale: the simplest possible plan and the purest pushdown test —
    all three predicates land in PushedFilters, the scan reads 4
    columns of 11, and the global sum is a two-level reduce
    (partial per partition → single row). At 100 TB this is
    bandwidth-bound, exactly as it should be.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2001-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(
            F.round(F.col("l_extendedprice") * F.col("l_discount") * 100, 0)
            .cast("long")
        ).cast("long").alias("revenue_delta_cents"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Q10: returned-item reporting top-k
# ---------------------------------------------------------------------------
_SQL_RETURNED_ITEMS = """
    SELECT c_custkey, c_name, n_name AS nation,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '2000-10-01'
      AND o_orderdate <  TIMESTAMP '2001-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue_cents DESC, c_custkey
    LIMIT 20
    """


@_q("returned_items_topk", _SQL_RETURNED_ITEMS)
def q_returned_items_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: the 20 customers who returned the most revenue in
    one quarter — the canonical "who is hurting us" report. Total
    order under the LIMIT via the unique custkey tiebreak.

    Scale: returnflag and the quarter push into the two fact scans
    before the orderkey-shuffle join; the customer rollup groups on
    the already-co-partitioned custkey; nation broadcasts. The top-20
    is TakeOrderedAndProject. Customer is deliberately NOT broadcast
    (it scales with the fact — the r1 verdict's §3 lesson).
    """
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("2000-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2001-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    ).select(
        "l_orderkey",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
        ).cast("long").alias("cents"),
    )
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.sum("cents").cast("long").alias("revenue_cents"))
        .orderBy(F.col("revenue_cents").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q14: conditional revenue share (promo effect)
# ---------------------------------------------------------------------------
_SQL_PROMO_SHARE = """
    WITH j AS (
        SELECT CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                    AS BIGINT) AS cents,
               p_type
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '2000-09-01'
          AND l_shipdate <  TIMESTAMP '2000-10-01')
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END)
                AS BIGINT) AS promo_cents,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(SUM(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END)
                * 10000 // SUM(cents) AS BIGINT) AS promo_bp
    FROM j
    """


@_q("promo_revenue_share", _SQL_PROMO_SHARE)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: the share of one month's revenue attributable to
    promotional parts, in integer basis points — the conditional-sum-
    over-a-join pattern (`SUM(CASE WHEN …) / SUM(…)` as one pass,
    never two queries).

    Scale: the month filter cuts lineitem ~1/80 at the scan; the part
    join is left UNHINTED — part is dimension-sized here but scales
    with the catalog, so AQE picks broadcast vs shuffle from runtime
    stats. Both conditional sums fold into ONE aggregate over the
    join output; the ratio is computed on the final single row.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("2000-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-10-01").cast("timestamp"))
    ).select(
        "l_partkey",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
        ).cast("long").alias("cents"),
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", F.col("cents")).otherwise(0)
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            promo.cast("long").alias("promo_cents"),
            F.sum("cents").cast("long").alias("total_cents"),
            F.expr(
                "CAST(SUM(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END)"
                " * 10000 div SUM(cents) AS LONG)"
            ).alias("promo_bp"),
        )
    )
