"""Classic decorrelated-subquery shapes, round 2 batch 11 — the
TPC-H Q2/Q11/Q13/Q15/Q22 patterns re-expressed Spark-first: min-per-
group element selection without a join-back, HAVING against a global
scalar, zero-preserving count distributions, max-with-ties, and
NOT-EXISTS against an above-average gate.

These are the correlated-subquery idioms every SQL warehouse user
expects; each Spark plan is the decorrelated single-pass form, and
several oracles deliberately use the *textbook* correlated/join-back
formulation so the hash match proves the decorrelation equivalent.

Standing contract: integer cross-engine arithmetic, identical column
aliases on both sides, bounded key spaces before joined/windowed
steps, scale note per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Q2 shape: min-per-group element selection
# ---------------------------------------------------------------------------
_SQL_MIN_COST_SUPPLIER = """
    WITH up AS (
        SELECT l_partkey AS pk, l_suppkey AS sk,
               CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                   // CAST(l_quantity AS BIGINT) AS unit
        FROM lineitem),
    m AS (SELECT pk, MIN(unit) AS min_unit, COUNT(*) AS n_offers
          FROM up GROUP BY pk)
    SELECT m.pk AS p_partkey,
           CAST(m.min_unit AS BIGINT) AS unit_cents,
           CAST(MIN(up.sk) AS BIGINT) AS s_suppkey,
           CAST(m.n_offers AS BIGINT) AS n_offers
    FROM up JOIN m ON up.pk = m.pk AND up.unit = m.min_unit
    GROUP BY m.pk, m.min_unit, m.n_offers
    """


@_q("min_cost_supplier", _SQL_MIN_COST_SUPPLIER)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's correlated `price = (SELECT MIN(price) …)` pattern:
    for every part, the cheapest observed unit price and the supplier
    offering it (lowest suppkey on ties). The ORACLE is the textbook
    two-pass join-back (aggregate the min, rejoin to find who attains
    it); the Spark plan is ONE aggregate — `min(struct(unit, sk))`
    picks the attaining supplier lexicographically in the same pass.
    The hash match proves the decorrelation.

    Scale: one shuffle on partkey with full map-side combine — the
    join-back form shuffles the fact TWICE and re-scans it; the
    struct-min form touches each row once. This is the single most
    common correlated-subquery rewrite a warehouse engine must get
    right.
    """
    li = _t(spark, sf_dir, "lineitem")
    up = li.select(
        F.col("l_partkey").alias("pk"),
        F.col("l_suppkey").alias("sk"),
        F.expr(
            "CAST(ROUND(l_extendedprice * 100, 0) AS LONG) "
            "div CAST(l_quantity AS LONG)"
        ).alias("unit"),
    )
    return (
        up.groupBy("pk")
        .agg(
            F.min(F.struct("unit", "sk")).alias("m"),
            F.count(F.lit(1)).alias("n_offers"),
        )
        .select(
            F.col("pk").alias("p_partkey"),
            F.col("m.unit").cast("long").alias("unit_cents"),
            F.col("m.sk").cast("long").alias("s_suppkey"),
            F.col("n_offers").cast("long").alias("n_offers"),
        )
    )


# ---------------------------------------------------------------------------
# Q11 shape: HAVING against a global-total scalar
# ---------------------------------------------------------------------------
_SQL_REVENUE_SHARE = """
    WITH nr AS (
        SELECT n_name AS nation,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                   * 100, 0) AS BIGINT)) AS BIGINT)
                   AS rev_cents
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name),
    g AS (SELECT nation, rev_cents, SUM(rev_cents) OVER () AS grand
          FROM nr)
    SELECT nation, rev_cents,
           CAST(rev_cents * 10000 // grand AS BIGINT) AS share_bp
    FROM g
    WHERE rev_cents * 50 > grand
    """


@_q("revenue_share_nations", _SQL_REVENUE_SHARE)
def q_revenue_share_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11's `HAVING SUM(…) > (SELECT SUM(…) * fraction FROM
    …)` pattern: nations holding more than 2% of global revenue, with
    their share in basis points. The global total is NOT a second
    scan — it's a window over the already-aggregated 25 nation rows,
    so the fact is read exactly once.

    Scale: the naive form evaluates the scalar subquery with its own
    full scan+shuffle. Here the per-nation rollup (customer join is
    the only fact-side shuffle; nation broadcasts) reduces to ≤ 25
    rows and the grand total is a single-partition window over those
    25 — microseconds, regardless of fact size.
    """
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    nr = (
        li.select("l_orderkey", cents.alias("cents"))
        .join(o.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum("cents").cast("long").alias("rev_cents"))
    )
    g = nr.withColumn(
        "grand", F.sum("rev_cents").over(Window.partitionBy())
    )
    return g.where(F.col("rev_cents") * 50 > F.col("grand")).select(
        "nation",
        "rev_cents",
        F.expr("CAST(rev_cents * 10000 div grand AS LONG)").alias(
            "share_bp"
        ),
    )


# ---------------------------------------------------------------------------
# Q13 shape: zero-preserving count distribution
# ---------------------------------------------------------------------------
_SQL_ORDER_COUNT_DIST = """
    WITH pc AS (
        SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey)
    SELECT CAST(n_orders AS INT) AS n_orders,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM pc GROUP BY n_orders
    """


@_q("order_count_distribution", _SQL_ORDER_COUNT_DIST)
def q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: how many customers placed 0, 1, 2, … orders — the
    left join keeps zero-order customers (COUNT of the nullable key
    skips the null), then the per-customer counts histogram. The
    canonical engagement / long-tail distribution.

    Scale: first shuffle co-partitions customer and orders on
    custkey (both fact-scaled — no broadcast hint, AQE decides);
    the second groupBy runs on the bounded count domain (≤ ~50 keys)
    with map-side combine. Zero-preservation via LEFT JOIN is the
    part naive pipelines get wrong by inner-joining first.
    """
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pc = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return pc.groupBy(F.col("n_orders").cast("int").alias("n_orders")).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )


# ---------------------------------------------------------------------------
# Q15 shape: max-with-ties via broadcast scalar
# ---------------------------------------------------------------------------
_SQL_TOP_SUPPLIER = """
    WITH sr AS (
        SELECT l_suppkey AS sk,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                   * 100, 0) AS BIGINT)) AS BIGINT)
                   AS rev_cents
        FROM lineitem GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, sr.rev_cents
    FROM sr JOIN supplier ON sr.sk = s_suppkey
    WHERE sr.rev_cents = (SELECT MAX(rev_cents) FROM sr)
    """


@_q("top_supplier_revenue", _SQL_TOP_SUPPLIER)
def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) achieving the maximum total revenue
    — ties KEPT, which is why this is not `ORDER BY … LIMIT 1`. The
    oracle uses the textbook scalar subquery; the Spark plan derives
    the max as an empty-frame window OVER the per-supplier rollup, so
    the decorrelated form scans the fact exactly once (the scalar-
    subquery form would scan it twice — the naive plan Spark's
    exchange reuse cannot always rescue, because the equality-join
    branch carries an extra null filter the max branch lacks).

    Scale: one shuffle on suppkey builds the rollup; the global-max
    window runs on that rollup (one row per supplier — a few MB even
    at 100 TB fact scale), single-partition by design. The supplier-
    name join is AQE-decided (supplier scales with the fact).
    """
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    sr = (
        li.select("l_suppkey", cents.alias("cents"))
        .groupBy(F.col("l_suppkey").alias("sk"))
        .agg(F.sum("cents").cast("long").alias("rev_cents"))
    )
    return (
        sr.withColumn("mx", F.max("rev_cents").over(Window.partitionBy()))
        .where(F.col("rev_cents") == F.col("mx"))
        .join(s, F.col("sk") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "rev_cents")
    )


# ---------------------------------------------------------------------------
# Q22 shape: above-average gate + NOT EXISTS
# ---------------------------------------------------------------------------
_SQL_RICH_INACTIVE = """
    WITH bal AS (
        SELECT c_custkey, c_nationkey,
               CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
        FROM customer),
    avg_pos AS (
        SELECT CAST(SUM(CASE WHEN bal_cents > 0 THEN bal_cents END)
                    // COUNT(CASE WHEN bal_cents > 0 THEN 1 END)
                    AS BIGINT) AS ap
        FROM bal)
    SELECT n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(bal_cents) AS BIGINT) AS total_bal_cents
    FROM bal
    JOIN nation ON c_nationkey = n_nationkey
    WHERE bal_cents > (SELECT ap FROM avg_pos)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY n_name
    """


@_q("rich_inactive_customers", _SQL_RICH_INACTIVE)
def q_rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 reshaped as churn: high-balance customers with NO
    order since 2001-01-01 (every synthetic customer has *some* order,
    so the gate is recency — the realistic churn definition anyway),
    rolled up by nation. Composes the scalar `> (SELECT AVG …)` gate
    with a filtered `NOT EXISTS` — the pair of correlated-subquery
    forms a warehouse must decorrelate together.

    Scale: the positive-balance average is a broadcast scalar from a
    single customer scan; the NOT EXISTS is a left-anti shuffle join
    on custkey against orders FILTERED BEFORE THE JOIN (the date
    predicate pushes to the scan, shrinking the anti build ~12×).
    Both facts are touched once; the rollup is ≤ 25 nations
    broadcast-joined.
    """
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    n = _t(spark, sf_dir, "nation")
    bal = c.select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("bal_cents"),
    )
    avg_pos = bal.agg(
        F.expr(
            "CAST(SUM(CASE WHEN bal_cents > 0 THEN bal_cents END) "
            "div COUNT(CASE WHEN bal_cents > 0 THEN 1 END) AS LONG)"
        ).alias("ap")
    )
    return (
        bal.crossJoin(F.broadcast(avg_pos))
        .where(F.col("bal_cents") > F.col("ap"))
        .join(o, bal.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("bal_cents").cast("long").alias("total_bal_cents"),
        )
    )
