"""Deep-correlation shapes, round 2 batch 13 — the TPC-H
Q5/Q17/Q18/Q19/Q21 patterns: same-nation join topology, per-group
scalar correlate, HAVING-subquery membership, disjunctive
multi-predicate pushdown, and the double-EXISTS (exists-other /
not-exists-other-late) supplier-fault isolation.

These complete the TPC-H shape families started in pipeline_ops11/12:
every query family expressible on the driver schema now has a live,
oracle-matched Spark twin. Oracles keep the textbook correlated /
subquery SQL so each hash match proves the decorrelation.

Standing contract: integer cross-engine arithmetic, identical
aliases, total orders under LIMITs, scale note per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Q5: local-supplier volume (cust and supp in the same nation)
# ---------------------------------------------------------------------------
_SQL_LOCAL_SUPPLIER = """
    SELECT n_name AS nation,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
                 AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '2000-01-01'
      AND o_orderdate <  TIMESTAMP '2001-01-01'
    GROUP BY n_name
    """


@_q("local_supplier_volume", _SQL_LOCAL_SUPPLIER)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: one year's revenue transacted between customers and
    suppliers of the SAME nation — the query whose join graph is a
    cycle (order→customer, line→supplier, customer.nation =
    supplier.nation), which is what makes it the canonical join-order
    benchmark.

    Scale: the year filter prunes orders at the scan; the fact-side
    joins shuffle on orderkey then custkey; supplier joins on suppkey
    (AQE decides broadcast — supplier is small-but-fact-scaled); the
    nation equality is applied as a post-join filter predicate, and
    the final rollup is ≤25 nations, fully map-side combined. No
    join in the cycle is forced; Catalyst+AQE order them from stats.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
        ).cast("long").alias("cents"),
    )
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2001-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            c,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum("cents").cast("long").alias("revenue_cents"))
    )


# ---------------------------------------------------------------------------
# Q17: small-quantity lines vs per-part average
# ---------------------------------------------------------------------------
_SQL_SMALL_QTY = """
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                // 7 AS BIGINT) AS avg_yearly_cents,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l1
    WHERE l_quantity * 5 < (SELECT SUM(l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = l1.l_partkey)
    """


@_q("small_qty_revenue", _SQL_SMALL_QTY)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17's correlated per-part scalar: revenue from lines
    whose quantity is below 1/5 of their part's total quantity (the
    integer-safe reformulation of `< 0.2 * AVG(...)` — multiply
    through by the count to avoid a float threshold). The oracle
    keeps the correlated subquery; the Spark plan decorrelates to a
    per-part SUM window over the partkey partition — ONE shuffle of
    the fact, no join-back, no second scan.

    Scale: the window needs no frame sort beyond the partition hash
    (unbounded frame over partkey), so this is shuffle + streaming
    aggregate. The join-back alternative shuffles the fact twice and
    rescans it; at 100 TB the window form halves the I/O. The /7
    mirrors Q17's avg_yearly presentation constant.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_quantity",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias(
            "cents"
        ),
    )
    w = Window.partitionBy("l_partkey")
    return (
        li.withColumn("part_qty", F.sum("l_quantity").over(w))
        .where(F.col("l_quantity") * 5 < F.col("part_qty"))
        .agg(
            F.expr("CAST(SUM(cents) div 7 AS LONG)").alias(
                "avg_yearly_cents"
            ),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q18: large-volume customers (HAVING-subquery membership)
# ---------------------------------------------------------------------------
_SQL_LARGE_VOLUME = """
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS BIGINT)
               AS total_qty_cents
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING SUM(l_quantity) > 300)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate
    ORDER BY total_qty_cents DESC, o_orderkey
    LIMIT 25
    """


@_q("large_volume_customers", _SQL_LARGE_VOLUME)
def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers whose single orders exceed 300 units,
    with the per-order totals — the `IN (… GROUP BY … HAVING …)`
    membership pattern. The oracle keeps the IN-subquery; the Spark
    plan computes the per-order quantity rollup ONCE, filters it to
    qualifying orders (>300), and joins that small qualifying set
    back — the rollup serves as both the filter and the output
    aggregate, so lineitem is scanned and shuffled exactly once.

    Scale: qualifying orders are a tiny fraction (heavy-tail), so
    the join back to orders/customer moves a filtered key set; AQE
    broadcast-converts it at runtime. Top-25 is a per-partition heap
    with the orderkey tiebreak making the LIMIT deterministic.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    per_order = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.round(F.col("l_quantity") * 100, 0).cast("long"))
            .cast("long").alias("total_qty_cents"),
            F.sum("l_quantity").alias("raw_qty"),
        )
        .where(F.col("raw_qty") > 300)
    )
    return (
        per_order.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "total_qty_cents",
        )
        .orderBy(F.col("total_qty_cents").desc(), "o_orderkey")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Q19: disjunctive multi-predicate revenue
# ---------------------------------------------------------------------------
_SQL_DISJUNCTIVE = """
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                         AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
    """


@_q("disjunctive_revenue", _SQL_DISJUNCTIVE)
def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue matching an OR of three brand/size/quantity
    conjunctions — the disjunctive-predicate benchmark. A naive
    engine evaluates the OR only after the join; the correct plan
    pushes the UNION-of-ranges residuals to BOTH scans (quantity
    spans [1,30] on lineitem, brand IN (…) + size ≤ 35 on part)
    and keeps the exact OR as the post-join filter.

    Scale: Catalyst derives those per-side bounds automatically
    (constraint propagation over the disjunction) — pinned in the
    plan test: the lineitem scan must carry quantity pushed filters,
    the part scan brand/size In/LessThanOrEqual. The part join is
    AQE-decided.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_quantity",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
        ).cast("long").alias("cents"),
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    joined = li.join(p, F.col("p_partkey") == F.col("l_partkey"))
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return joined.where(
        arm("Brand#1", 15, 1, 11)
        | arm("Brand#2", 25, 10, 20)
        | arm("Brand#3", 35, 20, 30)
    ).agg(
        F.sum("cents").cast("long").alias("revenue_cents"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Q21: the at-fault supplier (EXISTS other ∧ NOT EXISTS other-late)
# ---------------------------------------------------------------------------
_SQL_WAITING_SUPPLIER = """
    WITH lines AS (
        SELECT l_orderkey AS ok, l_suppkey AS sk,
               CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                    THEN 1 ELSE 0 END AS late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
    SELECT s_name,
           CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lines l1
    JOIN supplier ON l1.sk = s_suppkey
    WHERE l1.late = 1
      AND EXISTS (SELECT 1 FROM lines l2
                  WHERE l2.ok = l1.ok AND l2.sk <> l1.sk)
      AND NOT EXISTS (SELECT 1 FROM lines l3
                      WHERE l3.ok = l1.ok AND l3.sk <> l1.sk
                        AND l3.late = 1)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """


@_q("waiting_supplier", _SQL_WAITING_SUPPLIER)
def q_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers solely responsible for late multi-
    supplier orders — a late line, ANOTHER supplier exists on the
    order (EXISTS), and NO other supplier was late (NOT EXISTS). The
    oracle keeps both correlated subqueries; the Spark plan
    decorrelates BOTH into a TWO-LEVEL aggregate. Level 1 groups the
    joined fact by (order, supplier): was this supplier late here,
    and on how many lines. Level 2 rolls up per order: n_supp
    (plain COUNT of level-1 rows — already distinct), n_late_supp
    (SUM of the late flags), the single late supplier's key, and that
    supplier's late-line count (well-defined exactly when
    n_late_supp = 1). An order qualifies iff n_supp > 1 ∧
    n_late_supp = 1; its blamed supplier's late lines are already in
    hand, so numwait is a dim-sized rollup — no second pass over the
    fact.

    Scale: the textbook form self-joins lineitem TWICE per subquery;
    the round-4 form grouped once but paid a double COUNT DISTINCT
    (an Expand tripling the fact rows) AND re-joined the fact for the
    blamed suppliers' late lines (the un-cached `lines` lineage ran
    the lineitem⋈orders join twice — 105 s at sf10). This form
    shuffles the fact ONCE (the orderkey join); when that join
    shuffles, both aggregate levels reuse the hash(orderkey)
    partitioning (hash(ok) satisfies the clustered distribution of
    (ok, sk) and of ok; no-Expand pinned in test_plan_shapes), and the
    supplier name join broadcasts a dim. sf10 105 s → ~35 s. Top-10
    with the s_name tiebreak is deterministic.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    lines = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_suppkey").alias("sk"),
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
        ).cast("int").alias("late"),
    )
    per_supp = lines.groupBy("ok", "sk").agg(
        F.max("late").alias("is_late"),
        F.sum("late").alias("n_late_lines"),
    )
    per_order = per_supp.groupBy("ok").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("is_late").alias("n_late_supp"),
        F.max(F.when(F.col("is_late") == 1, F.col("sk"))).alias("late_sk"),
        F.sum(
            F.when(F.col("is_late") == 1, F.col("n_late_lines"))
        ).alias("blamed_late_lines"),
    )
    blamed = per_order.where(
        (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
    )
    return (
        blamed.join(F.broadcast(s), F.col("late_sk") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("blamed_late_lines").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )
