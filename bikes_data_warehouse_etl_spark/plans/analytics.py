"""Analytics query surface: operators beyond the reference's inventory
that a complete engine must offer (SURVEY §2 'not present' rows made
present): multi-level aggregation, exact percentiles, semi/range/as-of
joins, window frames, pivots, the sanctioned pandas-UDF extension
point, and SCD2 as a full differential query.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.operators.merge import scd2_merge
from bikes_data_warehouse_etl_spark.plans.synthetic import (
    _SCD1_SRC_SQL,
    _q,
    _scd1_frames,
    _t,
)


# ---------------------------------------------------------------------------
# Multi-level aggregation: ROLLUP (A: grouping-sets family)
# ---------------------------------------------------------------------------
@_q(
    "rollup_nation_segment",
    """
    SELECT n_name AS nation, c_mktsegment AS segment,
           CAST(GROUPING(n_name) * 2 + GROUPING(c_mktsegment) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS bal_cents
    FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, c_mktsegment)
    """,
)
def q_rollup_nation_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (nation, segment) with grouping id — subtotal and
    grand-total rows in one pass (Spark expands grouping sets before
    the hash aggregate; one shuffle)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .rollup(
            F.col("n_name").alias("nation"), F.col("c_mktsegment").alias("segment")
        )
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("long")).alias(
                "bal_cents"
            ),
        )
    )


@_q(
    "cube_status_priority",
    """
    SELECT o_orderstatus AS status, o_orderpriority AS priority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping sets in one pass."""
    o = _t(spark, sf_dir, "orders")
    return o.cube(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Exact percentiles (sort-based → engine-deterministic)
# ---------------------------------------------------------------------------
@_q(
    "percentiles_by_segment",
    """
    SELECT c_mktsegment AS segment,
           ROUND(quantile_cont(c_acctbal, 0.5), 4) AS p50,
           ROUND(quantile_cont(c_acctbal, 0.9), 4) AS p90,
           ROUND(MIN(c_acctbal), 2) AS min_bal,
           ROUND(MAX(c_acctbal), 2) AS max_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q_percentiles_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group. Sort-based, so unlike
    floating sums they are engine-deterministic; at scale swap in
    approx_percentile (t-digest) and drop the oracle to rows-only."""
    c = _t(spark, sf_dir, "customer")
    return c.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.round(F.expr("percentile(c_acctbal, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(c_acctbal, 0.9)"), 4).alias("p90"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )


# ---------------------------------------------------------------------------
# Join family completion: semi, range (non-equi), as-of
# ---------------------------------------------------------------------------
@_q(
    "semi_join_urgent_customers",
    """
    SELECT c_custkey AS cust_id, c_name AS cust_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
)
def q_semi_join_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with ≥1 urgent order — probe
    side never duplicates, only the key columns of orders are read."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return c.join(
        urgent, c.c_custkey == urgent.o_custkey, "left_semi"
    ).select(F.col("c_custkey").alias("cust_id"), F.col("c_name").alias("cust_name"))


@_q(
    "range_join_late_ships",
    """
    SELECT o_orderkey AS ordr_id,
           CAST(COUNT(*) AS BIGINT) AS n_late_lines
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY o_orderkey
    """,
)
def q_range_join_late_ships(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range join: line items shipped >60 days after their
    order. The equi key keeps it a hash/sort-merge join; the range
    predicate is applied post-match (no nested-loop blowup)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("interval 60 days")),
            "inner",
        )
        .groupBy(F.col("o_orderkey").alias("ordr_id"))
        .agg(F.count(F.lit(1)).alias("n_late_lines"))
    )


@_q(
    "asof_join_last_signup",
    """
    WITH w AS (
      SELECT event_id, user_id, event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) AS es,
             MAX(CASE WHEN event_type = 'signup' THEN CAST(FLOOR(epoch(ts)) AS BIGINT) END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS last_signup_es
      FROM events
    )
    SELECT event_id, user_id, es,
           last_signup_es,
           CAST(es - last_signup_es AS BIGINT) AS secs_since_signup
    FROM w
    WHERE event_type = 'purchase'
    """,
)
def q_asof_join_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent
    signup at-or-before it — expressed as a running conditional MAX
    window, which Spark executes with ONE shuffle on user_id (contrast
    a naive inequality self-join: quadratic per user)."""
    e = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.unix_timestamp("ts").alias("es"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    enriched = e.withColumn(
        "last_signup_es",
        F.max(
            F.when(F.col("event_type") == "signup", F.col("es"))
        ).over(w),
    )
    return enriched.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("es").cast("long").alias("es"),
        F.col("last_signup_es").cast("long").alias("last_signup_es"),
        (F.col("es") - F.col("last_signup_es")).cast("long").alias(
            "secs_since_signup"
        ),
    )


# ---------------------------------------------------------------------------
# Window frames + pivot
# ---------------------------------------------------------------------------
@_q(
    "moving_sum_orders",
    """
    SELECT o_orderkey AS ordr_id, o_custkey AS cust_id,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov3_cents,
           CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov3_n
    FROM orders
    """,
)
def q_moving_sum_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ROWS frame: trailing-3 moving sum per customer in
    integer cents (frame-spec analytics the reference lacks)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    return o.select(
        F.col("o_orderkey").alias("ordr_id"),
        F.col("o_custkey").alias("cust_id"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .over(w)
        .cast("long")
        .alias("mov3_cents"),
        F.count(F.lit(1)).over(w).cast("long").alias("mov3_n"),
    )


@_q(
    "pivot_events",
    """
    SELECT user_id,
           CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
           CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
           CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
           CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error
    FROM events
    GROUP BY user_id
    """,
)
def q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot on a known value set. Passing the values explicitly avoids
    the extra distinct-collection job Spark otherwise runs — at scale
    always pin the pivot domain."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .fillna(0, subset=["click", "view", "purchase", "signup", "error"])
        .select(
            "user_id",
            *[F.col(c).cast("long").alias(c) for c in ["click", "view", "purchase", "signup", "error"]],
        )
    )


# ---------------------------------------------------------------------------
# Sanctioned UDF extension point: Arrow-vectorized pandas_udf
# ---------------------------------------------------------------------------
@_q(
    "pandas_udf_score",
    """
    SELECT c_custkey AS cust_id,
           ROUND(c_acctbal * c_acctbal * 0.0001 + 3 * c_acctbal + 1, 4) AS risk_score
    FROM customer
    """,
)
def q_pandas_udf_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's UDF surface: an Arrow-batched pandas_udf (the
    reference's row-wise ``DataFrame.apply`` maps here — SURVEY §2.10).
    The polynomial is exact in doubles, so the oracle mirrors it; a
    row-at-a-time Python UDF would be 10-100x slower and is banned from
    the hot path."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def risk(bal: pd.Series) -> pd.Series:
        return (bal * bal * 0.0001 + 3 * bal + 1).round(4)

    c = _t(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("cust_id"), risk("c_acctbal").alias("risk_score")
    )


# ---------------------------------------------------------------------------
# SCD2 as a full differential query
# ---------------------------------------------------------------------------
_SCD2_TGT_SQL = """
    SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS c_acctbal, c_mktsegment,
           CAST(1 AS BIGINT) AS current_flag,
           TIMESTAMP '2020-01-01 00:00:00' AS effective_timestamp,
           CAST(NULL AS TIMESTAMP) AS expire_timestamp
    FROM customer
"""


@_q(
    "scd2_merge",
    f"""
    WITH src AS ({_SCD1_SRC_SQL}),
    tgt AS ({_SCD2_TGT_SQL}),
    changed AS (
      SELECT s.* FROM src s LEFT JOIN tgt t ON s.c_custkey = t.c_custkey
      WHERE t.c_custkey IS NULL
         OR s.c_name IS DISTINCT FROM t.c_name
         OR s.c_acctbal IS DISTINCT FROM t.c_acctbal
         OR s.c_mktsegment IS DISTINCT FROM t.c_mktsegment
    )
    SELECT t.c_custkey, t.c_name, t.c_acctbal, t.c_mktsegment,
           t.current_flag, t.effective_timestamp, t.expire_timestamp
    FROM tgt t LEFT JOIN changed c ON t.c_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL
    UNION ALL
    SELECT t.c_custkey, t.c_name, t.c_acctbal, t.c_mktsegment,
           CAST(0 AS BIGINT), t.effective_timestamp, TIMESTAMP '2022-06-01 00:00:00'
    FROM tgt t JOIN changed c ON t.c_custkey = c.c_custkey
    UNION ALL
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
           CAST(1 AS BIGINT), TIMESTAMP '2022-06-01 00:00:00', CAST(NULL AS TIMESTAMP)
    FROM changed
    """,
)
def q_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full SCD2 merge as a differential query: initial all-current
    target + modified source batch → expired versions, carried-over
    rows, and new current versions — the operator the reference's
    Product history load *intends* (§1.5.5/7 fixed), checked
    row-for-row against a pure-SQL oracle."""
    src, tgt_base = _scd1_frames(spark, sf_dir)
    tgt = (
        tgt_base.withColumn("current_flag", F.lit(1).cast("long"))
        .withColumn(
            "effective_timestamp", F.lit("2020-01-01 00:00:00").cast("timestamp")
        )
        .withColumn("expire_timestamp", F.lit(None).cast("timestamp"))
    )
    return scd2_merge(
        tgt,
        src,
        keys=["c_custkey"],
        compare_cols=["c_name", "c_acctbal", "c_mktsegment"],
        run_ts="2022-06-01 00:00:00",
        high_ts=None,
    )
