"""Round-4 batch 30: association-rule mining, CUSUM change-point
detection, the Spark 4 SQL-UDF surface, and discrete survival hazard.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions import packing
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Association rules: confidence + lift over co-purchase pairs
# ---------------------------------------------------------------------------
_AR_MIN_SUPPORT = 3
_AR_TOP = 25

_SQL_ASSOC_RULES = f"""
    WITH lp AS MATERIALIZED (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n_ord AS MATERIALIZED (
        SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM lp),
    item AS MATERIALIZED (
        SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_item
        FROM lp GROUP BY 1),
    -- lp is referenced three times (n_ord, item, both cpair
    -- sides); without MATERIALIZED DuckDB re-ran the 60M-row
    -- DISTINCT per reference — the r7 sf10 timeout
    cpair AS MATERIALIZED (
        -- candidate-bounded core (the certified copurchase_pairs
        -- shape): CANONICAL u<v pairs, support-filtered BEFORE the
        -- directional mirror — support is symmetric so the >= filter
        -- commutes with mirroring, and everything downstream runs on
        -- the filtered candidate set. The old <>-self-join form
        -- carried 2x the pairs through the GROUP BY and the rule
        -- joins and timed out the sf10 gate.
        SELECT a.l_partkey AS u, b.l_partkey AS v,
               CAST(COUNT(*) AS BIGINT) AS support
        FROM lp a JOIN lp b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= {_AR_MIN_SUPPORT}),
    pair AS (
        SELECT u AS ante, v AS cons, support FROM cpair
        UNION ALL
        SELECT v AS ante, u AS cons, support FROM cpair),
    rules AS (
        SELECT pair.ante, pair.cons, pair.support,
               CAST(pair.support * 1000 // ia.n_item AS BIGINT) AS conf_milli,
               CAST(pair.support * n_ord.n * 1000
                    // (ia.n_item * ic.n_item) AS BIGINT) AS lift_milli
        FROM pair
        JOIN item ia ON pair.ante = ia.l_partkey
        JOIN item ic ON pair.cons = ic.l_partkey
        CROSS JOIN n_ord)
    SELECT ante, cons, support, conf_milli, lift_milli
    FROM rules
    ORDER BY lift_milli DESC, ante, cons LIMIT {_AR_TOP}
    """


@_q("assoc_rules_topk", _SQL_ASSOC_RULES)
def q_assoc_rules_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASSOCIATION RULES (the Apriori pair step): for every directional
    rule A→B with support ≥ 3 baskets, confidence P(B|A) and lift
    P(A,B)/(P(A)P(B)) in milli — `copurchase_pairs` stops at raw pair
    support; this adds the two scores a recommender or
    basket-placement decision actually ranks by, top-25 by lift.
    All integer (amplify-then-divide), so both engines agree exactly.

    Scale: the oracle spells the distinct-pair self-join; the Spark
    twin generates CANONICAL u<v pairs row-locally from per-order part
    baskets (the `co_order_edges` basket pattern — fan-out ≤
    C(basket, 2), baskets are order-bounded), so the fact table never
    self-joins, and mirrors into the directional rule form only AFTER
    the ≥3-support filter (support is symmetric and the filter
    commutes with mirroring — half the bytes through the dominant
    near-unique-key pair shuffle, where map-side combine can't help).
    The basket frame feeds three consumers and is lazily
    localCheckpointed so the collect_set shuffle runs once. The item
    table is item-cardinality-bounded and joins the pair census on the
    item key twice; the basket count is a 1-row broadcast; ranking is
    a top-25 heap.
    """
    lp = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = (
        lp.groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("parts"))
        # THREE consumers (n_ord, item, pair) — a lazy localCheckpoint
        # runs the fact-scale collect_set shuffle once instead of three
        # times (the `pagerank_suppliers` edge-set pattern)
        .localCheckpoint(eager=False)
    )
    n_ord = baskets.agg(F.count(F.lit(1)).cast("long").alias("n"))
    item = (
        baskets.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_item"))
    )
    # support is symmetric: count CANONICAL a<b pairs (half the bytes of
    # the directional build through the dominant near-unique-key
    # shuffle), filter, THEN mirror into the directional rule form —
    # ≥-support filtering commutes with mirroring
    # …and the canonical pair rides ONE packed long through that
    # shuffle (32-bit partkeys; the `co_order_edges` packing), unpacked
    # only after the support filter has shrunk the stream
    pair = (
        baskets.where(F.size("parts") >= 2)
        .select(packing.explode_packed_pairs("parts"))
        .groupBy("ab")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .where(F.col("support") >= _AR_MIN_SUPPORT)
        .select(
            packing.unpack_hi("ab").alias("u"),
            packing.unpack_lo("ab").alias("v"),
            "support",
        )
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("u").alias("ante"),
                        F.col("v").alias("cons"),
                        F.col("support"),
                    ),
                    F.struct(
                        F.col("v").alias("ante"),
                        F.col("u").alias("cons"),
                        F.col("support"),
                    ),
                )
            ).alias("p")
        )
        .select("p.ante", "p.cons", "p.support")
    )
    ia = item.select(F.col("l_partkey").alias("ante"), F.col("n_item").alias("n_a"))
    ic = item.select(F.col("l_partkey").alias("cons"), F.col("n_item").alias("n_c"))
    return (
        pair.join(ia, "ante")
        .join(ic, "cons")
        .crossJoin(F.broadcast(n_ord))
        .select(
            "ante",
            "cons",
            "support",
            F.expr("support * 1000 div n_a").cast("long").alias("conf_milli"),
            F.expr("support * n * 1000 div (n_a * n_c)")
            .cast("long")
            .alias("lift_milli"),
        )
        .orderBy(F.col("lift_milli").desc(), "ante", "cons")
        .limit(_AR_TOP)
    )


# ---------------------------------------------------------------------------
# CUSUM change-point detection on the daily revenue series
# ---------------------------------------------------------------------------
_SQL_CUSUM = """
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS BIGINT) AS day,
               CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) // 1000
                   AS BIGINT) AS dk
        FROM orders GROUP BY 1),
    st AS (
        SELECT CAST(SUM(dk) // COUNT(*) AS BIGINT) AS mu,
               CAST(COUNT(*) AS BIGINT) AS nd
        FROM daily),
    dev AS (
        SELECT day, dk,
               CAST(SUM(dk - st.mu) OVER
                    (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS BIGINT) AS cum,
               st.mu
        FROM daily, st),
    cus AS (
        SELECT day, dk, mu,
               cum - MIN(cum) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                     PRECEDING AND CURRENT ROW) AS cusum_k
        FROM dev),
    mad AS (
        SELECT CAST(SUM(ABS(dk - mu)) // COUNT(*) AS BIGINT) AS md
        FROM cus)
    SELECT day, dk, CAST(cusum_k AS BIGINT) AS cusum_k,
           CAST(CASE WHEN cusum_k > 8 * mad.md THEN 1 ELSE 0 END AS BIGINT)
               AS shifted
    FROM cus, mad
    """


@_q("cusum_change_detection", _SQL_CUSUM)
def q_cusum_change_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM CHANGE-POINT detection on daily revenue (kilodollars):
    the one-sided cumulative-sum statistic S_t = cum_t − min_{s≤t}
    cum_s over deviations from the series mean, flagged when S_t
    exceeds 8× the mean absolute deviation — the control-chart
    complement to `daily_anomaly_flags`: a z-score catches one wild
    day, CUSUM catches a SUSTAINED small shift (each day adds its
    deviation, so a +0.5·MAD drift alarms after ~16 days). The
    recursive textbook form S_t = max(0, S_{t−1} + x_t − μ) is
    deliberately re-expressed as prefix-sum minus running-minimum —
    two stock window frames instead of an unexpressible recursion,
    algebraically identical. Everything is integer: kilodollar
    flooring, floor mean, floor MAD. The floored mean can under-state
    μ by <1 kilodollar, adding at most +1k$/day of artificial drift to
    the cusum — harmless because the 8×MAD gate is measured in the
    same kilodollar units and real daily MAD dwarfs the day count; a
    series whose MAD is O(1) kilodollar needs dollar granularity
    instead (rescale, don't trust sub-granularity drift).

    Scale: the day domain is calendar-bounded
    (`temporal_split_embargo`'s argument), so the ordered windows run
    over thousands of rows regardless of fact volume; the one
    fact-sized step is the map-side-combined daily rollup; μ and MAD
    are 1-row broadcasts.
    """
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("day")
        )
        .agg(
            F.expr(
                "CAST(sum(CAST(floor(o_totalprice) AS LONG)) div 1000 AS LONG)"
            ).alias("dk")
        )
    )
    st = daily.agg(
        F.expr("sum(dk) div count(*)").cast("long").alias("mu"),
        F.count(F.lit(1)).cast("long").alias("nd"),
    )
    w_cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    dev = daily.crossJoin(F.broadcast(st)).select(
        "day",
        "dk",
        "mu",
        F.sum(F.col("dk") - F.col("mu")).over(w_cum).cast("long").alias("cum"),
    )
    cus = dev.select(
        "day",
        "dk",
        "mu",
        (F.col("cum") - F.min("cum").over(w_cum)).cast("long").alias("cusum_k"),
    )
    mad = cus.agg(
        F.expr("sum(abs(dk - mu)) div count(*)").cast("long").alias("md")
    )
    return cus.crossJoin(F.broadcast(mad)).select(
        "day",
        "dk",
        "cusum_k",
        (F.col("cusum_k") > 8 * F.col("md")).cast("long").alias("shifted"),
    )


# ---------------------------------------------------------------------------
# Spark 4 SQL UDF surface: pricing rollup through declared functions
# ---------------------------------------------------------------------------
_SQL_UDF_PRICING = """
    SELECT l_returnflag AS flag, l_linestatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
               AS BIGINT)) AS BIGINT) AS net_cents,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
               * (1 + l_tax) * 100, 0) AS BIGINT)) AS BIGINT)
               AS charged_cents
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2002-09-02'
    GROUP BY 1, 2
    """


@_q("sql_udf_pricing", _SQL_UDF_PRICING)
def q_sql_udf_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL UDF surface: the pricing rollup computed through
    DECLARED SQL functions (``CREATE TEMPORARY FUNCTION … RETURN
    expr``) — the catalog-managed way to share business definitions
    (net price, charged price) across queries without a Python UDF or
    copy-pasted expressions. The functions are inlined by the analyzer
    into the exact Q1-family integer-cents expressions the oracle
    spells, so declaring them costs NOTHING at runtime — the plan is
    identical to writing the expression inline (whole-stage codegen,
    full pushdown), which is precisely the point of SQL UDFs over
    Python ones (`pandas_udf_score` documents when Python IS needed).

    Scale: one scan, ship-date predicate pushed, 6-cell group domain
    map-side combined — Q1's shape (`pricing_summary`), here proving
    the function-declaration surface adds no plan overhead.
    """
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION sg_net_cents(p DOUBLE, d DOUBLE)"
        " RETURNS BIGINT RETURN CAST(ROUND(p * (1 - d) * 100, 0) AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION sg_charged_cents"
        "(p DOUBLE, d DOUBLE, t DOUBLE) RETURNS BIGINT"
        " RETURN CAST(ROUND(p * (1 - d) * (1 + t) * 100, 0) AS BIGINT)"
    )
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("sg_udf_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag AS flag, l_linestatus AS status,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(sg_net_cents(l_extendedprice, l_discount)) AS BIGINT)
                   AS net_cents,
               CAST(SUM(sg_charged_cents(l_extendedprice, l_discount, l_tax))
                   AS BIGINT) AS charged_cents
        FROM sg_udf_lineitem
        WHERE l_shipdate <= TIMESTAMP '2002-09-02'
        GROUP BY 1, 2
        """
    )


# ---------------------------------------------------------------------------
# Discrete survival: weekly churn hazard from event lifetimes
# ---------------------------------------------------------------------------
_SQL_CHURN_HAZARD = """
    WITH life AS (
        SELECT user_id,
               date_diff('day', MIN(ts), MAX(ts)) // 7 AS wk
        FROM events GROUP BY 1),
    died AS (
        SELECT wk, CAST(COUNT(*) AS BIGINT) AS n_churned
        FROM life GROUP BY 1),
    risk AS (
        SELECT wk, n_churned,
               CAST(SUM(n_churned) OVER (ORDER BY wk DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS n_at_risk
        FROM died)
    SELECT CAST(wk AS BIGINT) AS wk, n_at_risk, n_churned,
           CAST(n_churned * 10000 // n_at_risk AS BIGINT) AS hazard_bp
    FROM risk
    """


@_q("churn_hazard_curve", _SQL_CHURN_HAZARD)
def q_churn_hazard_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE SURVIVAL hazard: for each activity-lifetime week w,
    the share (bp) of still-active users whose last event falls in
    that week — h(w) = churned(w) / at_risk(w), with the at-risk set
    computed as a descending-week running sum over the lifetime
    HISTOGRAM (never a per-user window). `user_retention_weekly`
    reports cohort retention; the hazard curve is its actuarial
    derivative — the shape that says WHEN users quit (a week-1 spike =
    onboarding failure; flat tail = steady attrition). Lifetime is
    observed last-minus-first activity; right-censoring at the
    observation edge is deliberately uncorrected — an honest
    Kaplan-Meier needs the snapshot date, which `act_perd_dim`'s
    explicit as_of contract supplies when this runs in production.

    Scale: one fact-sized (user)-keyed min/max rollup (map-side
    combined); everything after runs on the lifetime histogram —
    weeks-domain rows, calendar-bounded like
    `temporal_split_embargo`'s argument, so the ordered window is
    scale-free.
    """
    life = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.expr("CAST(datediff(max(ts), min(ts)) div 7 AS LONG)").alias("wk")
        )
    )
    died = life.groupBy("wk").agg(
        F.count(F.lit(1)).cast("long").alias("n_churned")
    )
    w = Window.orderBy(F.col("wk").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = died.select(
        "wk",
        "n_churned",
        F.sum("n_churned").over(w).cast("long").alias("n_at_risk"),
    )
    return risk.select(
        F.col("wk").cast("long").alias("wk"),
        "n_at_risk",
        "n_churned",
        F.expr("n_churned * 10000 div n_at_risk").cast("long").alias("hazard_bp"),
    )
