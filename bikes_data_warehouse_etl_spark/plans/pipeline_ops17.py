"""Round-4 batch 17: Pareto-frontier mining, new-vs-returning user
accounting, linear multi-touch attribution, year-over-year deltas, and
median-absolute-deviation robust outliers.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic for every comparison/share (cents / bp / ppm), identical
aliases both sides, bounded key domains before joined/windowed steps,
scale notes inline per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Pareto frontier: suppliers undominated on (revenue, account balance)
# ---------------------------------------------------------------------------
_SQL_PARETO = """
    WITH rev AS (
        SELECT l_suppkey AS sk,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100,
                   0) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM lineitem GROUP BY 1),
    pts AS (
        SELECT s_name AS supplier, revenue_cents,
               CAST(ROUND(s_acctbal * 100, 0) AS BIGINT) AS bal_cents
        FROM rev JOIN supplier ON sk = s_suppkey),
    w AS (
        SELECT supplier, revenue_cents, bal_cents,
               MAX(bal_cents) OVER (ORDER BY revenue_cents DESC
                   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS maxy_gt,
               MAX(bal_cents) OVER (ORDER BY revenue_cents DESC
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS maxy_ge
        FROM pts)
    SELECT supplier, revenue_cents, bal_cents
    FROM w
    WHERE COALESCE(maxy_gt, -9223372036854775808) < bal_cents
      AND maxy_ge <= bal_cents
    """


@_q("pareto_suppliers", _SQL_PARETO)
def q_pareto_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-frontier mining: suppliers undominated on (lifetime
    revenue, account balance) — q dominates p when q is >= on both
    axes and > on at least one; the frontier is the shortlist every
    multi-objective ranking (vendor selection, doc quality-vs-length
    curation) starts from. The dominance test is two RANGE windows over
    integer cents: max(y) over STRICTLY-greater x (integer RANGE ... 1
    PRECEDING under DESC order makes "strictly" exact, no float eps)
    catches (x' > x, y' >= y); max(y) including current-x ties catches
    (x' >= x, y' > y). No self-join, no EXCLUDE CURRENT ROW dependence.

    Scale: input is the per-supplier rollup (|suppliers| rows), so the
    global-order window is bounded. For a frontier over raw 100 TB
    points, prepend a per-partition local frontier (mapPartitions —
    each local frontier is a provable superset member-wise) and run
    this exact plan over the surviving points; the window formulation
    is unchanged and serves as the oracle for that refinement.
    """
    rev = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_suppkey").alias("sk"),
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
            .cast("long")
            .alias("c"),
        )
        .groupBy("sk")
        .agg(F.sum("c").cast("long").alias("revenue_cents"))
    )
    pts = rev.join(
        _t(spark, sf_dir, "supplier").select(
                "s_suppkey",
                F.col("s_name").alias("supplier"),
                F.round(F.col("s_acctbal") * 100, 0).cast("long").alias("bal_cents"),
            ),
        F.col("sk") == F.col("s_suppkey"),
    ).select("supplier", "revenue_cents", "bal_cents")
    w_gt = (
        Window.orderBy(F.col("revenue_cents").desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_ge = (
        Window.orderBy(F.col("revenue_cents").desc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w = pts.select(
        "supplier",
        "revenue_cents",
        "bal_cents",
        F.max("bal_cents").over(w_gt).alias("maxy_gt"),
        F.max("bal_cents").over(w_ge).alias("maxy_ge"),
    )
    return w.filter(
        (F.coalesce(F.col("maxy_gt"), F.lit(-(2**63))) < F.col("bal_cents"))
        & (F.col("maxy_ge") <= F.col("bal_cents"))
    ).select("supplier", "revenue_cents", "bal_cents")


# ---------------------------------------------------------------------------
# Product analytics: daily new vs returning users
# ---------------------------------------------------------------------------
_SQL_NEW_VS_RETURNING = """
    WITH ud AS (
        SELECT DISTINCT user_id,
               CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS BIGINT) AS day
        FROM events),
    f AS (
        SELECT user_id, day,
               MIN(day) OVER (PARTITION BY user_id) AS first_day
        FROM ud)
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new,
           CAST(SUM(CASE WHEN day > first_day THEN 1 ELSE 0 END) AS BIGINT)
               AS n_returning
    FROM f GROUP BY day
    """


@_q("new_vs_returning_users", _SQL_NEW_VS_RETURNING)
def q_new_vs_returning_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users split into first-ever-day (new) vs returning
    — the growth-accounting decomposition behind every DAU chart
    (complements `dau_mau_stickiness`, which ratios the aggregates, and
    `user_retention_weekly`, which follows cohorts forward). "New" is
    defined against the user's entire history via a per-user MIN
    window, not a lookback approximation.

    Scale: the (user, day) distinct collapses event volume to at most
    |users| x |days| before anything else runs; the first-day window
    partitions by user (map-side combinable distinct feeding a
    co-partitioned window — one shuffle serves both), and the final
    rollup groups |days| keys. At 100 TB the first-day table is the
    thing to persist incrementally (it only ever gains NEW users, so
    the daily job unions yesterday's snapshot with today's anti-joined
    newcomers — `incremental_agg_merge` shows that pattern).
    """
    ud = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
            .cast("long")
            .alias("day"),
        )
        .distinct()
    )
    f = ud.withColumn(
        "first_day", F.min("day").over(Window.partitionBy("user_id"))
    )
    return f.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_active"),
        F.sum((F.col("day") == F.col("first_day")).cast("long"))
        .cast("long")
        .alias("n_new"),
        F.sum((F.col("day") > F.col("first_day")).cast("long"))
        .cast("long")
        .alias("n_returning"),
    )


# ---------------------------------------------------------------------------
# Linear multi-touch attribution (complements last_touch_attribution)
# ---------------------------------------------------------------------------
_ATTR_WINDOW_US = 24 * 3600 * 1_000_000  # 24 h in microseconds

_SQL_LINEAR_ATTRIBUTION = f"""
    WITH e AS (
        SELECT user_id, event_type, event_id, epoch_us(ts) AS es
        FROM events),
    nx AS (
        SELECT user_id, event_type, es,
               MIN(CASE WHEN event_type = 'purchase' THEN es END) OVER (
                   PARTITION BY user_id ORDER BY es, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS next_p
        FROM e),
    touches AS (
        SELECT user_id, event_type, next_p
        FROM nx
        WHERE event_type IN ('click', 'view')
          AND next_p IS NOT NULL AND next_p - es <= {_ATTR_WINDOW_US}),
    sized AS (
        SELECT event_type,
               CAST(COUNT(*) OVER (PARTITION BY user_id, next_p) AS BIGINT)
                   AS n_touches
        FROM touches)
    SELECT event_type AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(1000000 // n_touches) AS BIGINT) AS credit_ppm
    FROM sized GROUP BY 1
    """


@_q("linear_attribution", _SQL_LINEAR_ATTRIBUTION)
def q_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (equal-credit) multi-touch attribution: every click/view
    within 24 h before a user's next purchase shares that purchase's
    credit equally — the standard counterweight to
    `last_touch_attribution`, which hands 100% to the final touch.
    Credit is integer ppm (1e6 // touches-per-conversion), so channel
    totals are integer-exact; the "next purchase at-or-after" lookup is
    a forward-frame MIN window with deterministic (es, event_id)
    ordering, the same decorrelation `asof_join_last_signup` uses
    backwards.

    Scale: ONE shuffle on user_id serves the forward-looking window;
    the per-conversion touch count reuses the identical partitioning
    (user_id, next_p) — Catalyst keeps it in the same exchange — and
    the final rollup groups a handful of channels. No join against a
    purchases table, no per-user collect: the purchase timestamps ride
    inside the window frame.
    """
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("es")
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("es", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    nx = e.withColumn(
        "next_p",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("es"))
        ).over(fwd),
    )
    touches = nx.filter(
        F.col("event_type").isin("click", "view")
        & F.col("next_p").isNotNull()
        & (F.col("next_p") - F.col("es") <= _ATTR_WINDOW_US)
    ).select("user_id", "event_type", "next_p")
    sized = touches.withColumn(
        "n_touches",
        F.count(F.lit(1))
        .over(Window.partitionBy("user_id", "next_p"))
        .cast("long"),
    )
    return sized.groupBy(F.col("event_type").alias("channel")).agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.sum(F.expr("1000000 div n_touches")).cast("long").alias("credit_ppm"),
    )


# ---------------------------------------------------------------------------
# Year-over-year monthly revenue delta (gap-robust: join, not lag)
# ---------------------------------------------------------------------------
_SQL_YOY = """
    WITH m AS (
        SELECT CAST(EXTRACT(year FROM o_orderdate) * 100
                   + EXTRACT(month FROM o_orderdate) AS BIGINT) AS yyyymm,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS cents
        FROM orders GROUP BY 1)
    SELECT cur.yyyymm, cur.cents,
           CAST(prev.cents AS BIGINT) AS prev_cents,
           CAST((cur.cents - prev.cents) * 10000 // prev.cents AS BIGINT)
               AS yoy_bp
    FROM m cur LEFT JOIN m prev ON prev.yyyymm = cur.yyyymm - 100
    """


@_q("yoy_revenue", _SQL_YOY)
def q_yoy_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly revenue change in basis points —
    `monthly_revenue_mom`'s sibling with the seasonal (12-month)
    comparison. Deliberately a SELF-JOIN on yyyymm - 100 rather than
    LAG(12): a lag counts ROWS, so one missing month silently compares
    against the wrong year; the arithmetic join is gap-robust and
    yields NULL (not a wrong number) when last year's month is absent.

    Scale: both sides are the |months| rollup (~bounded hundreds of
    rows), so the self-join broadcasts; the heavy lifting is the one
    map-side-combined monthly aggregate over the fact scan. yyyymm
    arithmetic is the same integer trick functions/datetime_fns.py
    documents for the reference's activity-period dimension.
    """
    m = (
        _t(spark, sf_dir, "orders")
        .select(
            (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
            .cast("long")
            .alias("yyyymm"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c"),
        )
        .groupBy("yyyymm")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    prev = m.select(
        F.col("yyyymm").alias("p_yyyymm"), F.col("cents").alias("prev_cents")
    )
    return (
        m.join(
            F.broadcast(prev), F.col("p_yyyymm") == F.col("yyyymm") - 100, "left"
        )
        .select(
            "yyyymm",
            "cents",
            F.col("prev_cents").cast("long").alias("prev_cents"),
            F.expr("(cents - prev_cents) * 10000 div prev_cents")
            .cast("long")
            .alias("yoy_bp"),
        )
    )


# ---------------------------------------------------------------------------
# Robust outliers: median absolute deviation, integer-exact two-pass
# ---------------------------------------------------------------------------
_SQL_MAD = """
    WITH v AS (
        SELECT CAST(FLOOR(o_totalprice) AS BIGINT) AS dollars
        FROM orders),
    h AS (
        SELECT dollars, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY 1),
    c AS (
        SELECT dollars, n,
               SUM(n) OVER (ORDER BY dollars) AS cum,
               (SELECT SUM(n) FROM h) AS total
        FROM h),
    med AS (
        SELECT MIN(dollars) AS med FROM c WHERE 2 * cum >= total + total % 2),
    d AS (
        SELECT ABS(dollars - (SELECT med FROM med)) AS dev FROM v),
    hd AS (
        SELECT dev, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
    cd AS (
        SELECT dev, SUM(n) OVER (ORDER BY dev) AS cum,
               (SELECT SUM(n) FROM hd) AS total
        FROM hd),
    mad AS (
        SELECT MIN(dev) AS mad FROM cd WHERE 2 * cum >= total + total % 2)
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_orders,
           CAST((SELECT med FROM med) AS BIGINT) AS med_dollars,
           CAST((SELECT mad FROM mad) AS BIGINT) AS mad_dollars,
           CAST((SELECT COUNT(*) FROM v
                 WHERE ABS(dollars - (SELECT med FROM med))
                     > 3 * (SELECT mad FROM mad)) AS BIGINT) AS n_outliers
    """


@_q("mad_price_outliers", _SQL_MAD)
def q_mad_price_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier census on order totals via median absolute
    deviation: |x - median| > 3*MAD. Unlike the z-score
    (`daily_anomaly_flags`) this is immune to the outliers polluting
    their own threshold — MAD has a 50% breakdown point — and unlike
    `winsorized_price_stats` it reports a flag count, not clipped
    moments. Both medians are LOWER medians read off a value HISTOGRAM
    with a cumulative-count window (2*cum >= n adjusted for parity):
    pure integer arithmetic, no interpolating percentile on either
    engine. The contract is WHOLE-DOLLAR granularity: at cents
    granularity real prices are near-unique, so the "histogram" decays
    into the row set and its cumulative window into a global sort
    (measured 8.7 s at sf1); dollar flooring caps the histogram at the
    |price-domain| (~500k values here) at ANY scale factor, which is
    the property that makes histogram-median the scalable exact form —
    and a $1 quantization is irrelevant against a 3-MAD fence.

    Scale: the histogram groups by distinct dollar values — bounded by
    the PRICE DOMAIN, not row count — and the cumulative window runs
    over that bounded domain (same histogram-median idea
    `value_histogram`/`percentile_rank_chars` use). Two passes over
    the scan (values, then deviations) with the two scalar medians
    broadcast; no global sort of raw rows ever happens.
    """
    v = _t(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice")).cast("long").alias("dollars")
    )
    h = v.groupBy("dollars").agg(F.count(F.lit(1)).cast("long").alias("n"))
    cw = Window.orderBy("dollars").rangeBetween(Window.unboundedPreceding, 0)
    tot = h.agg(F.sum("n").alias("total"))
    c = h.join(F.broadcast(tot)).withColumn("cum", F.sum("n").over(cw))
    med_df = (
        c.filter(2 * F.col("cum") >= F.col("total") + F.col("total") % 2)
        .agg(F.min("dollars").alias("med"))
    )
    d = v.join(F.broadcast(med_df)).select(
        F.abs(F.col("dollars") - F.col("med")).alias("dev")
    )
    hd = d.groupBy("dev").agg(F.count(F.lit(1)).cast("long").alias("n"))
    cdw = Window.orderBy("dev").rangeBetween(Window.unboundedPreceding, 0)
    totd = hd.agg(F.sum("n").alias("total"))
    cd = hd.join(F.broadcast(totd)).withColumn("cum", F.sum("n").over(cdw))
    mad_df = (
        cd.filter(2 * F.col("cum") >= F.col("total") + F.col("total") % 2)
        .agg(F.min("dev").alias("mad"))
    )
    flagged = (
        v.join(F.broadcast(med_df))
        .join(F.broadcast(mad_df))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(
                (F.abs(F.col("dollars") - F.col("med")) > 3 * F.col("mad")).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )
    return (
        flagged.join(F.broadcast(med_df))
        .join(F.broadcast(mad_df))
        .select(
            "n_orders",
            F.col("med").cast("long").alias("med_dollars"),
            F.col("mad").cast("long").alias("mad_dollars"),
            "n_outliers",
        )
    )
