"""Round-4 batch 18: session-quality rollup, deterministic A/B test
readout, percent-of-parent hierarchy shares, signup-cohort LTV curves,
and categorical mix-shift drift.

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
# Session quality: bounce rate + histogram-median duration, one row
# ---------------------------------------------------------------------------
_SQL_SESSION_QUALITY = """
    WITH ordered AS (
        SELECT user_id, event_id, ts, CAST(FLOOR(epoch(ts)) AS BIGINT) AS es,
               LAG(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_es
        FROM events),
    marked AS (
        SELECT *, CASE WHEN prev_es IS NULL OR es - prev_es > 1800
                       THEN 1 ELSE 0 END AS is_new
        FROM ordered),
    sess AS (
        SELECT user_id,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS seq,
               es
        FROM marked),
    per AS (
        SELECT user_id, seq, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MAX(es) - MIN(es) AS BIGINT) AS dur_s
        FROM sess GROUP BY 1, 2),
    h AS (
        SELECT dur_s, CAST(COUNT(*) AS BIGINT) AS n FROM per GROUP BY 1),
    c AS (
        SELECT dur_s, SUM(n) OVER (ORDER BY dur_s) AS cum,
               (SELECT SUM(n) FROM h) AS total
        FROM h),
    med AS (
        SELECT MIN(dur_s) AS med FROM c WHERE 2 * cum >= total + total % 2)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounce,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 10000
               // COUNT(*) AS BIGINT) AS bounce_bp,
           CAST((SELECT med FROM med) AS BIGINT) AS med_duration_s,
           CAST(SUM(n_events) * 1000000 // COUNT(*) AS BIGINT)
               AS events_per_session_ppm
    FROM per
    """


@_q("session_quality", _SQL_SESSION_QUALITY)
def q_session_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-quality rollup on the SAME 30-min gap definition as
    `events_sessionize`: bounce rate (single-event sessions, in bp),
    median session duration, and mean events-per-session in ppm — the
    three numbers a funnel review opens with. The median is the lower
    median read off a DURATION HISTOGRAM with a cumulative window
    (`mad_price_outliers` technique), so no float percentile exists on
    either engine; the mean is integer ppm.

    Scale: one shuffle on user_id drives both session windows (lag +
    running sum share the partitioning), the per-session rollup groups
    (user, seq) on the same exchange, and the duration histogram is
    bounded by the DISTINCT-SECONDS domain, not session count. The
    final aggregate is one row. At 100 TB the histogram window (the
    only global-order step) runs over that bounded domain — exactly
    the property that makes histogram-median the scalable exact form.
    """
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("es"), "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.withColumn(
        "is_new",
        F.when(
            F.lag("es").over(w).isNull()
            | (F.col("es") - F.lag("es").over(w) > 1800),
            1,
        ).otherwise(0),
    )
    # SAME (ts, event_id) order as the lag window above and as
    # events_sessionize — an es-ordered cumsum would disagree with the
    # ts-ordered boundary marker on sub-second ties whose event_id
    # order opposes their ts order
    ws = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = marked.withColumn("seq", F.sum("is_new").over(ws))
    per = sess.groupBy("user_id", "seq").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.max("es") - F.min("es")).cast("long").alias("dur_s"),
    )
    h = per.groupBy("dur_s").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = h.agg(F.sum("n").alias("total"))
    cw = Window.orderBy("dur_s").rangeBetween(Window.unboundedPreceding, 0)
    c = h.join(F.broadcast(tot)).withColumn("cum", F.sum("n").over(cw))
    med = c.filter(2 * F.col("cum") >= F.col("total") + F.col("total") % 2).agg(
        F.min("dur_s").alias("med")
    )
    bounce = (F.col("n_events") == 1).cast("long")
    top = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(bounce).cast("long").alias("n_bounce"),
        F.sum("n_events").cast("long").alias("tot_events"),
    )
    return top.join(F.broadcast(med)).select(
        "n_sessions",
        "n_bounce",
        F.expr("n_bounce * 10000 div n_sessions").cast("long").alias("bounce_bp"),
        F.col("med").cast("long").alias("med_duration_s"),
        F.expr("tot_events * 1000000 div n_sessions")
        .cast("long")
        .alias("events_per_session_ppm"),
    )


# ---------------------------------------------------------------------------
# A/B test readout: deterministic assignment, integer conversion rates
# ---------------------------------------------------------------------------
_SQL_AB_TEST = """
    WITH assigned AS (
        SELECT user_id, CAST(user_id % 2 AS BIGINT) AS variant,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted,
               COUNT(*) AS n_events
        FROM events GROUP BY 1),
    per AS (
        SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(converted) AS BIGINT) AS n_converters,
               CAST(SUM(n_events) AS BIGINT) AS n_events
        FROM assigned GROUP BY 1)
    SELECT variant, n_users, n_converters, n_events,
           CAST(n_converters * 1000000 // n_users AS BIGINT)
               AS conversion_ppm
    FROM per
    """


@_q("ab_test_readout", _SQL_AB_TEST)
def q_ab_test_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users deterministically assigned to two
    variants, per-variant user counts, converter counts (>= 1 purchase
    event), event volume, and conversion in integer ppm — the
    experimentation primitive every growth pipeline bolts on. The
    parity assignment stands in for the production
    ``pmod(xxhash64(user_id, salt), k)`` (`train_split_assign` shows
    that form) so the oracle is integer-exact; significance testing
    happens downstream on these exact counts (the z-statistic needs a
    sqrt, which is deliberately NOT computed in the hashed output).

    Scale: assignment is a row-local expression; the per-user converter
    flag is one map-side-combined MAX aggregate on user_id; the variant
    rollup reduces to k rows. No step carries more than 4 integers per
    user, and the user aggregate is the same exchange the sessionizer
    family uses — an engine running the whole readout suite reuses it.
    """
    assigned = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            (F.col("user_id") % 2).cast("long").alias("variant"),
            (F.col("event_type") == "purchase").cast("long").alias("is_p"),
        )
        .groupBy("user_id", "variant")
        .agg(
            F.max("is_p").alias("converted"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    per = assigned.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_converters"),
        F.sum("n_events").cast("long").alias("n_events"),
    )
    return per.select(
        "variant",
        "n_users",
        "n_converters",
        "n_events",
        F.expr("n_converters * 1000000 div n_users")
        .cast("long")
        .alias("conversion_ppm"),
    )


# ---------------------------------------------------------------------------
# Percent-of-parent hierarchy: nation share of region, region of total
# ---------------------------------------------------------------------------
_SQL_HIERARCHY_SHARE = """
    WITH nat AS (
        SELECT r_name AS region, n_name AS nation,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS cents
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1, 2)
    SELECT region, nation, cents,
           CAST(cents * 10000 // SUM(cents) OVER (PARTITION BY region)
               AS BIGINT) AS share_of_region_bp,
           CAST(SUM(cents) OVER (PARTITION BY region) * 10000
               // SUM(cents) OVER () AS BIGINT) AS region_share_bp
    FROM nat
    """


@_q("hierarchy_share", _SQL_HIERARCHY_SHARE)
def q_hierarchy_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent hierarchical report: each nation's revenue
    share WITHIN its region plus each region's share of the grand
    total, in basis points — the drill-down table a BI layer renders as
    a treemap, and the share-normalization `rollup_nation_segment`
    (which emits subtotal ROWS) deliberately leaves to the reader.
    Both parent totals are WINDOW sums over the ~25-row nation rollup,
    so no join-back against subtotal tables and no second fact scan.

    Scale: one fact scan with all three dims broadcast, one shuffle
    into the (region, nation) rollup; the two window sums run over the
    bounded rollup (the empty-frame grand total is a single-partition
    step over ~25 rows — at wider key domains swap it for a broadcast
    scalar join, `decile_lift` shows that form). Integer-division
    shares, so the oracle hash is exact.
    """
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c"),
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", F.col("n_name").alias("nation")
    )
    reg = _t(spark, sf_dir, "region").select(
        "r_regionkey", F.col("r_name").alias("region")
    )
    rollup = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("region", "nation")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    wr = Window.partitionBy("region")
    wall = Window.partitionBy()
    # integer div (not float / + cast): double division can land a hair
    # above an exact integer and truncate differently than the oracle's
    # floor-div at scale
    return rollup.select(
        "region",
        "nation",
        "cents",
        F.sum("cents").over(wr).alias("region_total"),
        F.sum("cents").over(wall).alias("grand_total"),
    ).select(
        "region",
        "nation",
        "cents",
        F.expr("cents * 10000 div region_total")
        .cast("long")
        .alias("share_of_region_bp"),
        F.expr("region_total * 10000 div grand_total")
        .cast("long")
        .alias("region_share_bp"),
    )


# ---------------------------------------------------------------------------
# Cohort LTV: signup-week cohorts, cumulative purchase value by week
# ---------------------------------------------------------------------------
_SQL_COHORT_LTV = """
    WITH first_seen AS (
        SELECT user_id,
               CAST(MIN(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   // 7) AS BIGINT) AS cohort_wk
        FROM events GROUP BY 1),
    weekly AS (
        SELECT f.cohort_wk,
               CAST(date_diff('day', DATE '1970-01-01', CAST(e.ts AS DATE))
                   // 7 AS BIGINT) - f.cohort_wk AS wk_offset,
               CAST(SUM(CAST(ROUND(e.value * 100, 0) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events e JOIN first_seen f ON e.user_id = f.user_id
        WHERE e.event_type = 'purchase'
        GROUP BY 1, 2),
    cohort_size AS (
        SELECT cohort_wk, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM first_seen GROUP BY 1)
    SELECT w.cohort_wk, w.wk_offset, s.n_users,
           CAST(SUM(w.cents) OVER (PARTITION BY w.cohort_wk
               ORDER BY w.wk_offset) AS BIGINT) AS cum_cents,
           CAST(SUM(w.cents) OVER (PARTITION BY w.cohort_wk
               ORDER BY w.wk_offset) // s.n_users AS BIGINT)
               AS ltv_cents_per_user
    FROM weekly w JOIN cohort_size s ON w.cohort_wk = s.cohort_wk
    """


@_q("cohort_ltv", _SQL_COHORT_LTV)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: users grouped by first-seen week,
    purchase value accumulated by weeks-since-signup, per-user LTV in
    integer cents — the revenue companion to `user_retention_weekly`
    (which counts presence, not value). The cumulative sum is a window
    over the bounded (cohort, offset) rollup; division by cohort size
    happens AFTER accumulation so the per-user curve is integer-exact.

    Scale: first-seen is one MIN aggregate on user_id; attaching the
    cohort to purchases is a user-keyed join that reuses that exchange;
    the weekly rollup collapses to |cohorts| x |offsets| rows before
    the window runs. The first-seen table is the incrementally
    maintainable piece (`new_vs_returning_users` documents the
    union-with-newcomers update).
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.floor(
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01")) / 7
        )
        .cast("long")
        .alias("wk"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    first_seen = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    weekly = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_seen, "user_id")
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("wk_offset"))
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    size = first_seen.groupBy("cohort_wk").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    cw = Window.partitionBy("cohort_wk").orderBy("wk_offset")
    return (
        weekly.join(F.broadcast(size), "cohort_wk")
        .select(
            "cohort_wk",
            "wk_offset",
            "n_users",
            F.sum("cents").over(cw).cast("long").alias("cum_cents"),
            F.expr(
                "cast(sum(cents) over (partition by cohort_wk order by wk_offset)"
                " div n_users as long)"
            ).alias("ltv_cents_per_user"),
        )
    )


# ---------------------------------------------------------------------------
# Categorical mix shift: order-priority distribution drift, integer L1
# ---------------------------------------------------------------------------
_SQL_PRIORITY_MIX = """
    WITH tagged AS (
        SELECT o_orderpriority AS prio,
               CASE WHEN EXTRACT(year FROM o_orderdate) <= 1997
                    THEN 'early' ELSE 'late' END AS era
        FROM orders),
    per AS (
        SELECT prio, era, CAST(COUNT(*) AS BIGINT) AS n
        FROM tagged GROUP BY 1, 2),
    tot AS (
        SELECT era, CAST(SUM(n) AS BIGINT) AS t FROM per GROUP BY 1),
    shares AS (
        SELECT per.prio,
               CAST(SUM(CASE WHEN per.era = 'early'
                    THEN per.n * 10000 // tot.t ELSE 0 END) AS BIGINT)
                   AS early_bp,
               CAST(SUM(CASE WHEN per.era = 'late'
                    THEN per.n * 10000 // tot.t ELSE 0 END) AS BIGINT)
                   AS late_bp
        FROM per JOIN tot ON per.era = tot.era
        GROUP BY 1)
    SELECT prio, early_bp, late_bp,
           CAST(ABS(late_bp - early_bp) AS BIGINT) AS abs_shift_bp
    FROM shares
    """


@_q("priority_mix_shift", _SQL_PRIORITY_MIX)
def q_priority_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical mix-shift drift: the order-priority distribution of
    the early era (<= 1997) vs the late era, per-category shares in bp
    and the absolute shift — the categorical twin of `event_drift`
    (which tracks a numeric mean) and the check that catches an
    upstream enum being remapped or a priority class quietly dying.
    Thresholding |shift| happens downstream; the hashed output keeps
    the exact integer shares.

    Scale: one scan, one (priority x era) aggregate (10 keys), era
    totals broadcast back, pivot to one row per category via
    conditional sums — the same conditional-aggregation shape the
    reference's order-summary fact uses (`ordr_sm_fct`). Constant
    output size regardless of input volume.
    """
    tagged = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.when(F.year("o_orderdate") <= 1997, "early")
        .otherwise("late")
        .alias("era"),
    )
    per = tagged.groupBy("prio", "era").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = per.groupBy("era").agg(F.sum("n").cast("long").alias("t"))
    shares = (
        per.join(F.broadcast(tot), "era")
        .withColumn("share_bp", F.expr("n * 10000 div t"))
        .groupBy("prio")
        .agg(
            F.sum(F.when(F.col("era") == "early", F.col("share_bp")).otherwise(0))
            .cast("long")
            .alias("early_bp"),
            F.sum(F.when(F.col("era") == "late", F.col("share_bp")).otherwise(0))
            .cast("long")
            .alias("late_bp"),
        )
    )
    return shares.select(
        "prio",
        "early_bp",
        "late_bp",
        F.abs(F.col("late_bp") - F.col("early_bp"))
        .cast("long")
        .alias("abs_shift_bp"),
    )
