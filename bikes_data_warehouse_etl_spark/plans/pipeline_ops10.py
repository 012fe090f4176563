"""Training-data pipeline operators, round 2 batch 10: last-touch
revenue attribution, join-cardinality estimation from bounded
sketches (vs the exact count, computed WITHOUT executing the join),
inter-arrival bot filtering, deterministic negative sampling for
contrastive training pairs, and leakage-safe group k-fold assignment.

Standing contract: integer cross-engine arithmetic, identical column
aliases on both sides, bounded key spaces before joined/windowed
steps, scale note per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.text import hash64
from bikes_data_warehouse_etl_spark.plans.extensions import _sql_hash64
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Last-touch attribution
# ---------------------------------------------------------------------------
_SQL_LAST_TOUCH = """
    WITH ev AS (
        SELECT event_id, user_id, event_type,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS cents, ts
        FROM events),
    att AS (
        SELECT event_type, cents,
               COALESCE(
                   last_value(CASE WHEN event_type IN ('click', 'view')
                                   THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING),
                   'none') AS channel
        FROM ev)
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(cents) AS BIGINT) AS attributed_cents
    FROM att
    WHERE event_type = 'purchase'
    GROUP BY channel
    """


@_q("last_touch_attribution", _SQL_LAST_TOUCH)
def q_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-style last-touch attribution: every purchase's value
    (integer cents) is credited to the user's most recent preceding
    click or view — purchases with no prior touch credit 'none'. The
    running "last seen channel" is a single ignore-nulls window, the
    same mechanism a streaming job would keep as per-user state.

    Scale: one shuffle on user_id, then a per-user ordered walk —
    events for one user sort within their partition only (no global
    sort); ties break on event_id so the walk is deterministic
    cross-engine. The rollup output is ≤ 3 rows.
    """
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        "ts",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chan = F.last(
        F.when(
            F.col("event_type").isin("click", "view"), F.col("event_type")
        ),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("channel", F.coalesce(chan, F.lit("none")))
        .where(F.col("event_type") == "purchase")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum("cents").cast("long").alias("attributed_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Join-cardinality estimation without executing the join
# ---------------------------------------------------------------------------
_SQL_JOIN_EST = """
    WITH bl AS (
        SELECT l_orderkey % 1024 AS b, COUNT(*) AS cl
        FROM lineitem GROUP BY 1),
    bo AS (
        SELECT o_orderkey % 1024 AS b, COUNT(*) AS co
        FROM orders GROUP BY 1),
    est AS (
        SELECT CAST(SUM(cl * co) AS BIGINT) AS est_rows
        FROM bl JOIN bo USING (b)),
    hl AS (SELECT l_orderkey AS k, COUNT(*) AS cl
           FROM lineitem GROUP BY 1),
    ho AS (SELECT o_orderkey AS k, COUNT(*) AS co
           FROM orders GROUP BY 1),
    ex AS (
        SELECT CAST(SUM(cl * co) AS BIGINT) AS exact_rows
        FROM hl JOIN ho USING (k))
    SELECT est.est_rows, ex.exact_rows,
           CAST((est.est_rows - ex.exact_rows) * 1000000
                // ex.exact_rows AS BIGINT) AS overest_ppm
    FROM est, ex
    """


@_q("join_size_estimate", _SQL_JOIN_EST)
def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinality estimation the way a cost-based planner does it:
    |lineitem ⋈ orders| predicted from 1 024-bucket key-count
    sketches (Σ_b cl·co — an upper bound that collapses colliding
    keys), reported against the EXACT join size — itself computed
    without materializing a single joined row, by joining the per-key
    COUNT histograms and summing count products.

    Scale: the sketch side shuffles 1 024 fixed rows per input no
    matter how large the facts are — this is the estimate you can
    afford before choosing broadcast vs shuffle vs skew-salting. The
    exact side shuffles one row per DISTINCT key (not per fact row).
    Bucket count bounds the product overflow: at 10¹¹-row facts move
    to 2²⁰ buckets so per-bucket products stay inside int64.
    """
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    bl = li.groupBy((F.col("l_orderkey") % 1024).alias("b")).agg(
        F.count(F.lit(1)).alias("cl")
    )
    bo = o.groupBy((F.col("o_orderkey") % 1024).alias("b")).agg(
        F.count(F.lit(1)).alias("co")
    )
    est = bl.join(bo, "b").agg(
        F.sum(F.col("cl") * F.col("co")).cast("long").alias("est_rows")
    )
    hl = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("cl")
    )
    ho = o.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("co")
    )
    ex = hl.join(ho, "k").agg(
        F.sum(F.col("cl") * F.col("co")).cast("long").alias("exact_rows")
    )
    return (
        est.crossJoin(F.broadcast(ex))
        .select(
            "est_rows",
            "exact_rows",
            F.expr(
                "CAST((est_rows - exact_rows) * 1000000 "
                "div exact_rows AS LONG)"
            ).alias("overest_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Inter-arrival bot filtering
# ---------------------------------------------------------------------------
_SQL_BOT_FILTER = """
    WITH g AS (
        SELECT user_id,
               epoch(ts) - lag(epoch(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS gap
        FROM events),
    u AS (
        SELECT user_id,
               CAST(SUM(gap) AS BIGINT) AS sum_gap,
               COUNT(gap) AS n_gaps
        FROM g WHERE gap IS NOT NULL GROUP BY user_id),
    tot AS (
        SELECT CAST(SUM(sum_gap) AS BIGINT)
               // CAST(SUM(n_gaps) AS BIGINT) AS g_mean
        FROM u),
    cls AS (
        SELECT CASE WHEN (sum_gap // n_gaps) * 100 < g_mean * 85
                    THEN 'flagged' ELSE 'clean' END AS flag,
               n_gaps + 1 AS n_events, sum_gap, n_gaps
        FROM u, tot)
    SELECT flag,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(SUM(sum_gap) // SUM(n_gaps) AS BIGINT) AS mean_gap_s
    FROM cls GROUP BY flag
    """


@_q("bot_user_filter", _SQL_BOT_FILTER)
def q_bot_user_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral bot screening: users whose mean inter-event gap is
    below 85% of the corpus-wide mean gap get flagged — the
    curation gate that keeps scripted/spammy actors out of a training
    corpus. All arithmetic is integer seconds (sum div count), so the
    threshold compare is exact cross-engine.

    Scale: one shuffle on user_id for the LAG walk, then per-user
    rows collapse to (sum_gap, n_gaps) — the global mean is a
    broadcast scalar over that per-user aggregate, and the final
    rollup has 2 keys. No per-event state survives the first
    aggregate.
    """
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_timestamp("ts").cast("long").alias("es")
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    g = ev.select(
        "user_id", (F.col("es") - F.lag("es").over(w)).alias("gap")
    ).where(F.col("gap").isNotNull())
    u = g.groupBy("user_id").agg(
        F.sum("gap").cast("long").alias("sum_gap"),
        F.count("gap").alias("n_gaps"),
    )
    tot = u.agg(
        F.expr(
            "CAST(CAST(SUM(sum_gap) AS LONG) div "
            "CAST(SUM(n_gaps) AS LONG) AS LONG)"
        ).alias("g_mean")
    )
    cls = u.crossJoin(F.broadcast(tot)).select(
        F.when(
            F.expr("(sum_gap div n_gaps) * 100") < F.col("g_mean") * 85,
            "flagged",
        )
        .otherwise("clean")
        .alias("flag"),
        (F.col("n_gaps") + 1).alias("n_events"),
        "sum_gap",
        "n_gaps",
    )
    return cls.groupBy("flag").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.expr("CAST(SUM(sum_gap) div SUM(n_gaps) AS LONG)").alias(
            "mean_gap_s"
        ),
    )


# ---------------------------------------------------------------------------
# Deterministic negative sampling
# ---------------------------------------------------------------------------
_SQL_NEG_SAMPLES = f"""
    WITH maxp AS (SELECT MAX(p_partkey) AS mp FROM part),
    cand AS (
        SELECT c_custkey AS ck, c_mktsegment AS segment,
               {_sql_hash64("CAST(c_custkey AS VARCHAR) || ':' || CAST(i.i AS VARCHAR)")}
                   % (SELECT mp FROM maxp) + 1 AS cand_pk
        FROM customer, generate_series(1, 3) AS i(i)),
    bought AS (
        SELECT DISTINCT o_custkey AS ck, l_partkey AS pk
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    clean AS (
        SELECT cand.segment FROM cand
        ANTI JOIN bought ON cand.ck = bought.ck AND cand.cand_pk = bought.pk),
    nc AS (SELECT segment, COUNT(*) AS n_candidates FROM cand
           GROUP BY segment),
    ncl AS (SELECT segment, COUNT(*) AS n_clean FROM clean
            GROUP BY segment)
    SELECT nc.segment,
           CAST(nc.n_candidates AS BIGINT) AS n_candidates,
           CAST(COALESCE(ncl.n_clean, 0) AS BIGINT) AS n_clean,
           CAST((nc.n_candidates - COALESCE(ncl.n_clean, 0)) * 1000000
                // nc.n_candidates AS BIGINT) AS collision_ppm
    FROM nc LEFT JOIN ncl USING (segment)
    """


@_q("negative_samples", _SQL_NEG_SAMPLES)
def q_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training negative sampling: each customer gets 3
    deterministic pseudo-random candidate parts (hash of
    customer:index → part id), and candidates that the customer
    actually bought are rejected by an anti-join against the purchase
    pairs — the standard way (user, item⁻) pairs are mined for
    recommendation / embedding training. The report counts candidates
    vs surviving negatives per market segment with the collision rate
    in ppm.

    Scale: candidate generation is row-local (hash arithmetic, no
    RNG state); the reject step is one anti-join shuffled on the
    (customer, part) pair — both sides fixed-width keys. The bought
    set is distinct-reduced BEFORE the join, so the anti probe scans
    unique pairs, not raw line items.
    """
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    p = _t(spark, sf_dir, "part").select("p_partkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    maxp = p.agg(F.max("p_partkey").alias("mp"))
    cand = (
        c.select(
            F.col("c_custkey").alias("ck"),
            F.col("c_mktsegment").alias("segment"),
            F.explode(F.sequence(F.lit(1), F.lit(3))).alias("i"),
        )
        .crossJoin(F.broadcast(maxp))
        .select(
            "ck",
            "segment",
            (
                hash64(
                    F.concat(
                        F.col("ck").cast("string"),
                        F.lit(":"),
                        F.col("i").cast("string"),
                    )
                )
                % F.col("mp")
                + 1
            ).alias("cand_pk"),
        )
    )
    bought = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    clean = cand.join(
        bought,
        (cand.ck == bought.ck) & (cand.cand_pk == bought.pk),
        "left_anti",
    )
    nc = cand.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_candidates")
    )
    ncl = clean.groupBy("segment").agg(F.count(F.lit(1)).alias("n_clean"))
    return (
        nc.join(ncl, "segment", "left")
        .select(
            "segment",
            F.col("n_candidates").cast("long").alias("n_candidates"),
            F.coalesce(F.col("n_clean"), F.lit(0))
            .cast("long")
            .alias("n_clean"),
            F.expr(
                "CAST((n_candidates - coalesce(n_clean, 0)) * 1000000 "
                "div n_candidates AS LONG)"
            ).alias("collision_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Leakage-safe group k-fold
# ---------------------------------------------------------------------------
_SQL_GROUP_KFOLD = f"""
    WITH ev AS (
        SELECT user_id,
               {_sql_hash64("'fold:' || CAST(user_id AS VARCHAR)")} % 5
                   AS fold
        FROM events),
    per_user AS (
        SELECT user_id, COUNT(DISTINCT fold) AS nf FROM ev
        GROUP BY user_id),
    leak AS (
        SELECT CAST(COUNT(CASE WHEN nf > 1 THEN 1 END) AS BIGINT)
               AS n_leaked_users
        FROM per_user)
    SELECT CAST(fold AS INT) AS fold,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           (SELECT n_leaked_users FROM leak) AS n_leaked_users
    FROM ev GROUP BY fold
    """


@_q("group_kfold_assign", _SQL_GROUP_KFOLD)
def q_group_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group k-fold assignment that cannot leak: the fold is a pure
    function of user_id (portable hash mod 5), so every event of a
    user lands in the same fold BY CONSTRUCTION — and the query
    certifies it anyway, counting users observed in more than one
    fold (must be 0) the honest way instead of asserting it. Fold
    sizes show the hash balance.

    Scale: fold assignment is row-local; the certification is one
    distinct-fold-per-user aggregate (shuffle on user_id) and the
    size report is a 5-key rollup. Contrast `train_split_assign`,
    which splits DOCUMENTS — this splits by GROUP, the form required
    when rows of one user are correlated (session data, dialog
    turns).
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        (
            hash64(F.concat(F.lit("fold:"), F.col("user_id").cast("string")))
            % 5
        ).alias("fold"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.countDistinct("fold").alias("nf")
    )
    leak = per_user.agg(
        F.count(F.when(F.col("nf") > 1, 1))
        .cast("long")
        .alias("n_leaked_users")
    )
    return (
        ev.groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .crossJoin(F.broadcast(leak))
        .select(
            F.col("fold").cast("int").alias("fold"),
            "n_events",
            "n_users",
            "n_leaked_users",
        )
    )
