"""Round-4 batch 61: standardized-residual cells of the priority ×
region contingency table, sessionization gap-parameter sensitivity,
and a cross-table freshness audit.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic; the standardized residual uses the
`wilson_interval_weekly` IEEE-sqrt exception.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Standardized residuals of the priority x region table
# ---------------------------------------------------------------------------
_SQL_CHI_CELLS = """
    WITH cell AS (
        SELECT o.o_orderpriority AS pr, r.r_name AS region,
               CAST(COUNT(*) AS BIGINT) AS o_cnt
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2),
    marg AS (
        SELECT pr, region, o_cnt,
               CAST(SUM(o_cnt) OVER (PARTITION BY pr) AS BIGINT) AS rp,
               CAST(SUM(o_cnt) OVER (PARTITION BY region) AS BIGINT) AS rc,
               CAST(SUM(o_cnt) OVER () AS BIGINT) AS n
        FROM cell)
    SELECT pr AS o_orderpriority, region AS r_name, o_cnt AS observed,
           CAST(rp * rc // n AS BIGINT) AS expected,
           CAST(FLOOR((CAST(o_cnt AS DOUBLE)
                       - CAST(rp AS DOUBLE) * CAST(rc AS DOUBLE)
                         / CAST(n AS DOUBLE))
                / SQRT(CAST(rp AS DOUBLE) * CAST(rc AS DOUBLE)
                       / CAST(n AS DOUBLE)) * 1000.0) AS BIGINT)
               AS std_residual_milli
    FROM marg
    """


@_q("cells_chi_contrib", _SQL_CHI_CELLS)
def q_cells_chi_contrib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STANDARDIZED RESIDUALS of the priority × region contingency
    table: (observed − expected)/√expected per cell in milli — the
    drill-down `independence_tvd` cannot give: that query says
    WHETHER priority mix depends on region, this says WHICH cells
    carry the dependence and in which direction (|z| > 2000 milli is
    the conventional "this cell is the story" cut). Expected counts
    come from the margins; the one sqrt is over an exact
    rational of int64 margins, under the `wilson_interval_weekly`
    IEEE exception.

    Scale: one dimension-joined fact pass to the 25-cell census;
    margins are windows over those 25 rows; residuals are row-local.
    Bigger tables only widen the bounded census.
    """
    cell = (
        _t(spark, sf_dir, "orders")
        .join(
            _t(spark, sf_dir, "customer").select(
                    "c_custkey", "c_nationkey"
                ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").select(
                    "n_nationkey", "n_regionkey"
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(
            F.col("o_orderpriority").alias("pr"),
            F.col("r_name").alias("region"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("o_cnt"))
    )
    from pyspark.sql import Window as W

    marg = cell.select(
        "pr",
        "region",
        "o_cnt",
        F.sum("o_cnt").over(W.partitionBy("pr")).cast("long").alias("rp"),
        F.sum("o_cnt")
        .over(W.partitionBy("region"))
        .cast("long")
        .alias("rc"),
        F.sum("o_cnt").over(W.partitionBy()).cast("long").alias("n"),
    )
    return marg.selectExpr(
        "pr AS o_orderpriority",
        "region AS r_name",
        "o_cnt AS observed",
        "CAST(rp * rc div n AS BIGINT) AS expected",
        "CAST(FLOOR((CAST(o_cnt AS DOUBLE)"
        " - CAST(rp AS DOUBLE) * CAST(rc AS DOUBLE) / CAST(n AS DOUBLE))"
        " / SQRT(CAST(rp AS DOUBLE) * CAST(rc AS DOUBLE)"
        " / CAST(n AS DOUBLE)) * 1000.0) AS BIGINT)"
        " AS std_residual_milli",
    )


# ---------------------------------------------------------------------------
# Sessionization gap-parameter sensitivity
# ---------------------------------------------------------------------------
_SG_GAPS = (900, 1800, 3600)  # seconds

_SQL_SESSION_SENS = f"""
    WITH ev AS (
        -- FLOOR before the cast: DuckDB double->bigint casts ROUND,
        -- Spark's unix_timestamp FLOORS sub-second timestamps
        SELECT user_id,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS es,
               event_id
        FROM events),
    ordered AS (
        SELECT user_id, es,
               LAG(es) OVER (PARTITION BY user_id
                             ORDER BY es, event_id) AS prev_es
        FROM ev),
    starts AS (
        SELECT t.gap,
               CAST(SUM(CASE WHEN ordered.prev_es IS NULL
                              OR ordered.es - ordered.prev_es > t.gap
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM ordered, (SELECT UNNEST(ARRAY{list(_SG_GAPS)}) AS gap) t
        GROUP BY 1)
    SELECT CAST(gap AS BIGINT) AS gap_seconds, n_sessions,
           CAST(n_events * 1000 // n_sessions AS BIGINT)
               AS events_per_session_milli
    FROM starts
    """


@_q("session_gap_sensitivity", _SQL_SESSION_SENS)
def q_session_gap_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARAMETER-SENSITIVITY AUDIT for sessionization: the session
    count and mean session size at 15/30/60-minute inactivity gaps,
    from ONE lag pass (a session starts where the user's gap exceeds
    the threshold — counting starts needs no per-threshold re-
    sessionization). If the session count swings hard between 15 and
    60 minutes, every session-grain metric (`session_quality`,
    `events_sessionize`) inherits that instability — this query is
    the one-screen justification for whichever gap the shop
    standardizes on. Orders by the repo-wide (ts, event_id)
    sub-second tie contract.

    Scale: one user-partitioned lag window over the event stream,
    then a 3-way row-local fan-out of BOOLEANS into a 3-cell rollup
    — the sensitivity sweep costs one extra CASE per threshold, not
    one extra pass per threshold.
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_timestamp("ts").cast("long").alias("es"),
        "event_id",
    )
    from pyspark.sql import Window as W

    ordered = ev.select(
        "es",
        F.lag("es")
        .over(W.partitionBy("user_id").orderBy("es", "event_id"))
        .alias("prev_es"),
    )
    gaps = ev.sparkSession.createDataFrame(
        [(int(g),) for g in _SG_GAPS], "gap long"
    )
    starts = (
        ordered.crossJoin(F.broadcast(gaps))
        .groupBy("gap")
        .agg(
            F.sum(
                (
                    F.col("prev_es").isNull()
                    | (F.col("es") - F.col("prev_es") > F.col("gap"))
                ).cast("long")
            )
            .cast("long")
            .alias("n_sessions"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )
    return starts.selectExpr(
        "CAST(gap AS BIGINT) AS gap_seconds",
        "n_sessions",
        "CAST(n_events * 1000 div n_sessions AS BIGINT)"
        " AS events_per_session_milli",
    )


# ---------------------------------------------------------------------------
# Cross-table freshness audit
# ---------------------------------------------------------------------------
_SQL_FRESHNESS = """
    WITH stamps AS (
        SELECT 'orders' AS tbl,
               CAST(MAX(date_diff('day', DATE '1970-01-01', o_orderdate))
                   AS BIGINT) AS last_day,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM orders
        UNION ALL
        SELECT 'lineitem',
               CAST(MAX(date_diff('day', DATE '1970-01-01', l_shipdate))
                   AS BIGINT),
               CAST(COUNT(*) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'events',
               CAST(MAX(date_diff('day', DATE '1970-01-01',
                                  CAST(ts AS DATE))) AS BIGINT),
               CAST(COUNT(*) AS BIGINT)
        FROM events),
    h AS (SELECT MAX(last_day) AS horizon FROM stamps)
    SELECT s.tbl AS table_name, s.n_rows, s.last_day,
           CAST(h.horizon - s.last_day AS BIGINT) AS staleness_days
    FROM stamps s, h
    """


@_q("freshness_audit", _SQL_FRESHNESS)
def q_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FRESHNESS AUDIT: each fact table's newest business timestamp
    against the freshest table in the warehouse — staleness_days > 0
    on one feed while its siblings advanced is the load-pipeline
    alarm every morning-report job should check BEFORE computing
    (`feed_reconcile_daily` compares volumes; this compares CLOCKS,
    catching the stuck-partition case volumes miss). Business
    timestamps, not file mtimes, so the audit is engine- and
    storage-portable.

    Scale: one MAX/COUNT aggregate per table — parquet footer
    statistics make the MAX near-free; at 100 TB this query reads
    metadata, not data, when the lake keeps column stats.
    """
    o = _t(spark, sf_dir, "orders").agg(
        F.lit("orders").alias("tbl"),
        F.max(
            F.datediff(
                F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
            )
        )
        .cast("long")
        .alias("last_day"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    li = _t(spark, sf_dir, "lineitem").agg(
        F.lit("lineitem").alias("tbl"),
        F.max(
            F.datediff(
                F.col("l_shipdate"), F.lit("1970-01-01").cast("date")
            )
        )
        .cast("long")
        .alias("last_day"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    ev = _t(spark, sf_dir, "events").agg(
        F.lit("events").alias("tbl"),
        F.max(
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            )
        )
        .cast("long")
        .alias("last_day"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    stamps = o.unionAll(li).unionAll(ev)
    h = stamps.agg(F.max("last_day").alias("horizon"))
    return stamps.crossJoin(F.broadcast(h)).select(
        F.col("tbl").alias("table_name"),
        "n_rows",
        "last_day",
        (F.col("horizon") - F.col("last_day")).cast("long").alias(
            "staleness_days"
        ),
    )
