"""Round-4 batch 31: operations-monitoring and layout-planning shapes —
a p-chart (proportion control chart) on weekly late shipments, a
greedy file-compaction planner, and k-core graph peeling.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.plans.pipeline_ops16 import (
    co_order_edges,
    sql_coorder_edge_ctes,
)
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# p-chart: weekly late-shipment proportion with 3-sigma binomial limits
# ---------------------------------------------------------------------------
_PC_LATE_DAYS = 100

_SQL_PCHART = f"""
    WITH lines AS (
        SELECT date_diff('day', DATE '1970-01-01', o_orderdate) // 7 AS wk,
               CASE WHEN date_diff('day', o_orderdate, l_shipdate)
                    > {_PC_LATE_DAYS} THEN 1 ELSE 0 END AS late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    wkly AS (
        SELECT wk, CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(late) AS BIGINT) AS n_late
        FROM lines GROUP BY 1),
    tot AS (
        SELECT CAST(SUM(n_late) * 10000 // SUM(n_lines) AS BIGINT) AS pbar_bp
        FROM wkly)
    SELECT CAST(wk AS BIGINT) AS wk, n_lines, n_late,
           CAST(n_late * 10000 // n_lines AS BIGINT) AS late_bp,
           tot.pbar_bp,
           CAST(CASE WHEN
                (10000 * n_late - n_lines * tot.pbar_bp)
                * (10000 * n_late - n_lines * tot.pbar_bp)
                > 9 * tot.pbar_bp * (10000 - tot.pbar_bp) * n_lines
                THEN 1 ELSE 0 END AS BIGINT) AS ooc
    FROM wkly, tot
    """


@_q("late_rate_pchart", _SQL_PCHART)
def q_late_rate_pchart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P-CHART (attribute control chart): the weekly PROPORTION of
    lineitems shipping > 100 days after order, flagged out-of-control
    when it leaves the 3-sigma binomial band around the grand rate —
    the PROPORTIONS member of the monitoring family
    (`daily_anomaly_flags` = amounts z-score, `cusum_change_detection`
    = sustained drift). The 3σ test is the all-integer cross-multiplied
    form (10⁴·x − n·p̄)² > 9·p̄·(10⁴−p̄)·n over bp — no float proportion
    or sqrt ever exists; p̄ floors to bp (the week-level test is
    insensitive to a sub-bp shift of the center line).

    Scale: one fact scan joined to orders on the order key (the
    existing `ship_sla_percentiles` shuffle shape), partial-agg to the
    calendar-bounded week domain, grand rate as a 1-row broadcast.
    int64: (10⁴·x)² needs x ≤ ~3e5 per week — beyond that pre-divide
    both counts by 10 (the test is scale-invariant).
    """
    lines = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .join(
            _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.expr(
                "CAST(datediff(o_orderdate, DATE '1970-01-01') div 7 AS LONG)"
            ).alias("wk"),
            (
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
                > _PC_LATE_DAYS
            )
            .cast("long")
            .alias("late"),
        )
    )
    wkly = lines.groupBy("wk").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("late").cast("long").alias("n_late"),
    )
    tot = wkly.agg(
        F.expr("sum(n_late) * 10000 div sum(n_lines)")
        .cast("long")
        .alias("pbar_bp")
    )
    return wkly.crossJoin(F.broadcast(tot)).select(
        "wk",
        "n_lines",
        "n_late",
        F.expr("n_late * 10000 div n_lines").cast("long").alias("late_bp"),
        "pbar_bp",
        F.expr(
            "CAST(CASE WHEN (10000 * n_late - n_lines * pbar_bp)"
            " * (10000 * n_late - n_lines * pbar_bp)"
            " > 9 * pbar_bp * (10000 - pbar_bp) * n_lines"
            " THEN 1 ELSE 0 END AS LONG)"
        ).alias("ooc"),
    )


# ---------------------------------------------------------------------------
# Compaction planner: pack daily partitions into target-sized files
# ---------------------------------------------------------------------------
_CB_TARGET_ROWS = 50000

_SQL_COMPACTION = f"""
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01', o_orderdate) AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY 1),
    cum AS (
        SELECT day, n,
               CAST(SUM(n) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                    PRECEDING AND 1 PRECEDING) AS BIGINT) AS prior
        FROM daily),
    binned AS (
        SELECT day, n,
               COALESCE(prior, 0) // {_CB_TARGET_ROWS} AS bin
        FROM cum)
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(MIN(day) AS BIGINT) AS min_day,
           CAST(MAX(day) AS BIGINT) AS max_day
    FROM binned GROUP BY 1
    """


@_q("compaction_bins", _SQL_COMPACTION)
def q_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILE-COMPACTION PLANNER (the small-files problem): pack
    CONTIGUOUS daily partitions into output files of ~50k rows by
    binning each day on its EXCLUSIVE prefix row count div target —
    the greedy coalesce every table-maintenance job runs (day-level
    partitions stay time-prunable because bins are contiguous day
    ranges; a hash re-bucket would destroy partition pruning). The
    exclusive prefix guarantees every bin except the last reaches the
    target before closing, and a day larger than the target gets its
    own bin-run — the two invariants a compactor needs. Output is the
    plan (bin → day-range + row count) that a writer executes with
    one `repartitionByRange` pass.

    Scale: the day rollup is the one fact-sized step (map-side
    combined); the prefix window runs on the calendar-bounded day
    domain (`temporal_split_embargo`'s argument). The same shape
    plans by BYTES when a file-metadata table replaces the rollup
    (`range_split_planner` is the row-range sibling).
    """
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("day")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    binned = daily.select(
        "day",
        "n",
        F.expr(f"coalesce(sum(n) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED"
               f" PRECEDING AND 1 PRECEDING), 0) div {_CB_TARGET_ROWS}")
        .cast("long")
        .alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("n").cast("long").alias("n_rows"),
        F.min("day").cast("long").alias("min_day"),
        F.max("day").cast("long").alias("max_day"),
    )


# ---------------------------------------------------------------------------
# k-core peeling: two rounds on the co-order supplier graph
# ---------------------------------------------------------------------------
_KC_K = 8

_SQL_KCORE = f"""
    WITH {sql_coorder_edge_ctes()},
    deg0 AS MATERIALIZED (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM (
            SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
        GROUP BY 1),
    keep0 AS MATERIALIZED (SELECT v FROM deg0 WHERE d >= {_KC_K}),
    e1 AS MATERIALIZED (
        SELECT a, b FROM e
        WHERE a IN (SELECT v FROM keep0) AND b IN (SELECT v FROM keep0)),
    deg1 AS MATERIALIZED (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM (
            SELECT a AS v FROM e1 UNION ALL SELECT b AS v FROM e1)
        GROUP BY 1),
    keep1 AS MATERIALIZED (SELECT v FROM deg1 WHERE d >= {_KC_K}),
    e2 AS MATERIALIZED (
        SELECT a, b FROM e1
        WHERE a IN (SELECT v FROM keep1) AND b IN (SELECT v FROM keep1)),
    r0 AS (SELECT CAST(0 AS BIGINT) AS round,
                  CAST((SELECT COUNT(*) FROM deg0) AS BIGINT) AS n_nodes,
                  CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges),
    r1 AS (SELECT CAST(1 AS BIGINT), CAST((SELECT COUNT(*) FROM keep0) AS BIGINT),
                  CAST((SELECT COUNT(*) FROM e1) AS BIGINT)),
    r2 AS (SELECT CAST(2 AS BIGINT), CAST((SELECT COUNT(*) FROM keep1) AS BIGINT),
                  CAST((SELECT COUNT(*) FROM e2) AS BIGINT))
    SELECT * FROM r0 UNION ALL SELECT * FROM r1 UNION ALL SELECT * FROM r2
    """


@_q("kcore_peel", _SQL_KCORE)
def q_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-CORE PEELING, two unrolled rounds on the co-order supplier
    graph: repeatedly drop vertices with degree < 8 and the edges they
    carry, reporting (round, n_nodes, n_edges) — the community-mining
    preprocessor that strips hair from the graph before
    `triangle_census` / `pagerank_suppliers` (the 8-core holds the
    cohesive wholesale backbone; peeling to a FIXPOINT is the
    CC/`kmeans_lloyd_step` driver-loop pattern with localCheckpoint
    per round, and the round-over-round node counts here are exactly
    its convergence monitor). Edge membership after a peel is two
    SEMI JOINS against the surviving vertex set — never an IN-list
    materialized on the driver.

    Scale: each round is one degree aggregate (map-side combined on
    vertex ids) and two semi joins keyed on the same ids; the edge
    set localCheckpoints once (five consumers). Degrees are
    |V|-bounded; nothing is quadratic. Deeper k or full decomposition
    changes the loop count, not the per-round plan.
    """
    e = co_order_edges(spark, sf_dir).localCheckpoint(eager=False)

    def degrees(edges: DataFrame) -> DataFrame:
        return (
            edges.select(F.col("a").alias("v"))
            .unionAll(edges.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).cast("long").alias("d"))
        )

    def peel(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
        keep = degrees(edges).where(F.col("d") >= _KC_K).select("v")
        kept = edges.join(
            keep, edges["a"] == keep["v"], "left_semi"
        ).join(keep, edges["b"] == keep["v"], "left_semi")
        return keep, kept.localCheckpoint(eager=False)

    d0 = degrees(e)
    keep0, e1 = peel(e)
    keep1, e2 = peel(e1)

    def stats(rnd: int, nodes: DataFrame, edges: DataFrame) -> DataFrame:
        n = nodes.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        m = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        return (
            n.crossJoin(F.broadcast(m))
            .select(
                F.lit(rnd).cast("long").alias("round"), "n_nodes", "n_edges"
            )
        )

    return (
        stats(0, d0, e)
        .unionAll(stats(1, keep0, e1))
        .unionAll(stats(2, keep1, e2))
    )
