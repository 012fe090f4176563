"""Round-4 batch 34: optimizer statistics and recency/topology
metrics — equi-depth histogram construction, exponentially decayed
popularity counts, and integer degree assortativity.

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
from bikes_data_warehouse_etl_spark.plans.pipeline_ops29 import (
    SLOPE128_EXPR,
    SLOPE128_SQL,
)
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Equi-depth histogram: the optimizer-statistics shape
# ---------------------------------------------------------------------------
_ED_BINS = 16

_SQL_EQUI_DEPTH = f"""
    WITH h AS (
        SELECT CAST(FLOOR(o_totalprice) AS BIGINT) AS dollar,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY 1),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM h),
    cum AS (
        SELECT dollar, n,
               CAST(COALESCE(SUM(n) OVER (ORDER BY dollar ROWS BETWEEN
                    UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS prior
        FROM h),
    binned AS (
        SELECT dollar, n,
               LEAST(prior * {_ED_BINS} // tot.total, {_ED_BINS - 1}) AS bin
        FROM cum, tot)
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(MIN(dollar) AS BIGINT) AS lo_dollar,
           CAST(MAX(dollar) AS BIGINT) AS hi_dollar,
           CAST(SUM(n) AS BIGINT) AS n_rows
    FROM binned GROUP BY 1
    """


@_q("equi_depth_bins", _SQL_EQUI_DEPTH)
def q_equi_depth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQUI-DEPTH HISTOGRAM construction (16 buckets over order value
    in whole dollars) — the statistic a cost-based optimizer stores
    for range-selectivity estimation (`join_size_estimate` consumes
    this kind of table; `value_histogram` is the equi-WIDTH sibling
    for humans, equi-depth is the one planners want because every
    bucket carries the same row mass). Built from the bounded VALUE
    histogram, not the row stream: bucket id = exclusive-prefix-count
    × B div N (`compaction_bins`' packing rule), so buckets are
    contiguous dollar ranges with ~N/B rows each and a value landing
    on a boundary goes to the earlier bucket deterministically.

    Scale: the only fact-sized step is the dollar rollup (map-side
    combined, domain bounded by the price range); the prefix window
    runs over the value domain — `mad_price_outliers`' argument — so
    histogram width, not data volume, prices the sort. Deeper B
    changes nothing structurally.
    """
    h = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.floor("o_totalprice").cast("long").alias("dollar"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = h.agg(F.sum("n").cast("long").alias("total"))
    w = Window.orderBy("dollar").rowsBetween(Window.unboundedPreceding, -1)
    binned = h.crossJoin(F.broadcast(tot)).select(
        "dollar",
        "n",
        F.least(
            F.expr(f"coalesce(sum(n) OVER (ORDER BY dollar ROWS BETWEEN"
                   f" UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
                   f" * {_ED_BINS} div total"),
            F.lit(_ED_BINS - 1),
        )
        .cast("long")
        .alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.min("dollar").cast("long").alias("lo_dollar"),
        F.max("dollar").cast("long").alias("hi_dollar"),
        F.sum("n").cast("long").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# Exponentially decayed counts: recency-weighted popularity
# ---------------------------------------------------------------------------
_DC_MAX_HL = 20  # cap: events older than 20 half-lives contribute 1 unit

_SQL_DECAYED = f"""
    WITH ev AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
        FROM events),
    mx AS (SELECT CAST(MAX(day) AS BIGINT) AS max_day FROM ev),
    wtd AS (
        SELECT ev.event_type,
               CAST(1 << ({_DC_MAX_HL} - LEAST((mx.max_day - ev.day) // 7,
                    {_DC_MAX_HL})) AS BIGINT) AS w
        FROM ev, mx)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(w) AS BIGINT) AS decayed_units,
           CAST(SUM(w) // (1 << {_DC_MAX_HL}) AS BIGINT) AS effective_recent
    FROM wtd GROUP BY 1
    """


@_q("decayed_event_counts", _SQL_DECAYED)
def q_decayed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPONENTIALLY DECAYED popularity: per event type, counts where
    an event w weeks old weighs 2^-w of a fresh one (one-week
    half-life), computed in EXACT integers by counting in units of
    2^20 for fresh events and right-shifting per elapsed half-life
    (capped at 20 — beyond that an event contributes its floor of one
    unit). ``effective_recent`` divides back to "fresh-event
    equivalents", the number a trending/ranking feature actually uses
    (`heavy_hitter_tokens` finds what's big; this finds what's big
    NOW — a type with huge n_events but small effective_recent is
    legacy traffic). No float pow, no drift: power-of-two weights are
    closed under int64 up to 2^43 fresh events per group.

    Scale: the anchor (max day) is a 1-row broadcast; weights are
    row-local bit shifts; one map-side-combined rollup on the event
    type. A sliding daily job recomputes nothing: decayed(t+7) =
    decayed(t) >> 1 + fresh week — the incremental form
    `incremental_agg_merge` demonstrates.
    """
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day"),
    )
    mx = ev.agg(F.max("day").cast("long").alias("max_day"))
    wtd = ev.crossJoin(F.broadcast(mx)).select(
        "event_type",
        F.expr(
            f"CAST(shiftleft(1, {_DC_MAX_HL} - LEAST((max_day - day) div 7,"
            f" {_DC_MAX_HL})) AS LONG)"
        ).alias("w"),
    )
    return wtd.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("w").cast("long").alias("decayed_units"),
        F.expr(f"CAST(sum(w) div shiftleft(1, {_DC_MAX_HL}) AS LONG)").alias(
            "effective_recent"
        ),
    )


# ---------------------------------------------------------------------------
# Degree assortativity: integer Pearson r via symmetrized OLS slope
# ---------------------------------------------------------------------------
_SQL_ASSORTATIVITY = f"""
    WITH {sql_coorder_edge_ctes()},
    deg AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM (
            SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
        GROUP BY 1),
    pts AS (
        SELECT da.d AS x, db.d AS y
        FROM e JOIN deg da ON e.a = da.v JOIN deg db ON e.b = db.v
        UNION ALL
        SELECT db.d AS x, da.d AS y
        FROM e JOIN deg da ON e.a = da.v JOIN deg db ON e.b = db.v),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM pts)
    SELECT n AS n_points,
           CAST({SLOPE128_SQL} AS BIGINT) AS assortativity_milli
    FROM s
    """


@_q("degree_assortativity", _SQL_ASSORTATIVITY)
def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEGREE ASSORTATIVITY of the co-order graph in milli — do
    well-connected suppliers trade with each other (positive, social-
    network-like) or with the periphery (negative, hub-and-spoke)?
    Computed as the OLS slope over the SYMMETRIZED edge-endpoint
    degree pairs: symmetrization makes Var(x) = Var(y), so slope =
    cov/var IS Pearson r exactly — the trick that turns an
    r-needs-sqrt formula into `ols_discount_quantity`'s pure-integer
    sufficient-sums machinery. The structural summary that says
    whether `kcore_peel`'s core is a clique of hubs or a bridge layer.

    Scale: degrees join the edge set on vertex keys (|V|-bounded build
    side), the five sums are one map-side-combined aggregate over 2m
    rows. The sums stay int64 (Σxy ≤ d²·2m); the slope's n·Σxy /
    n·Σxx products left int64 at sf10's edge volume (sweep-caught), so
    they use the shared 128-bit slope path (`SLOPE128_*`,
    pipeline_ops29) — HUGEINT / decimal(38,0), quotient back to int64.
    """
    e = co_order_edges(spark, sf_dir).localCheckpoint(eager=False)
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("d_a"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("d_b"))
    joined = e.join(da, "a").join(db, "b")
    pts = joined.select(
        F.col("d_a").alias("x"), F.col("d_b").alias("y")
    ).unionAll(joined.select(F.col("d_b").alias("x"), F.col("d_a").alias("y")))
    s = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    return s.select(
        F.col("n").alias("n_points"),
        F.expr("CAST(" + SLOPE128_EXPR + " AS LONG)").alias(
            "assortativity_milli"
        ),
    )
