"""Round-4 batch 19: graph degree distribution and funnel
time-to-convert percentiles.

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
# Degree distribution of the supplier co-order graph (32-wide bins)
# ---------------------------------------------------------------------------
_DEG_BIN = 32

_SQL_DEGREE_DISTRIBUTION = f"""
    WITH {sql_coorder_edge_ctes()},
    deg AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM (
            SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
        GROUP BY v)
    SELECT CAST(d // {_DEG_BIN} AS BIGINT) AS deg_bin,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MIN(d) AS BIGINT) AS min_deg,
           CAST(MAX(d) AS BIGINT) AS max_deg
    FROM deg GROUP BY 1
    """


@_q("degree_distribution", _SQL_DEGREE_DISTRIBUTION)
def q_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the supplier co-order graph (same >= 4
    co-order edge definition as `triangle_census`): node counts per
    32-wide degree bin with per-bin min/max — the shape diagnostic
    (power-law vs regular) that decides whether `pagerank_suppliers`
    needs skew handling and what `triangle_census`'s two-hop fan-out
    will cost. Histogram bins keep the output bounded by MAX-DEGREE/32
    rows regardless of graph size.

    Scale: edges come from the SHARED builder
    (`pipeline_ops16.co_order_edges` — basket pattern, one collect_set
    shuffle, row-local pair generation, never a fact self-join; its
    oracle twin `sql_coorder_edge_ctes` spells the naive self-join and
    the hash match proves them equal). Sharing the builder means this
    query and `triangle_census` cannot silently diverge on the edge
    definition. Degrees are one (node) aggregate over the symmetrized
    edge stream; the binned rollup is map-side combined to nothing.
    """
    e = co_order_edges(spark, sf_dir)
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    return deg.groupBy(
        F.expr(f"d div {_DEG_BIN}").cast("long").alias("deg_bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.min("d").cast("long").alias("min_deg"),
        F.max("d").cast("long").alias("max_deg"),
    )


# ---------------------------------------------------------------------------
# Funnel time-to-convert: view -> purchase latency percentiles (minutes)
# ---------------------------------------------------------------------------
_SQL_FUNNEL_TTC = """
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
    conv AS (
        SELECT user_id, MIN((next_p - es) // 60000000) AS ttc_min
        FROM nx
        WHERE event_type = 'view' AND next_p IS NOT NULL
        GROUP BY user_id),
    h AS (
        SELECT ttc_min, CAST(COUNT(*) AS BIGINT) AS n FROM conv GROUP BY 1),
    c AS (
        SELECT ttc_min, SUM(n) OVER (ORDER BY ttc_min) AS cum,
               (SELECT SUM(n) FROM h) AS total
        FROM h)
    SELECT CAST((SELECT SUM(n) FROM h) AS BIGINT) AS n_converted,
           CAST((SELECT MIN(ttc_min) FROM c WHERE 2 * cum >= total)
               AS BIGINT) AS p50_min,
           CAST((SELECT MIN(ttc_min) FROM c WHERE 10 * cum >= 9 * total)
               AS BIGINT) AS p90_min
    """


@_q("funnel_ttc_percentiles", _SQL_FUNNEL_TTC)
def q_funnel_ttc_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel time-to-convert: for each user, the SHORTEST view -> next
    purchase latency, summarized as exact p50/p90 in minutes —
    `event_funnel` counts who converts, this measures how fast. The
    next-purchase lookup is the same forward-frame MIN window
    `linear_attribution` uses; percentiles are read off a MINUTE
    histogram with cumulative counts (10*cum >= 9*total for p90), so
    they are integer-exact — no interpolating percentile_cont on
    either engine.

    Scale: one user_id shuffle for the window + per-user MIN; the
    histogram domain is bounded by the observation span in minutes
    (days x 1440), so the cumulative step is small regardless of user
    count. Minute granularity is the deliberate accuracy/size trade —
    at second granularity the domain grows 60x but the plan shape is
    unchanged.
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
        F.min(F.when(F.col("event_type") == "purchase", F.col("es"))).over(fwd),
    )
    conv = (
        nx.filter((F.col("event_type") == "view") & F.col("next_p").isNotNull())
        .groupBy("user_id")
        .agg(
            F.min(F.expr("(next_p - es) div 60000000")).alias("ttc_min")
        )
    )
    h = conv.groupBy("ttc_min").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = h.agg(F.sum("n").alias("total"))
    cw = Window.orderBy("ttc_min").rangeBetween(Window.unboundedPreceding, 0)
    c = h.join(F.broadcast(tot)).withColumn("cum", F.sum("n").over(cw))
    p50 = c.filter(2 * F.col("cum") >= F.col("total")).agg(
        F.min("ttc_min").alias("p50")
    )
    p90 = c.filter(10 * F.col("cum") >= 9 * F.col("total")).agg(
        F.min("ttc_min").alias("p90")
    )
    n = h.agg(F.sum("n").cast("long").alias("n_converted"))
    return (
        n.join(F.broadcast(p50))
        .join(F.broadcast(p90))
        .select(
            "n_converted",
            F.col("p50").cast("long").alias("p50_min"),
            F.col("p90").cast("long").alias("p90_min"),
        )
    )
