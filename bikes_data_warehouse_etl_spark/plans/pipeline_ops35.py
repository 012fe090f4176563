"""Round-4 batch 35: distribution-free uncertainty, link prediction,
and robust trend estimation — a conformal band for the seasonal-naive
forecast, common-neighbor link scores on the co-order graph, and the
Theil–Sen median-of-slopes trend.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline. Signed division uses the sign-abs form (pipeline_ops27).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.plans.pipeline_ops16 import (
    capped_adjacency,
    co_order_edges,
    sql_capped_adj_ctes,
    sql_coorder_edge_ctes,
    symmetric_adjacency,
)
from bikes_data_warehouse_etl_spark.plans.pipeline_ops29 import (
    _sdiv_expr,
    _sdiv_sql,
)
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Conformal prediction band for the seasonal-naive forecast
# ---------------------------------------------------------------------------
_SQL_CONFORMAL = """
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS BIGINT) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) // 1000
                   AS BIGINT) AS kc
        FROM orders GROUP BY 1),
    scored AS (
        SELECT a.day, abs(a.kc - f.kc) AS resid
        FROM daily a JOIN daily f ON f.day = a.day - 7),
    split AS (
        SELECT day, resid,
               ROW_NUMBER() OVER (ORDER BY day) AS rk,
               (SELECT COUNT(*) FROM scored) AS nd
        FROM scored),
    calib AS (SELECT resid FROM split WHERE rk * 10 <= nd * 7),
    q AS (
        SELECT resid AS q95 FROM (
            SELECT resid, ROW_NUMBER() OVER (ORDER BY resid, resid) AS r,
                   (SELECT COUNT(*) FROM calib) AS nc
            FROM calib)
        WHERE 20 * r >= 19 * nc ORDER BY resid LIMIT 1),
    test AS (SELECT day, resid FROM split WHERE rk * 10 > nd * 7)
    SELECT CAST((SELECT COUNT(*) FROM calib) AS BIGINT) AS n_calib,
           CAST((SELECT COUNT(*) FROM test) AS BIGINT) AS n_test,
           CAST(q.q95 AS BIGINT) AS q95_resid_kc,
           CAST((SELECT SUM(CASE WHEN resid <= q.q95 THEN 1 ELSE 0 END)
                 FROM test) * 10000
                // GREATEST((SELECT COUNT(*) FROM test), 1) AS BIGINT)
               AS coverage_bp
    FROM q
    """


@_q("conformal_forecast_band", _SQL_CONFORMAL)
def q_conformal_forecast_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLIT-CONFORMAL prediction band for the seasonal-naive daily
    forecast: calibrate the 95th-percentile absolute residual on the
    first 70% of scored days (the `temporal_split_embargo` integer
    rank split), then measure empirical COVERAGE of actual ± q95 on
    the held-out 30% — distribution-free uncertainty
    (`poisson_bootstrap_ci` quantifies estimator noise; conformal
    wraps a POINT FORECAST with a guarantee: if residuals are
    exchangeable, coverage concentrates near 95%). q95 is the rank
    statistic 20·r ≥ 19·n — pure integers, deterministic ties — and
    residuals are kilocent integers throughout.

    Scale: everything after the one fact-sized daily rollup runs on
    the calendar-bounded day domain (rank windows over thousands of
    rows at any volume); the quantile is a bounded rank test, not a
    sort of raw data. Per-series bands (by segment/region) partition
    the same windows by the series key.
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
                "CAST(sum(CAST(round(o_totalprice * 100, 0) AS LONG)) div 1000"
                " AS LONG)"
            ).alias("kc")
        )
    )
    f = daily.select((F.col("day") + 7).alias("day"), F.col("kc").alias("f_kc"))
    scored = daily.join(f, "day").select(
        "day", F.abs(F.col("kc") - F.col("f_kc")).cast("long").alias("resid")
    )
    nd = scored.agg(F.count(F.lit(1)).cast("long").alias("nd"))
    split = scored.crossJoin(F.broadcast(nd)).select(
        "day",
        "resid",
        "nd",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("rk"),
    )
    calib = split.where(F.col("rk") * 10 <= F.col("nd") * 7).select("resid")
    nc = calib.agg(F.count(F.lit(1)).cast("long").alias("nc"))
    q = (
        calib.crossJoin(F.broadcast(nc))
        .select(
            "resid",
            "nc",
            F.row_number().over(Window.orderBy("resid")).cast("long").alias("r"),
        )
        .where(20 * F.col("r") >= 19 * F.col("nc"))
        .orderBy("resid")
        .limit(1)
        .select(F.col("resid").alias("q95_resid_kc"))
    )
    test = split.where(F.col("rk") * 10 > F.col("nd") * 7).select("resid")
    cov = (
        test.crossJoin(F.broadcast(q))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum((F.col("resid") <= F.col("q95_resid_kc")).cast("long"))
            .cast("long")
            .alias("n_cov"),
            F.first("q95_resid_kc").alias("q95_resid_kc"),
        )
    )
    return (
        nc.crossJoin(F.broadcast(cov))
        .select(
            F.col("nc").alias("n_calib"),
            "n_test",
            F.col("q95_resid_kc").cast("long").alias("q95_resid_kc"),
            F.expr("n_cov * 10000 div GREATEST(n_test, 1)")
            .cast("long")
            .alias("coverage_bp"),
        )
    )


# ---------------------------------------------------------------------------
# Link prediction: common-neighbor scores for non-adjacent pairs
# ---------------------------------------------------------------------------
_LP_TOP = 25

_SQL_LINK_PRED = f"""
    WITH {sql_coorder_edge_ctes()},
    {sql_capped_adj_ctes()},
    wedge AS (
        SELECT x.u AS p, y.u AS q2, CAST(COUNT(*) AS BIGINT) AS cn
        FROM adj x JOIN adj y ON x.v = y.v AND x.u < y.u
        GROUP BY 1, 2),
    nonedge AS (
        SELECT wedge.p, wedge.q2, wedge.cn
        FROM wedge LEFT JOIN e ON wedge.p = e.a AND wedge.q2 = e.b
        WHERE e.a IS NULL)
    SELECT p AS id_a, q2 AS id_b, cn AS common_neighbors
    FROM nonedge
    ORDER BY cn DESC, p, q2 LIMIT {_LP_TOP}
    """


@_q("link_prediction_cn", _SQL_LINK_PRED)
def q_link_prediction_cn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINK PREDICTION by common neighbors: the top-25 NON-adjacent
    supplier pairs ranked by shared co-order partners — "these two
    never co-supplied an order, but trade with the same crowd", the
    classic missing-link/recommendation score (Adamic-Adar and
    resource-allocation just reweight the same wedge census by
    1/log(deg) or 1/deg of the center). Wedge pairs are
    ID-canonicalized at generation (u < w), so each candidate counts
    its centers once; the anti-join against the ID-oriented edge set
    removes existing links exactly.

    Scale: the raw wedge self-join on the center vertex costs
    Σ_v deg(v)² — super-linear on this dense graph (48.5M wedges at
    sf0.1, hub degree 298). Both engines therefore census over the
    DEGREE-CAPPED adjacency (`capped_adjacency`: 64 hash-rank-first
    neighbors per center, deterministic so the oracle keeps the same
    subset), bounding the join at |V|·64²/2 rows — linear in nodes.
    Hub centers contribute a fixed sample of their wedges, the
    standard mitigation for link prediction (hub co-occurrence is the
    weakest signal; `adamic_adar_topk` additionally down-weights it).
    No broadcast hints: adjacency and edge set grow with the fact
    table, so AQE picks the join side from runtime sizes. The
    candidate census shuffles on the (p, q) pair key; top-25 is a
    heap.
    """
    # eager checkpoint: e feeds four consumers (two adj legs, the
    # anti-join) — lazy materialization re-entered the basket build
    # once per branch on the first action (measured 11.9 s cold)
    e = co_order_edges(spark, sf_dir).localCheckpoint(eager=True)
    # degree cap: keep 64 hash-rank-first neighbors per center before
    # the wedge self-join, bounding it at |V| * 64^2 / 2 rows (48.5M
    # uncapped wedges -> 2.0M at sf0.1). NO broadcast hints anywhere on
    # this path -- adjacency and edge set are data-scale (they grow with
    # the fact table); AQE picks the join strategy from runtime sizes,
    # so small sfs still get runtime broadcasts while a 100 TB run
    # shuffles instead of OOMing an executor on an edge-scale build side.
    adj = capped_adjacency(symmetric_adjacency(e))
    x = adj.select(F.col("v").alias("c"), F.col("u").alias("p"))
    y = adj.select(F.col("v").alias("c"), F.col("u").alias("q2"))
    wedge = (
        x.join(y, "c")
        .where(F.col("p") < F.col("q2"))
        .groupBy("p", "q2")
        .agg(F.count(F.lit(1)).cast("long").alias("cn"))
    )
    nonedge = wedge.join(
        e,
        (F.col("p") == F.col("a")) & (F.col("q2") == F.col("b")),
        "left_anti",
    )
    return (
        nonedge.select(
            F.col("p").alias("id_a"),
            F.col("q2").alias("id_b"),
            F.col("cn").alias("common_neighbors"),
        )
        .orderBy(F.col("common_neighbors").desc(), "id_a", "id_b")
        .limit(_LP_TOP)
    )


# ---------------------------------------------------------------------------
# Theil–Sen: median-of-pairwise-slopes robust trend
# ---------------------------------------------------------------------------
_SQL_THEIL_SEN = f"""
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS BIGINT) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) // 1000
                   AS BIGINT) AS kc
        FROM orders GROUP BY 1),
    slopes AS (
        SELECT {_sdiv_sql("(b.kc - a.kc) * 1000", "b.day - a.day")} AS s
        FROM daily a JOIN daily b ON b.day > a.day),
    ranked AS (
        SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS r,
               (SELECT COUNT(*) FROM slopes) AS n
        FROM slopes)
    SELECT CAST((SELECT COUNT(*) FROM daily) AS BIGINT) AS n_days,
           CAST(n AS BIGINT) AS n_pairs,
           CAST(s AS BIGINT) AS theil_sen_milli_kc_per_day
    FROM ranked WHERE 2 * r = n + (n % 2) AND r <= (n + 1) // 2
    ORDER BY s LIMIT 1
    """


@_q("theil_sen_trend", _SQL_THEIL_SEN)
def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL–SEN robust trend: the LOWER MEDIAN of all pairwise slopes
    (kc/day in milli) of the daily revenue series — the estimator
    with a 29% breakdown point where OLS (`ols_discount_quantity`'s
    machinery) breaks on one wild day; the robust-trend member of the
    monitoring family (`mad_price_outliers` is its dispersion
    sibling). Pairwise slopes are integers via amplify-then-sign-abs-
    divide; the median is the repo's deterministic lower-median rank
    test.

    Scale: the C(n,2) pair generation runs on the CALENDAR-BOUNDED day
    domain (~2.4k days → ~3M integer slopes; a century is ~670M —
    still day-domain, never fact-domain) and is ROW-LOCAL: the sorted
    (day, kc) series is one small array (2.4k structs ≈ 40 KB; 600 KB
    for a century) broadcast as a 1-row frame; each of the n-1 anchor
    indices — spread over defaultParallelism partitions — expands its
    j>i slopes with a codegen'd ``transform``+``explode`` over an
    array SLICE. This replaced the broadcast nested-loop join (round-6
    regression, 6.7 s at sf0.1): the NLJ paid per-pair iterator
    overhead on all n² candidate pairs; the array form touches exactly
    the C(n,2) real pairs inside whole-stage codegen (measured ~4x on
    the pair stage, same-JVM ABBA).

    The lower median is an exact integer HISTOGRAM BISECTION over the
    localCheckpoint'd slope frame: min/max pass, then ≤3 rounds of a
    1024-bucket range histogram (map-side-combined, 1024-row collect)
    narrowing to the bucket containing the rank, then one ≤4096-row
    distinct-value collect to walk to the exact element. Every
    distributed pass carries FIXED-size aggregation state — unlike
    ``F.percentile``, whose per-partition value→count maps grow with
    the distinct-slope count (~3M entries here, 670M for a century;
    measured ~7 s of the old 8 s sf0.1 wall), and unlike a global
    ``row_number`` window, which moves every slope into ONE task. All
    collects are bounded by construction (1-row min/max, 1024-row
    histograms, 4096-row final); all arithmetic is integer, so both
    engines agree exactly. The rank needs n_pairs up front — pure
    arithmetic on n_days via the lazily-checkpointed day rollup
    (exactly one fact pass, the assoc_rules_topk precedent). For
    per-key trends, run the bisection per key over a (key, bucket)
    histogram.
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
                "CAST(sum(CAST(round(o_totalprice * 100, 0) AS LONG)) div 1000"
                " AS LONG)"
            ).alias("kc")
        )
        .localCheckpoint(eager=False)
    )
    n_days = daily.count()
    n_pairs = n_days * (n_days - 1) // 2
    series = daily.agg(
        F.sort_array(F.collect_list(F.struct("day", "kc"))).alias("dk")
    )
    anchors = (
        spark.range(0, max(n_days - 1, 0))
        .select(F.col("id").cast("int").alias("i"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    slope = _sdiv_expr("(x.kc - dk[i].kc) * 1000", "x.day - dk[i].day")
    slopes = anchors.join(F.broadcast(series)).select(
        F.explode(
            F.expr(
                "transform(slice(dk, i + 2, size(dk) - i - 1), "
                f"x -> CAST({slope} AS LONG))"
            )
        ).alias("s")
    )
    schema = (
        "n_days long, n_pairs long, theil_sen_milli_kc_per_day long"
    )
    if n_pairs == 0:
        # degenerate series (<2 days): empty result, stable schema
        return spark.createDataFrame([], schema)
    rank = (n_pairs + 1) // 2  # lower median, 1-based
    med = _exact_rank_element(slopes.localCheckpoint(eager=False), rank)
    return spark.createDataFrame([(n_days, n_pairs, med)], schema)


def _exact_rank_element(sl: DataFrame, rank: int) -> int:
    """Exact k-th smallest of integer column ``s`` by histogram
    bisection: fixed-width distributed passes, bounded collects (1-row
    min/max, ≤1024-row histograms, ≤4096-row final walk). ``sl``
    should be checkpointed — each round is one cheap scan of it."""
    row = sl.agg(F.min("s").alias("lo"), F.max("s").alias("hi")).first()
    lo, hi = int(row["lo"]), int(row["hi"])
    need = rank
    while hi - lo > 4096:
        width = (hi - lo) // 1024 + 1
        hist = (
            sl.where((F.col("s") >= lo) & (F.col("s") <= hi))
            .groupBy(F.expr(f"(s - {lo}) div {width}").alias("b"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        counts = {int(r["b"]): int(r["n"]) for r in hist}
        acc = 0
        for b in range(1026):
            c = counts.get(b, 0)
            if acc + c >= need:
                need -= acc
                hi = min(hi, lo + (b + 1) * width - 1)
                lo = lo + b * width
                break
            acc += c
    final = sorted(
        (int(r["s"]), int(r["n"]))
        for r in (
            sl.where((F.col("s") >= lo) & (F.col("s") <= hi))
            .groupBy("s")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    )
    acc = 0
    for v, c in final:
        acc += c
        if acc >= need:
            return v
    raise AssertionError("rank walked past the histogram")  # unreachable
