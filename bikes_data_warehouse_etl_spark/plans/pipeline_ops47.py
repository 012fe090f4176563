"""Round-4 batch 47: iterative-proportional-fitting survey weights,
energy distance between calendar eras, and a Little's-law conservation
check computed by two independent plans.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# IPF raking: two-margin survey weights on the nation x segment grid
# ---------------------------------------------------------------------------
_SQL_IPF = """
    WITH cell AS (
        SELECT c_nationkey AS nk, c_mktsegment AS seg,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM customer GROUP BY 1, 2),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS t,
               CAST(COUNT(DISTINCT nk) AS BIGINT) AS nr,
               CAST(COUNT(DISTINCT seg) AS BIGINT) AS nc
        FROM cell),
    w0 AS (
        SELECT nk, seg, n, CAST(10000 AS BIGINT) AS w FROM cell),
    rs1 AS (
        SELECT nk, CAST(SUM(n * w) AS BIGINT) AS rsum FROM w0 GROUP BY 1),
    w1 AS (
        SELECT w0.nk, w0.seg, w0.n,
               CAST(w0.w * ((SELECT t FROM tot) * 10000
                            // (SELECT nr FROM tot))
                    // GREATEST(rs1.rsum, 1) AS BIGINT) AS w
        FROM w0 JOIN rs1 ON w0.nk = rs1.nk),
    cs1 AS (
        SELECT seg, CAST(SUM(n * w) AS BIGINT) AS csum FROM w1 GROUP BY 1),
    w2 AS (
        SELECT w1.nk, w1.seg, w1.n,
               CAST(w1.w * ((SELECT t FROM tot) * 10000
                            // (SELECT nc FROM tot))
                    // GREATEST(cs1.csum, 1) AS BIGINT) AS w
        FROM w1 JOIN cs1 ON w1.seg = cs1.seg)
    SELECT nk AS c_nationkey, seg AS c_mktsegment, n AS n_cust,
           w AS weight_bp
    FROM w2
    """


@_q("ipf_raking_weights", _SQL_IPF)
def q_ipf_raking_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPF RAKING (iterative proportional fitting, one row sweep + one
    column sweep): per-cell survey weights that pull the nation ×
    segment customer grid toward UNIFORM margins on both axes — the
    weighting step that balances a training mix or survey panel to
    population margins when only marginal targets are known (the
    two-margin upgrade of `mixture_weights`, and what `source_quota_
    cap` does by truncation, raking does by reweighting). Weights in
    basis points; each sweep multiplies by target/achieved with
    integer truncation, identically on both engines, so the
    two-sweep result is engine-exact (full IPF iterates the same two
    sweeps to convergence).

    Scale: the cell census is map-side combined to a ≤125-cell grid;
    each sweep is one grid-keyed aggregate + a broadcast-joined
    rescale — per-iteration cost is O(grid), never O(rows), at any
    fact cardinality. The 1-row totals frame is a broadcast, not a
    collect.
    """
    cell = (
        _t(spark, sf_dir, "customer")
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.col("c_mktsegment").alias("seg"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = cell.agg(
        F.sum("n").cast("long").alias("t"),
        F.countDistinct("nk").cast("long").alias("nr"),
        F.countDistinct("seg").cast("long").alias("nc"),
    )
    w0 = cell.select("nk", "seg", "n", F.lit(10000).cast("long").alias("w"))
    rs1 = w0.groupBy("nk").agg(
        F.sum(F.col("n") * F.col("w")).cast("long").alias("rsum")
    )
    w1 = (
        w0.join(rs1, "nk")
        .crossJoin(F.broadcast(tot))
        .select(
            "nk",
            "seg",
            "n",
            F.expr(
                "CAST(w * (t * 10000 div nr) div GREATEST(rsum, 1)"
                " AS BIGINT)"
            ).alias("w"),
        )
    )
    cs1 = w1.groupBy("seg").agg(
        F.sum(F.col("n") * F.col("w")).cast("long").alias("csum")
    )
    w2 = (
        w1.join(cs1, "seg")
        .crossJoin(F.broadcast(tot))
        .select(
            "nk",
            "seg",
            "n",
            F.expr(
                "CAST(w * (t * 10000 div nc) div GREATEST(csum, 1)"
                " AS BIGINT)"
            ).alias("w"),
        )
    )
    return w2.select(
        F.col("nk").alias("c_nationkey"),
        F.col("seg").alias("c_mktsegment"),
        F.col("n").alias("n_cust"),
        F.col("w").alias("weight_bp"),
    )


# ---------------------------------------------------------------------------
# Energy distance between the two calendar halves of daily revenue
# ---------------------------------------------------------------------------
_SQL_ENERGY = """
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS BIGINT) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) // 1000
                   AS BIGINT) AS kc
        FROM orders GROUP BY 1),
    split AS (
        SELECT kc,
               CASE WHEN rk * 2 <= nd THEN 0 ELSE 1 END AS era
        FROM (SELECT kc, ROW_NUMBER() OVER (ORDER BY day) AS rk,
                     COUNT(*) OVER () AS nd
              FROM daily)),
    x AS (SELECT kc FROM split WHERE era = 0),
    y AS (SELECT kc FROM split WHERE era = 1),
    cx AS (
        SELECT CAST(SUM(abs(a.kc - b.kc)) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM x a, y b),
    sx AS (
        SELECT CAST(SUM(abs(a.kc - b.kc)) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM x a, x b),
    sy AS (
        SELECT CAST(SUM(abs(a.kc - b.kc)) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM y a, y b)
    SELECT CAST(2 * (cx.s * 1000 // cx.n)
                - (sx.s * 1000 // sx.n)
                - (sy.s * 1000 // sy.n) AS BIGINT) AS energy_milli_kc,
           CAST(cx.s * 1000 // cx.n AS BIGINT) AS cross_mean_milli,
           CAST(sx.s * 1000 // sx.n AS BIGINT) AS within_x_milli,
           CAST(sy.s * 1000 // sy.n AS BIGINT) AS within_y_milli
    FROM cx, sx, sy
    """


@_q("energy_distance_eras", _SQL_ENERGY)
def q_energy_distance_eras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENERGY DISTANCE between the two calendar halves of the daily
    revenue distribution: 2·E|X−Y| − E|X−X'| − E|Y−Y'| in
    milli-kilocents — the two-sample statistic that is zero iff the
    distributions are EQUAL and, unlike `ks_value_drift` (max CDF
    gap) or `mann_whitney_eras` (rank shift only), responds to ANY
    difference — spread, tails, shape — making it the strictest
    member of the repo's drift family. All-integer: pairwise |Δ| of
    kilocent day totals, exact sums, one truncating division per
    term.

    Scale: pairwise joins run on the DAILY census (calendar-bounded:
    ~1.2k × 1.2k per block at sf0.1), never fact rows; each block is
    a map-side-summed cross join. For 10⁶-point domains the E|X−Y|
    terms reduce to O(n log n) via sorted-merge prefix sums (E|X−Y| =
    Σ rank-weighted gaps) — the documented upgrade, same output.
    """
    daily = (
        _t(spark, sf_dir, "orders")
        .select(
            F.datediff(
                F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("day"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c"),
        )
        .groupBy("day")
        .agg(F.expr("CAST(SUM(c) div 1000 AS BIGINT)").alias("kc"))
    )
    ranked = daily.select(
        "kc",
        F.row_number().over(Window.orderBy("day")).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nd"),
    )
    split = ranked.select(
        "kc",
        F.when(F.col("rk") * 2 <= F.col("nd"), 0).otherwise(1).alias("era"),
    )
    x = split.where(F.col("era") == 0).select(F.col("kc").alias("xa"))
    y = split.where(F.col("era") == 1).select(F.col("kc").alias("ya"))

    def _pairmean(l: DataFrame, r: DataFrame, lc: str, rc: str, out: str):
        return l.crossJoin(r).agg(
            F.expr(
                f"CAST(SUM(abs({lc} - {rc})) * 1000 div COUNT(*) AS BIGINT)"
            ).alias(out)
        )

    cx = _pairmean(x, y.select(F.col("ya").alias("yb")), "xa", "yb", "cm")
    sx = _pairmean(x, x.select(F.col("xa").alias("xb")), "xa", "xb", "wx")
    sy = _pairmean(y, y.select(F.col("ya").alias("yb")), "ya", "yb", "wy")
    return (
        cx.crossJoin(F.broadcast(sx))
        .crossJoin(F.broadcast(sy))
        .selectExpr(
            "CAST(2 * cm - wx - wy AS BIGINT) AS energy_milli_kc",
            "CAST(cm AS BIGINT) AS cross_mean_milli",
            "CAST(wx AS BIGINT) AS within_x_milli",
            "CAST(wy AS BIGINT) AS within_y_milli",
        )
    )


# ---------------------------------------------------------------------------
# Little's law conservation check: two independent plans, one identity
# ---------------------------------------------------------------------------
_SQL_LITTLE = """
    WITH dur AS (
        SELECT o.o_orderkey,
               CAST(date_diff('day', DATE '1970-01-01', o.o_orderdate)
                   AS BIGINT) AS s,
               CAST(MAX(date_diff('day', DATE '1970-01-01', l.l_shipdate))
                   AS BIGINT) AS e
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2),
    sums AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(e - s + 1) AS BIGINT) AS order_days
        FROM dur),
    deltas AS (
        SELECT s AS day, CAST(1 AS BIGINT) AS d FROM dur
        UNION ALL
        SELECT e + 1 AS day, CAST(-1 AS BIGINT) AS d FROM dur),
    perday AS (
        SELECT day, CAST(SUM(d) AS BIGINT) AS d FROM deltas GROUP BY 1),
    b AS (SELECT MIN(s) AS lo, MAX(e) AS hi FROM dur),
    spine AS (
        SELECT CAST(UNNEST(generate_series(
                   (SELECT lo FROM b), (SELECT hi FROM b))) AS BIGINT)
            AS day),
    swept AS (
        SELECT s.day,
               CAST(SUM(COALESCE(pd.d, 0)) OVER (ORDER BY s.day) AS BIGINT)
                   AS open_cnt
        FROM spine s LEFT JOIN perday pd ON pd.day = s.day),
    direct AS (
        SELECT CAST(SUM(open_cnt) AS BIGINT) AS sum_open,
               CAST(COUNT(*) AS BIGINT) AS horizon
        FROM swept)
    SELECT s.n_orders,
           CAST(s.n_orders * 1000 // d.horizon AS BIGINT) AS lambda_milli,
           CAST(s.order_days * 1000 // s.n_orders AS BIGINT) AS w_milli,
           CAST(d.sum_open * 1000 // d.horizon AS BIGINT) AS l_direct_milli,
           CAST(s.order_days * 10000 // d.sum_open AS BIGINT)
               AS identity_check_bp
    FROM sums s, direct d
    """


@_q("littles_law_check", _SQL_LITTLE)
def q_littles_law_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LITTLE'S LAW as a conservation check: mean open-order count L
    computed TWO independent ways — directly, by sweeping +1/−1 order
    open/close deltas over the calendar and averaging the running
    count (`active_orders_daily`'s machinery), and via L = λ·W from
    per-order lifetime sums — with identity_check_bp pinning the
    exact integer identity Σ durations = Σ_t open(t) at 10000 bp.
    The queueing sanity gate for any backlog dashboard: if the two
    disagree, the pipeline double-counts or drops intervals. λ in
    orders/day milli, W in days milli.

    Scale: durations are one orderkey-keyed aggregate over the fact
    join; the sweep is delta rows (2/order) grouped onto the bounded
    calendar domain, then one domain-sized window. Both sides are
    mergeable sums, and the identity survives ANY horizon because
    closed intervals conserve exactly — the test is scale-free.
    """
    dur = (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.datediff(
                F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("s"),
        )
        .join(
            _t(spark, sf_dir, "lineitem").select(
                "l_orderkey",
                F.datediff(
                    F.col("l_shipdate"), F.lit("1970-01-01").cast("date")
                )
                .cast("long")
                .alias("r"),
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderkey", "s")
        .agg(F.max("r").cast("long").alias("e"))
    )
    sums = dur.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("e") - F.col("s") + 1).cast("long").alias("order_days"),
    )
    deltas = dur.select(
        F.col("s").alias("day"), F.lit(1).cast("long").alias("d")
    ).unionAll(
        dur.select(
            (F.col("e") + 1).alias("day"), F.lit(-1).cast("long").alias("d")
        )
    )
    perday = deltas.groupBy("day").agg(F.sum("d").cast("long").alias("d"))
    b = dur.agg(F.min("s").alias("lo"), F.max("e").alias("hi"))
    spine = b.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day")
    )
    sw = Window.orderBy("day")
    swept = (
        spine.join(perday, "day", "left")
        .select("day", F.coalesce(F.col("d"), F.lit(0)).alias("d"))
        .select("day", F.sum("d").over(sw).cast("long").alias("open_cnt"))
    )
    direct = swept.agg(
        F.sum("open_cnt").cast("long").alias("sum_open"),
        F.count(F.lit(1)).cast("long").alias("horizon"),
    )
    return sums.crossJoin(F.broadcast(direct)).selectExpr(
        "n_orders",
        "CAST(n_orders * 1000 div horizon AS BIGINT) AS lambda_milli",
        "CAST(order_days * 1000 div n_orders AS BIGINT) AS w_milli",
        "CAST(sum_open * 1000 div horizon AS BIGINT) AS l_direct_milli",
        "CAST(order_days * 10000 div sum_open AS BIGINT)"
        " AS identity_check_bp",
    )
