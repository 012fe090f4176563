"""Round-4 batch 37: nonparametric hypothesis testing — Mann–Whitney
AUC between calendar eras, total-variation independence testing for a
contingency table, and the Wald–Wolfowitz runs test for randomness.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


_SQL_DAILY_KD = """
    daily AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS BIGINT) AS day,
               CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) // 1000
                   AS BIGINT) AS kd
        FROM orders GROUP BY 1)"""


def _daily_kd(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("day")
        )
        .agg(
            F.expr(
                "CAST(sum(CAST(floor(o_totalprice) AS LONG)) div 1000 AS LONG)"
            ).alias("kd")
        )
    )


# ---------------------------------------------------------------------------
# Mann–Whitney: AUC between calendar halves with exact midranks
# ---------------------------------------------------------------------------
_SQL_MANN_WHITNEY = f"""
    WITH {_SQL_DAILY_KD},
    r AS (
        SELECT day, kd, ROW_NUMBER() OVER (ORDER BY day) AS rk,
               (SELECT COUNT(*) FROM daily) AS nd
        FROM daily),
    lab AS (
        SELECT kd, CASE WHEN rk * 2 <= nd THEN 0 ELSE 1 END AS era FROM r),
    h AS (
        SELECT kd,
               CAST(SUM(CASE WHEN era = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
               CAST(SUM(1) AS BIGINT) AS ct
        FROM lab GROUP BY 1),
    cum AS (
        SELECT kd, ca, ct,
               CAST(COALESCE(SUM(ct) OVER (ORDER BY kd ROWS BETWEEN UNBOUNDED
                    PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS less_t
        FROM h),
    s AS (
        SELECT CAST(SUM(ca * (2 * less_t + ct + 1)) AS BIGINT) AS r2_a,
               CAST(SUM(ca) AS BIGINT) AS n_a,
               CAST(SUM(ct) - SUM(ca) AS BIGINT) AS n_b
        FROM cum)
    SELECT n_a, n_b,
           CAST(r2_a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
           CAST((r2_a - n_a * (n_a + 1)) * 5000 // (n_a * n_b) AS BIGINT)
               AS auc_bp,
           CAST(CASE WHEN 3 * (r2_a - n_a * (n_a + 1) - n_a * n_b)
                          * (r2_a - n_a * (n_a + 1) - n_a * n_b)
                     > 4 * n_a * n_b * (n_a + n_b + 1)
                THEN 1 ELSE 0 END AS BIGINT) AS significant
    FROM s
    """


@_q("mann_whitney_eras", _SQL_MANN_WHITNEY)
def q_mann_whitney_eras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN–WHITNEY U between the calendar halves of the daily revenue
    series, reported as the AUC effect size in bp — P(random early day
    > random late day), the nonparametric "did the level shift"
    answer that needs no normality (`ks_value_drift` compares SHAPES;
    U/AUC tests STOCHASTIC ORDER). Midranks are exact under ties via
    DOUBLED ranks: 2·midrank(v) = 2·(#below v) + (#tied at v) + 1,
    summed off the value histogram — so u2_a = 2·U_A and auc_bp =
    U_A/(n_a·n_b) stay pure integers. The significance flag is the
    cross-multiplied |z| > 2 normal approximation
    3·(2U − n_a·n_b)² > 4·n_a·n_b·(n+1) (tie-correction shrinks the
    true variance, making this flag conservative — documented, not
    hidden).

    Scale: one fact-sized daily rollup; ranks come from the
    VALUE-histogram prefix (never a per-row rank), the era split from
    the calendar-bounded day rank. Everything after the rollup is
    day-domain sized.
    """
    daily = _daily_kd(spark, sf_dir)
    nd = daily.agg(F.count(F.lit(1)).cast("long").alias("nd"))
    r = daily.crossJoin(F.broadcast(nd)).select(
        "kd",
        "nd",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("rk"),
    )
    lab = r.select(
        "kd",
        F.when(F.col("rk") * 2 <= F.col("nd"), F.lit(0)).otherwise(1).alias("era"),
    )
    h = lab.groupBy("kd").agg(
        F.sum((F.col("era") == 0).cast("long")).cast("long").alias("ca"),
        F.count(F.lit(1)).cast("long").alias("ct"),
    )
    w = Window.orderBy("kd").rowsBetween(Window.unboundedPreceding, -1)
    cum = h.select(
        "kd",
        "ca",
        "ct",
        F.coalesce(F.sum("ct").over(w), F.lit(0)).cast("long").alias("less_t"),
    )
    s = cum.agg(
        F.sum(F.col("ca") * (2 * F.col("less_t") + F.col("ct") + 1))
        .cast("long")
        .alias("r2_a"),
        F.sum("ca").cast("long").alias("n_a"),
        (F.sum("ct") - F.sum("ca")).cast("long").alias("n_b"),
    )
    return s.select(
        "n_a",
        "n_b",
        (F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1))
        .cast("long")
        .alias("u2_a"),
        F.expr("(r2_a - n_a * (n_a + 1)) * 5000 div (n_a * n_b)")
        .cast("long")
        .alias("auc_bp"),
        F.expr(
            "CAST(CASE WHEN 3 * (r2_a - n_a * (n_a + 1) - n_a * n_b)"
            " * (r2_a - n_a * (n_a + 1) - n_a * n_b)"
            " > 4 * n_a * n_b * (n_a + n_b + 1) THEN 1 ELSE 0 END AS LONG)"
        ).alias("significant"),
    )


# ---------------------------------------------------------------------------
# Independence: total-variation distance of priority x region
# ---------------------------------------------------------------------------
_SQL_TVD_INDEP = """
    WITH cell AS (
        SELECT o_orderpriority AS priority, r_name AS region,
               CAST(COUNT(*) AS BIGINT) AS o
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1, 2),
    marg AS (
        SELECT cell.priority, cell.region, cell.o,
               rs.rsum, cs.csum, t.n
        FROM cell
        JOIN (SELECT priority, CAST(SUM(o) AS BIGINT) AS rsum FROM cell
              GROUP BY 1) rs ON cell.priority = rs.priority
        JOIN (SELECT region, CAST(SUM(o) AS BIGINT) AS csum FROM cell
              GROUP BY 1) cs ON cell.region = cs.region
        CROSS JOIN (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cell) t)
    SELECT CAST(MAX(n) AS BIGINT) AS n_orders,
           CAST(SUM(abs(o * n - rsum * csum)) * 10000 // (2 * MAX(n) * MAX(n))
               AS BIGINT) AS tvd_bp,
           CAST(MAX(abs(o * n - rsum * csum) * 10000 // (n * n)) AS BIGINT)
               AS max_cell_dev_bp
    FROM marg
    """


@_q("independence_tvd", _SQL_TVD_INDEP)
def q_independence_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INDEPENDENCE TEST for order priority × customer region as the
    total-variation distance from the independent product measure:
    TVD = ½·Σ|p(cell) − p(row)·p(col)| in bp — the probability mass
    that would have to move for the two dimensions to be independent
    (0 = priorities are assigned identically across regions). The
    integer form works on the cross-product |O·N − R·C| so no
    fractional probability ever exists; χ² weights cells by 1/E and
    needs either squares of these products (int64-unsafe at fact
    scale) or float — TVD is the exact-arithmetic independence
    measure, and max_cell_dev_bp points at the most aberrant cell
    (`priority_mix_shift` tests drift over TIME; this tests
    association between two dimensions at once).

    Scale: one fact scan with broadcast dim chain (the `cust_dim`
    shape) partial-aggregated to the 25-cell table; margins and
    totals are cell-table aggregates. int64: |O·N| ≤ N² ≈ 2e13 at
    sf1, ×10⁴ ≈ 2e17 ✓; pre-divide counts by 10 beyond ~10⁸ orders.
    """
    cell = (
        _t(spark, sf_dir, "orders")
        .join(
            _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("r_name").alias("region"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
    )
    rs = cell.groupBy("priority").agg(F.sum("o").cast("long").alias("rsum"))
    cs = cell.groupBy("region").agg(F.sum("o").cast("long").alias("csum"))
    t = cell.agg(F.sum("o").cast("long").alias("n"))
    marg = (
        cell.join(F.broadcast(rs), "priority")
        .join(F.broadcast(cs), "region")
        .crossJoin(F.broadcast(t))
    )
    dev = F.abs(F.col("o") * F.col("n") - F.col("rsum") * F.col("csum"))
    return marg.agg(
        F.max("n").cast("long").alias("n_orders"),
        F.expr(
            "CAST(sum(abs(o * n - rsum * csum)) * 10000"
            " div (2 * max(n) * max(n)) AS LONG)"
        ).alias("tvd_bp"),
        F.max(F.expr("abs(o * n - rsum * csum) * 10000 div (n * n)"))
        .cast("long")
        .alias("max_cell_dev_bp"),
    )


# ---------------------------------------------------------------------------
# Runs test: is the above/below-median daily sequence random?
# ---------------------------------------------------------------------------
_SQL_RUNS_TEST = f"""
    WITH {_SQL_DAILY_KD},
    med AS (
        SELECT kd AS m FROM (
            SELECT kd, ROW_NUMBER() OVER (ORDER BY kd, day) AS r,
                   (SELECT COUNT(*) FROM daily) AS n
            FROM daily)
        WHERE 2 * r = n + (n % 2)),
    signs AS (
        SELECT day, CASE WHEN kd > (SELECT m FROM med) THEN 1 ELSE 0 END AS s
        FROM daily),
    flips AS (
        SELECT s,
               CASE WHEN LAG(s) OVER (ORDER BY day) IS DISTINCT FROM s
                    THEN 1 ELSE 0 END AS flip
        FROM signs),
    agg AS (
        SELECT CAST(SUM(flip) AS BIGINT) AS n_runs,
               CAST(SUM(s) AS BIGINT) AS n1,
               CAST(COUNT(*) - SUM(s) AS BIGINT) AS n2
        FROM flips)
    SELECT n1 + n2 AS n_days, n1 AS n_above, n2 AS n_at_or_below, n_runs,
           CAST(CASE WHEN
                ((n1 + n2) * (n_runs - 1) - 2 * n1 * n2)
                * ((n1 + n2) * (n_runs - 1) - 2 * n1 * n2)
                * (n1 + n2 - 1)
                > 8 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
                THEN 1 ELSE 0 END AS BIGINT) AS nonrandom
    FROM agg
    """


@_q("runs_test_daily", _SQL_RUNS_TEST)
def q_runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WALD–WOLFOWITZ RUNS TEST on the daily revenue sequence
    dichotomized at its lower median: too FEW runs of above/below
    days means trending or regime-sticky behavior, too MANY means
    oscillation — the randomness diagnostic that tells the
    monitoring family whether `cusum_change_detection`'s i.i.d.-ish
    premise even holds. The |z| > 2 gate is fully cross-multiplied:
    (n(R−1) − 2n₁n₂)²·(n−1) > 8·n₁n₂·(2n₁n₂ − n) — no float mean,
    variance, or square root; the run count is 1 + Σ sign-flips via
    one LAG (the first row's NULL lag counts as a flip, supplying
    the +1).

    Scale: after the fact-sized daily rollup everything is
    day-domain: the median is the deterministic lower-median rank
    test, the flip scan is one ordered window over calendar-bounded
    rows. Per-series runs tests partition the same windows.
    """
    daily = _daily_kd(spark, sf_dir)
    n = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    med = (
        daily.crossJoin(F.broadcast(n))
        .select(
            "kd",
            "n",
            F.row_number().over(Window.orderBy("kd", "day")).cast("long").alias("r"),
        )
        .where(2 * F.col("r") == F.col("n") + F.col("n") % 2)
        .select(F.col("kd").alias("m"))
    )
    signs = daily.crossJoin(F.broadcast(med)).select(
        "day", (F.col("kd") > F.col("m")).cast("long").alias("s")
    )
    wl = Window.orderBy("day")
    flips = signs.select(
        "s",
        F.when(
            ~F.lag("s").over(wl).eqNullSafe(F.col("s")), F.lit(1)
        )
        .otherwise(0)
        .alias("flip"),
    )
    agg = flips.agg(
        F.sum("flip").cast("long").alias("n_runs"),
        F.sum("s").cast("long").alias("n1"),
        (F.count(F.lit(1)) - F.sum("s")).cast("long").alias("n2"),
    )
    return agg.select(
        (F.col("n1") + F.col("n2")).cast("long").alias("n_days"),
        F.col("n1").alias("n_above"),
        F.col("n2").alias("n_at_or_below"),
        "n_runs",
        F.expr(
            "CAST(CASE WHEN ((n1 + n2) * (n_runs - 1) - 2 * n1 * n2)"
            " * ((n1 + n2) * (n_runs - 1) - 2 * n1 * n2) * (n1 + n2 - 1)"
            " > 8 * n1 * n2 * (2 * n1 * n2 - n1 - n2)"
            " THEN 1 ELSE 0 END AS LONG)"
        ).alias("nonrandom"),
    )
