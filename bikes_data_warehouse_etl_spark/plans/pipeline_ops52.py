"""Round-4 batch 52: Welch t + power/MDE experiment readout, a
two-proportion z-test on event conversion, and population stability
index with bit-length logs.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic; the t/z queries use the `wilson_interval_weekly` float
exception (correctly-rounded IEEE sqrt/divide over exact int inputs,
same expression order both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.text import hash64
from bikes_data_warehouse_etl_spark.plans.extensions import _sql_hash64
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Welch t-test + power/MDE readout for the hash-split experiment
# ---------------------------------------------------------------------------
_SQL_WELCH = f"""
    WITH per_cust AS (
        SELECT CAST(SUM(CAST(ROUND(o_totalprice, 0) AS BIGINT)) // 1000
                   AS BIGINT) AS y,
               ({_sql_hash64("CAST(o_custkey AS VARCHAR)")}) & 1 AS arm
        FROM orders GROUP BY o_custkey),
    s AS (
        SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM per_cust GROUP BY 1),
    wide AS (
        SELECT MAX(CASE WHEN arm = 1 THEN n END) AS n1,
               MAX(CASE WHEN arm = 1 THEN sy END) AS sy1,
               MAX(CASE WHEN arm = 1 THEN syy END) AS syy1,
               MAX(CASE WHEN arm = 0 THEN n END) AS n0,
               MAX(CASE WHEN arm = 0 THEN sy END) AS sy0,
               MAX(CASE WHEN arm = 0 THEN syy END) AS syy0
        FROM s),
    d AS (
        -- variance numerators in EXACT int64 before the double cast:
        -- a double-side a*b - c*d invites compiler FMA contraction
        -- whose rounding an engine need not reproduce
        SELECT CAST(n1 AS DOUBLE) AS n1, CAST(n0 AS DOUBLE) AS n0,
               CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
               CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS m0,
               CAST(n1 * syy1 - sy1 * sy1 AS DOUBLE)
               / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)) AS v1,
               CAST(n0 * syy0 - sy0 * sy0 AS DOUBLE)
               / (CAST(n0 AS DOUBLE) * (CAST(n0 AS DOUBLE) - 1.0)) AS v0
        FROM wide),
    e AS (
        SELECT m1, m0, v1 / n1 + v0 / n0 AS se2, v1, v0, n1, n0 FROM d)
    SELECT CAST(FLOOR((m1 - m0) * 1000.0) AS BIGINT) AS diff_milli_kd,
           CAST(FLOOR((m1 - m0) / SQRT(se2) * 1000.0) AS BIGINT)
               AS welch_t_milli,
           CAST(FLOOR((se2 * se2)
                / (v1 * v1 / (n1 * n1 * (n1 - 1.0))
                   + v0 * v0 / (n0 * n0 * (n0 - 1.0))) * 1000.0) AS BIGINT)
               AS welch_df_milli,
           CAST(FLOOR(2.8016 * SQRT(se2) * 1000.0) AS BIGINT)
               AS mde80_milli_kd
    FROM e
    """


@_q("welch_power_readout", _SQL_WELCH)
def q_welch_power_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WELCH'S T + POWER READOUT for the hash-split experiment on
    customer spend: unequal-variance t statistic, Welch–Satterthwaite
    degrees of freedom, and the minimum detectable effect at 80%
    power / 5% two-sided alpha (2.8016·SE — the z-approximation every
    experimentation platform quotes). The frequentist completion of
    the experiment family: `permutation_test_priority` manufactures
    the null, `cuped_adjusted_ab` shrinks the variance, this SIZES
    the test — MDE above the effect you care about means "don't
    bother reading the p-value yet".

    Scale: three mergeable int64 sums per arm from one customer-keyed
    pass; the float block runs on a 1-row frame under the
    `wilson_interval_weekly` exception (correctly-rounded IEEE
    sqrt/divide over exact integer inputs, identical expression
    order both engines — the hash gate re-proves determinism every
    run).
    """
    per_cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.expr(
                "CAST(SUM(CAST(ROUND(o_totalprice, 0) AS BIGINT))"
                " div 1000 AS BIGINT)"
            ).alias("y")
        )
        .select(
            "y",
            (hash64(F.col("o_custkey").cast("string")) % 2).alias("arm"),
        )
    )
    s = per_cust.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    wide = s.agg(
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1l"),
        F.max(F.when(F.col("arm") == 1, F.col("sy"))).alias("sy1"),
        F.max(F.when(F.col("arm") == 1, F.col("syy"))).alias("syy1"),
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0l"),
        F.max(F.when(F.col("arm") == 0, F.col("sy"))).alias("sy0"),
        F.max(F.when(F.col("arm") == 0, F.col("syy"))).alias("syy0"),
    )
    d = wide.selectExpr(
        "CAST(n1l AS DOUBLE) AS n1",
        "CAST(n0l AS DOUBLE) AS n0",
        "CAST(sy1 AS DOUBLE) / CAST(n1l AS DOUBLE) AS m1",
        "CAST(sy0 AS DOUBLE) / CAST(n0l AS DOUBLE) AS m0",
        "CAST(n1l * syy1 - sy1 * sy1 AS DOUBLE)"
        " / (CAST(n1l AS DOUBLE) * (CAST(n1l AS DOUBLE) - 1.0)) AS v1",
        "CAST(n0l * syy0 - sy0 * sy0 AS DOUBLE)"
        " / (CAST(n0l AS DOUBLE) * (CAST(n0l AS DOUBLE) - 1.0)) AS v0",
    )
    e = d.selectExpr(
        "m1", "m0", "v1 / n1 + v0 / n0 AS se2", "v1", "v0", "n1", "n0"
    )
    return e.selectExpr(
        "CAST(FLOOR((m1 - m0) * 1000.0) AS BIGINT) AS diff_milli_kd",
        "CAST(FLOOR((m1 - m0) / SQRT(se2) * 1000.0) AS BIGINT)"
        " AS welch_t_milli",
        "CAST(FLOOR((se2 * se2)"
        " / (v1 * v1 / (n1 * n1 * (n1 - 1.0))"
        " + v0 * v0 / (n0 * n0 * (n0 - 1.0))) * 1000.0) AS BIGINT)"
        " AS welch_df_milli",
        "CAST(FLOOR(2.8016 * SQRT(se2) * 1000.0) AS BIGINT)"
        " AS mde80_milli_kd",
    )


# ---------------------------------------------------------------------------
# Two-proportion z-test: click -> purchase conversion, early vs late era
# ---------------------------------------------------------------------------
_SQL_CONV_Z = """
    WITH ev AS (
        SELECT user_id, event_type,
               CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS BIGINT) AS day
        FROM events WHERE event_type IN ('click', 'purchase')),
    b AS (SELECT (MIN(day) + MAX(day)) // 2 AS cut FROM ev),
    per_user AS (
        SELECT user_id,
               CASE WHEN MIN(day) <= (SELECT cut FROM b)
                    THEN 0 ELSE 1 END AS era,
               CAST(MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS BIGINT) AS clicked,
               CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS BIGINT) AS purchased
        FROM ev GROUP BY 1),
    s AS (
        SELECT era, CAST(SUM(clicked) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN clicked = 1 AND purchased = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS c
        FROM per_user GROUP BY 1),
    wide AS (
        SELECT MAX(CASE WHEN era = 0 THEN n END) AS n0,
               MAX(CASE WHEN era = 0 THEN c END) AS c0,
               MAX(CASE WHEN era = 1 THEN n END) AS n1,
               MAX(CASE WHEN era = 1 THEN c END) AS c1
        FROM s)
    SELECT CAST(c0 * 10000 // n0 AS BIGINT) AS early_conv_bp,
           CAST(c1 * 10000 // n1 AS BIGINT) AS late_conv_bp,
           CAST(FLOOR(
               (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
               / SQRT((CAST(c0 + c1 AS DOUBLE)
                       / CAST(n0 + n1 AS DOUBLE))
                      * (1.0 - CAST(c0 + c1 AS DOUBLE)
                               / CAST(n0 + n1 AS DOUBLE))
                      * (1.0 / CAST(n0 AS DOUBLE)
                         + 1.0 / CAST(n1 AS DOUBLE))) * 1000.0)
               AS BIGINT) AS z_milli
    FROM wide
    """


@_q("conversion_ztest", _SQL_CONV_Z)
def q_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-PROPORTION Z-TEST on click→purchase conversion, early vs
    late calendar half (user assigned to the era of their first
    funnel event; conversion = ever-purchased among ever-clicked) —
    the pooled-variance z that answers "did conversion actually
    move?" where `event_funnel` only reports the two rates. The
    proportions member of the testing family (means:
    `welch_power_readout`; distributions: `ks_value_drift`).

    Scale: one filtered event pass to a user-keyed census (map-side
    MAX flags), a 2×2 rollup, and a 1-row float block under the
    correctly-rounded-IEEE exception. Nothing scales past the user
    census.
    """
    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type").isin("click", "purchase"))
        .select(
            "user_id",
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("day"),
        )
    )
    b = ev.agg(
        F.expr("(MIN(day) + MAX(day)) div 2").cast("long").alias("cut")
    )
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.min("day").alias("first_day"),
            F.max((F.col("event_type") == "click").cast("long"))
            .cast("long")
            .alias("clicked"),
            F.max((F.col("event_type") == "purchase").cast("long"))
            .cast("long")
            .alias("purchased"),
        )
        .crossJoin(F.broadcast(b))
        .select(
            (F.col("first_day") > F.col("cut")).cast("long").alias("era"),
            "clicked",
            "purchased",
        )
    )
    s = per_user.groupBy("era").agg(
        F.sum("clicked").cast("long").alias("n"),
        F.sum(
            ((F.col("clicked") == 1) & (F.col("purchased") == 1)).cast("long")
        )
        .cast("long")
        .alias("c"),
    )
    wide = s.agg(
        F.max(F.when(F.col("era") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("era") == 0, F.col("c"))).alias("c0"),
        F.max(F.when(F.col("era") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("era") == 1, F.col("c"))).alias("c1"),
    )
    return wide.selectExpr(
        "CAST(c0 * 10000 div n0 AS BIGINT) AS early_conv_bp",
        "CAST(c1 * 10000 div n1 AS BIGINT) AS late_conv_bp",
        "CAST(FLOOR("
        "(CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
        " - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))"
        " / SQRT((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))"
        " * (1.0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))"
        " * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))"
        " * 1000.0) AS BIGINT) AS z_milli",
    )


# ---------------------------------------------------------------------------
# Population stability index with bit-length logs
# ---------------------------------------------------------------------------
_SQL_PSI = """
    WITH o AS (
        SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
               CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS BIGINT) AS day
        FROM orders),
    b AS (SELECT (MIN(day) + MAX(day)) // 2 AS cut FROM o),
    early AS (
        SELECT cents, NTILE(10) OVER (ORDER BY cents, day) AS dec
        FROM o WHERE day <= (SELECT cut FROM b)),
    bounds AS (
        SELECT dec, CAST(MAX(cents) AS BIGINT) AS hi FROM early
        GROUP BY 1),
    edges AS (
        SELECT dec, hi,
               COALESCE(LAG(hi) OVER (ORDER BY dec), -1) AS lo
        FROM bounds),
    binned AS (
        SELECT e.dec,
               CAST(SUM(CASE WHEN o.day <= (SELECT cut FROM b)
                             THEN 1 ELSE 0 END) AS BIGINT) AS ne,
               CAST(SUM(CASE WHEN o.day > (SELECT cut FROM b)
                             THEN 1 ELSE 0 END) AS BIGINT) AS nl
        FROM o JOIN edges e
          ON o.cents > e.lo AND (o.cents <= e.hi OR e.dec = 10)
        GROUP BY 1),
    tot AS (
        SELECT CAST(SUM(ne) AS BIGINT) AS te, CAST(SUM(nl) AS BIGINT) AS tl
        FROM binned),
    rates AS (
        SELECT dec,
               GREATEST(ne * 10000 // te, 1) AS p_bp,
               GREATEST(nl * 10000 // tl, 1) AS q_bp
        FROM binned, tot)
    SELECT CAST(SUM((p_bp - q_bp)
                    * (CAST(LENGTH(BIN(p_bp * 1024 // q_bp)) AS BIGINT)
                       - 11)) AS BIGINT) AS psi_bits_bp,
           CAST(SUM(abs(p_bp - q_bp)) AS BIGINT) AS total_shift_bp,
           CAST(COUNT(*) AS BIGINT) AS n_bins
    FROM rates
    """


@_q("psi_value_drift", _SQL_PSI)
def q_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POPULATION STABILITY INDEX (the credit-risk drift metric):
    order values binned by the EARLY era's deciles (reference-period
    bins — PSI's defining choice; `ks_value_drift` compares pooled
    CDFs), then Σ (p−q)·log(p/q) with the log as the integer BIT
    LENGTH of the 1024-scaled ratio (±½-bit quantization, sign and
    magnitude ordering preserved — the `zipf_slope_bits` route,
    chosen over float ln because ln, unlike sqrt, is NOT guaranteed
    correctly rounded across libm implementations). The
    total_shift_bp companion column is quantization-free. Risk teams
    alarm at PSI > 0.1; here that's ~psi_bits_bp > 1400 at the bit
    scale (0.1 nats ≈ 0.144 bits × 10⁴ bp).

    Scale: the reference deciles come from an era-filtered NTILE
    (global-sort over the early era; the histogram-rank upgrade
    applies at 10⁹ rows); binning is a broadcast range join against
    10 edges; both era counts accumulate in ONE pass of the fact
    stream. Bin edges are data-derived but bounded (10 rows).
    """
    o = _t(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day"),
    )
    b = o.agg(
        F.expr("(MIN(day) + MAX(day)) div 2").cast("long").alias("cut")
    )
    oc = o.crossJoin(F.broadcast(b))
    early = oc.where(F.col("day") <= F.col("cut")).select(
        "cents",
        F.ntile(10).over(Window.orderBy("cents", "day")).alias("dec"),
    )
    bounds = early.groupBy("dec").agg(
        F.max("cents").cast("long").alias("hi")
    )
    edges = bounds.select(
        "dec",
        "hi",
        F.coalesce(
            F.lag("hi").over(Window.orderBy("dec")), F.lit(-1).cast("long")
        ).alias("lo"),
    )
    binned = (
        oc.join(
            F.broadcast(edges),
            (F.col("cents") > F.col("lo"))
            & ((F.col("cents") <= F.col("hi")) | (F.col("dec") == 10)),
        )
        .groupBy("dec")
        .agg(
            F.sum((F.col("day") <= F.col("cut")).cast("long"))
            .cast("long")
            .alias("ne"),
            F.sum((F.col("day") > F.col("cut")).cast("long"))
            .cast("long")
            .alias("nl"),
        )
    )
    tot = binned.agg(
        F.sum("ne").cast("long").alias("te"),
        F.sum("nl").cast("long").alias("tl"),
    )
    rates = binned.crossJoin(F.broadcast(tot)).select(
        "dec",
        F.expr("GREATEST(ne * 10000 div te, 1)").alias("p_bp"),
        F.expr("GREATEST(nl * 10000 div tl, 1)").alias("q_bp"),
    )
    return rates.agg(
        F.expr(
            "CAST(SUM((p_bp - q_bp)"
            " * (CAST(LENGTH(BIN(p_bp * 1024 div q_bp)) AS BIGINT) - 11))"
            " AS BIGINT)"
        ).alias("psi_bits_bp"),
        F.expr("CAST(SUM(abs(p_bp - q_bp)) AS BIGINT)").alias(
            "total_shift_bp"
        ),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
    )
