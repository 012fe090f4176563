"""Round-4 batch 54: a full classifier evaluation (confusion matrix
through MCC) for a recency churn rule, post-stratified experiment
readout, and a negative-binomial method-of-moments fit.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic; MCC uses the `wilson_interval_weekly` IEEE-sqrt exception.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.text import hash64
from bikes_data_warehouse_etl_spark.plans.extensions import _sql_hash64
from bikes_data_warehouse_etl_spark.plans.pipeline_ops29 import (
    _sdiv_expr,
    _sdiv_sql,
)
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Classifier evaluation: recency-rule churn prediction
# ---------------------------------------------------------------------------
_CE_CUTOFF = "2001-07-01"
_CE_RECENCY_DAYS = 60

_SQL_CLASSIFIER = f"""
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(MAX(CASE WHEN o_orderdate < TIMESTAMP '{_CE_CUTOFF}'
                             THEN date_diff('day', o_orderdate,
                                            TIMESTAMP '{_CE_CUTOFF}')
                             END) IS NULL AS BIGINT) AS no_history,
               CAST(MIN(CASE WHEN o_orderdate < TIMESTAMP '{_CE_CUTOFF}'
                             THEN date_diff('day', o_orderdate,
                                            TIMESTAMP '{_CE_CUTOFF}')
                             END) AS BIGINT) AS recency,
               CAST(MAX(CASE WHEN o_orderdate >= TIMESTAMP '{_CE_CUTOFF}'
                             THEN 1 ELSE 0 END) AS BIGINT) AS returned
        FROM orders GROUP BY 1),
    labeled AS (
        SELECT CASE WHEN recency > {_CE_RECENCY_DAYS} THEN 1 ELSE 0 END
                   AS pred_churn,
               1 - returned AS true_churn
        FROM per_cust WHERE no_history = 0),
    cm AS (
        SELECT CAST(SUM(pred_churn * true_churn) AS BIGINT) AS tp,
               CAST(SUM(pred_churn * (1 - true_churn)) AS BIGINT) AS fp,
               CAST(SUM((1 - pred_churn) * true_churn) AS BIGINT) AS fn,
               CAST(SUM((1 - pred_churn) * (1 - true_churn)) AS BIGINT)
                   AS tn
        FROM labeled)
    SELECT tp, fp, fn, tn,
           CAST(tp * 10000 // GREATEST(tp + fp, 1) AS BIGINT)
               AS precision_bp,
           CAST(tp * 10000 // GREATEST(tp + fn, 1) AS BIGINT) AS recall_bp,
           CAST(2 * tp * 10000 // GREATEST(2 * tp + fp + fn, 1) AS BIGINT)
               AS f1_bp,
           CAST(FLOOR(CAST(tp * tn - fp * fn AS DOUBLE)
                / SQRT(CAST(tp + fp AS DOUBLE))
                / SQRT(CAST(tp + fn AS DOUBLE))
                / SQRT(CAST(tn + fp AS DOUBLE))
                / SQRT(CAST(tn + fn AS DOUBLE)) * 1000.0) AS BIGINT)
               AS mcc_milli
    FROM cm
    """


@_q("classifier_eval_churn", _SQL_CLASSIFIER)
def q_classifier_eval_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLASSIFIER EVALUATION, end to end: a recency rule ("no order in
    the 60 days before {cutoff} → will churn") scored against the
    future the data actually recorded (no order AFTER the cutoff) —
    confusion matrix, precision / recall / F1 in basis points, and
    MATTHEWS CORRELATION (the imbalance-honest summary; F1 of a
    trivial all-churn rule looks fine, MCC ≈ 0 exposes it; its four
    sqrt factors ride the `wilson_interval_weekly` IEEE exception).
    The supervised-eval family's foundation the repo still lacked:
    `decile_lift` ranks a score, `ann_recall_eval`/`ndcg_bits_eval`
    grade retrieval — this grades a DECISION.

    Scale: one orders pass to a customer-keyed census (map-side MIN/
    MAX build recency and the future label together — the point-in-
    time discipline of `temporal_split_embargo`: features strictly
    before the cutoff, label strictly after), a 4-cell rollup, 1-row
    arithmetic. Threshold sweeps re-bin the same census.
    """
    per_cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.min(
                F.when(
                    F.col("o_orderdate")
                    < F.lit(_CE_CUTOFF).cast("timestamp"),
                    F.datediff(
                        F.lit(_CE_CUTOFF).cast("date"),
                        F.col("o_orderdate"),
                    ),
                )
            )
            .cast("long")
            .alias("recency"),
            F.max(
                (
                    F.col("o_orderdate")
                    >= F.lit(_CE_CUTOFF).cast("timestamp")
                ).cast("long")
            )
            .cast("long")
            .alias("returned"),
        )
        .where(F.col("recency").isNotNull())
    )
    labeled = per_cust.select(
        (F.col("recency") > _CE_RECENCY_DAYS).cast("long").alias("p"),
        (1 - F.col("returned")).alias("t"),
    )
    cm = labeled.agg(
        F.sum(F.col("p") * F.col("t")).cast("long").alias("tp"),
        F.sum(F.col("p") * (1 - F.col("t"))).cast("long").alias("fp"),
        F.sum((1 - F.col("p")) * F.col("t")).cast("long").alias("fn"),
        F.sum((1 - F.col("p")) * (1 - F.col("t")))
        .cast("long")
        .alias("tn"),
    )
    return cm.selectExpr(
        "tp",
        "fp",
        "fn",
        "tn",
        "CAST(tp * 10000 div GREATEST(tp + fp, 1) AS BIGINT)"
        " AS precision_bp",
        "CAST(tp * 10000 div GREATEST(tp + fn, 1) AS BIGINT) AS recall_bp",
        "CAST(2 * tp * 10000 div GREATEST(2 * tp + fp + fn, 1) AS BIGINT)"
        " AS f1_bp",
        "CAST(FLOOR(CAST(tp * tn - fp * fn AS DOUBLE)"
        " / SQRT(CAST(tp + fp AS DOUBLE))"
        " / SQRT(CAST(tp + fn AS DOUBLE))"
        " / SQRT(CAST(tn + fp AS DOUBLE))"
        " / SQRT(CAST(tn + fn AS DOUBLE)) * 1000.0) AS BIGINT)"
        " AS mcc_milli",
    )


# ---------------------------------------------------------------------------
# Post-stratified experiment readout
# ---------------------------------------------------------------------------
_SQL_POST_STRAT = f"""
    WITH per_cust AS (
        SELECT o.o_custkey, c.c_mktsegment AS stratum,
               CAST(SUM(CAST(ROUND(o_totalprice, 0) AS BIGINT)) // 1000
                   AS BIGINT) AS y,
               ({_sql_hash64("CAST(o.o_custkey AS VARCHAR)")}) & 1 AS arm
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2),
    cell AS (
        SELECT stratum, arm, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS sy
        FROM per_cust GROUP BY 1, 2),
    strat AS (
        SELECT stratum,
               CAST(SUM(n) AS BIGINT) AS n_strat,
               {_sdiv_sql(
                   "MAX(CASE WHEN arm = 1 THEN sy END) * 1000",
                   "GREATEST(MAX(CASE WHEN arm = 1 THEN n END), 1)")}
               - {_sdiv_sql(
                   "MAX(CASE WHEN arm = 0 THEN sy END) * 1000",
                   "GREATEST(MAX(CASE WHEN arm = 0 THEN n END), 1)")}
                   AS diff_milli
        FROM cell GROUP BY 1),
    raw AS (
        SELECT {_sdiv_sql(
                   "SUM(CASE WHEN arm = 1 THEN sy ELSE 0 END) * 1000",
                   "GREATEST(SUM(CASE WHEN arm = 1 THEN n ELSE 0 END), 1)")}
               - {_sdiv_sql(
                   "SUM(CASE WHEN arm = 0 THEN sy ELSE 0 END) * 1000",
                   "GREATEST(SUM(CASE WHEN arm = 0 THEN n ELSE 0 END), 1)")}
                   AS raw_diff_milli
        FROM cell)
    SELECT CAST(raw.raw_diff_milli AS BIGINT) AS raw_diff_milli_kd,
           CAST({_sdiv_sql("SUM(strat.diff_milli * strat.n_strat)",
                           "SUM(strat.n_strat)")} AS BIGINT)
               AS post_strat_diff_milli_kd,
           CAST(COUNT(*) AS BIGINT) AS n_strata
    FROM strat, raw
    GROUP BY raw.raw_diff_milli
    """


@_q("post_stratified_ab", _SQL_POST_STRAT)
def q_post_stratified_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POST-STRATIFICATION: the experiment contrast re-estimated as
    the segment-size-weighted mean of WITHIN-segment arm differences
    — the survey-statistics fix for composition imbalance (if one
    arm randomly drew more BUILDING-segment whales, the raw diff
    inherits that luck; within-stratum diffs cancel it). The third
    member of the adjustment family: `cuped_adjusted_ab` regresses
    out a covariate, `ipf_raking_weights` reweights to margins, this
    conditions on a stratifier. Agreement of all three is the
    robustness read.

    Scale: one joined pass to (stratum, arm) cells — a ≤10-cell
    census of mergeable sums; both the raw and post-stratified
    contrasts are arithmetic over those cells. Nothing rescans.
    """
    per_cust = (
        _t(spark, sf_dir, "orders")
        .join(
            _t(spark, sf_dir, "customer").select(
                    "c_custkey", F.col("c_mktsegment").alias("stratum")
                ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("o_custkey", "stratum")
        .agg(
            F.expr(
                "CAST(SUM(CAST(ROUND(o_totalprice, 0) AS BIGINT))"
                " div 1000 AS BIGINT)"
            ).alias("y")
        )
        .select(
            "stratum",
            "y",
            (hash64(F.col("o_custkey").cast("string")) % 2).alias("arm"),
        )
    )
    cell = per_cust.groupBy("stratum", "arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
    )
    strat = cell.groupBy("stratum").agg(
        F.sum("n").cast("long").alias("n_strat"),
        F.expr(
            _sdiv_expr(
                "MAX(CASE WHEN arm = 1 THEN sy END) * 1000",
                "GREATEST(MAX(CASE WHEN arm = 1 THEN n END), 1)",
            )
            + " - "
            + _sdiv_expr(
                "MAX(CASE WHEN arm = 0 THEN sy END) * 1000",
                "GREATEST(MAX(CASE WHEN arm = 0 THEN n END), 1)",
            )
        ).alias("diff_milli"),
    )
    raw = cell.agg(
        F.expr(
            _sdiv_expr(
                "SUM(CASE WHEN arm = 1 THEN sy ELSE 0 END) * 1000",
                "GREATEST(SUM(CASE WHEN arm = 1 THEN n ELSE 0 END), 1)",
            )
            + " - "
            + _sdiv_expr(
                "SUM(CASE WHEN arm = 0 THEN sy ELSE 0 END) * 1000",
                "GREATEST(SUM(CASE WHEN arm = 0 THEN n ELSE 0 END), 1)",
            )
        ).alias("raw_diff_milli")
    )
    return (
        strat.crossJoin(F.broadcast(raw))
        .groupBy("raw_diff_milli")
        .agg(
            F.expr(
                "CAST("
                + _sdiv_expr(
                    "SUM(diff_milli * n_strat)", "SUM(n_strat)"
                )
                + " AS BIGINT)"
            ).alias("post_strat_diff_milli_kd"),
            F.count(F.lit(1)).cast("long").alias("n_strata"),
        )
        .select(
            F.col("raw_diff_milli").cast("long").alias("raw_diff_milli_kd"),
            "post_strat_diff_milli_kd",
            "n_strata",
        )
    )


# ---------------------------------------------------------------------------
# Negative binomial method-of-moments fit of daily order counts
# ---------------------------------------------------------------------------
_SQL_NB_FIT = f"""
    WITH o AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS BIGINT) AS day
        FROM orders),
    b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM o),
    spine AS (
        SELECT CAST(UNNEST(generate_series(
                   (SELECT lo FROM b), (SELECT hi FROM b))) AS BIGINT)
            AS day),
    counts AS (
        SELECT s.day, CAST(COUNT(o.day) AS BIGINT) AS x
        FROM spine s LEFT JOIN o ON o.day = s.day GROUP BY 1),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM counts),
    mo AS (
        SELECT n, CAST(sx * 1000 // n AS BIGINT) AS mean_milli,
               CAST({_sdiv_sql("(n * sxx - sx * sx) * 1000", "n * n")}
                   AS BIGINT) AS var_milli
        FROM s)
    SELECT n AS n_days, mean_milli, var_milli,
           CAST(CASE WHEN var_milli > mean_milli
                     THEN mean_milli * mean_milli
                          // (var_milli - mean_milli)
                     ELSE -1 END AS BIGINT) AS nb_r_milli,
           CAST(CASE WHEN var_milli > 0
                     THEN mean_milli * 10000 // var_milli
                     ELSE -1 END AS BIGINT) AS nb_p_bp
    FROM mo
    """


@_q("nb_moments_fit", _SQL_NB_FIT)
def q_nb_moments_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEGATIVE-BINOMIAL FIT by method of moments on daily order
    counts (full calendar, zeros included): r = m²/(v−m), p = m/v —
    the two-parameter arrival model a forecaster reaches for the
    moment `dispersion_index` reports VMR > 1000 (Poisson refuted).
    r in milli and p in bp come straight from the same three sums;
    r sentinel −1 flags under-dispersion (NB inapplicable,
    binomial-thinning territory). Downstream, r and p parameterize
    the demand simulator `inventory_clamped_balance` would sample.

    Scale: identical shape to `dispersion_index` — spine-filled
    census, three mergeable sums, 1-row arithmetic.
    """
    o = _t(spark, sf_dir, "orders").select(
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day")
    )
    b = o.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = b.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day")
    )
    per_day = o.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("x0")
    )
    counts = spine.join(per_day, "day", "left").select(
        F.coalesce(F.col("x0"), F.lit(0)).alias("x")
    )
    s = counts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    mo = s.select(
        "n",
        F.expr("CAST(sx * 1000 div n AS BIGINT)").alias("mean_milli"),
        F.expr(
            "CAST("
            + _sdiv_expr("(n * sxx - sx * sx) * 1000", "n * n")
            + " AS BIGINT)"
        ).alias("var_milli"),
    )
    return mo.selectExpr(
        "n AS n_days",
        "mean_milli",
        "var_milli",
        "CAST(CASE WHEN var_milli > mean_milli"
        " THEN mean_milli * mean_milli div (var_milli - mean_milli)"
        " ELSE -1 END AS BIGINT) AS nb_r_milli",
        "CAST(CASE WHEN var_milli > 0"
        " THEN mean_milli * 10000 div var_milli"
        " ELSE -1 END AS BIGINT) AS nb_p_bp",
    )
