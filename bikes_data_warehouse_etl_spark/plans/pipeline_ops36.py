"""Round-4 batch 36: distribution diagnostics — weekday seasonality
strength (variance decomposition), an exact integer Kolmogorov–Smirnov
drift statistic, and a text-vs-embedding dedup agreement audit.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.text import hash64, tokens
from bikes_data_warehouse_etl_spark.functions.vectors import sign_lsh_bucket
from bikes_data_warehouse_etl_spark.plans.extensions import _SQL_TOKENS, _sql_hash64
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Seasonality strength: eta-squared of weekday on daily revenue
# ---------------------------------------------------------------------------
_SQL_SEASONALITY = """
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS BIGINT) AS day,
               CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) // 1000
                   AS BIGINT) AS kd
        FROM orders GROUP BY 1),
    g AS (
        SELECT day % 7 AS dow, CAST(COUNT(*) AS BIGINT) AS n_g,
               CAST(SUM(kd) AS BIGINT) AS s_g,
               CAST(SUM(kd * kd) AS BIGINT) AS ss_g
        FROM daily GROUP BY 1),
    t AS (
        SELECT CAST(SUM(n_g) AS BIGINT) AS n, CAST(SUM(s_g) AS BIGINT) AS s,
               CAST(SUM(ss_g) AS BIGINT) AS ssq,
               CAST(SUM(CAST(s_g AS HUGEINT) * s_g // n_g) AS BIGINT) AS a
        FROM g)
    SELECT n AS n_days,
           CAST((CAST(a AS HUGEINT) - CAST(s AS HUGEINT) * s // n) * 10000
                // GREATEST(CAST(ssq AS HUGEINT)
                            - CAST(s AS HUGEINT) * s // n, 1)
               AS BIGINT) AS eta_sq_bp
    FROM t
    """


@_q("weekday_seasonality_strength", _SQL_SEASONALITY)
def q_weekday_seasonality_strength(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SEASONALITY STRENGTH: eta² of weekday on daily revenue — the
    share (bp) of day-to-day revenue variance explained by the
    day-of-week alone, SSB/SST computed from the integer sufficient
    sums (Σ_g S_g²/n_g − S²/n over Σx² − S²/n, per-term floor
    division — the `ols_discount_quantity` discipline applied to
    ANOVA). Near 0 → `seasonal_naive_mape`'s weekly baseline can't
    beat naive-1; near 10000 → the weekday profile
    (`dow_hour_heatmap`) IS the forecast.

    Scale: one fact-sized daily rollup, then a 7-group aggregate of
    three longs — the sufficient-statistics pattern again: shards
    merge by adding (n, s, ssq) per group. int64 holds for the per-day
    and per-group SUMS (ss_g ≤ kd²·days); the S² / S_g² PRODUCTS left
    int64 at sf10's daily volumes (sweep-caught), so the ANOVA ratio
    is formed in 128-bit exact arithmetic — DuckDB HUGEINT, Spark
    decimal(38,0) — and only the ≤10000 bp quotient returns to int64
    (good to ~3e9 total kilodollars squared ≈ 1e19 × 1e4 within
    decimal38's 1e38 headroom, i.e. far past 100 TB).
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
                "CAST(sum(CAST(floor(o_totalprice) AS LONG)) div 1000 AS LONG)"
            ).alias("kd")
        )
    )
    g = daily.groupBy((F.col("day") % 7).alias("dow")).agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("kd").cast("long").alias("s_g"),
        F.sum(F.col("kd") * F.col("kd")).cast("long").alias("ss_g"),
    )
    t = g.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").cast("long").alias("s"),
        F.sum("ss_g").cast("long").alias("ssq"),
        F.sum(F.expr("cast(s_g as decimal(38,0)) * s_g div n_g"))
        .cast("long")
        .alias("a"),
    )
    return t.select(
        F.col("n").alias("n_days"),
        F.expr(
            "CAST((cast(a as decimal(38,0)) - cast(s as decimal(38,0)) * s"
            " div n) * 10000 div GREATEST(cast(ssq as decimal(38,0))"
            " - cast(s as decimal(38,0)) * s div n, 1) AS LONG)"
        ).alias("eta_sq_bp"),
    )


# ---------------------------------------------------------------------------
# Exact integer Kolmogorov–Smirnov drift between two eras
# ---------------------------------------------------------------------------
_SQL_KS_DRIFT = """
    WITH o AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS BIGINT) AS day,
               CAST(FLOOR(o_totalprice) AS BIGINT) AS dollar
        FROM orders),
    days AS (
        SELECT day, ROW_NUMBER() OVER (ORDER BY day) AS rk,
               (SELECT COUNT(DISTINCT day) FROM o) AS nd
        FROM (SELECT DISTINCT day FROM o)),
    lab AS (
        SELECT o.dollar,
               CASE WHEN days.rk * 2 <= days.nd THEN 0 ELSE 1 END AS era
        FROM o JOIN days ON o.day = days.day),
    h AS (
        SELECT dollar,
               CAST(SUM(CASE WHEN era = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
               CAST(SUM(CASE WHEN era = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
        FROM lab GROUP BY 1),
    cum AS (
        SELECT dollar,
               CAST(SUM(ca) OVER (ORDER BY dollar ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_a,
               CAST(SUM(cb) OVER (ORDER BY dollar ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_b,
               (SELECT SUM(ca) FROM h) AS na, (SELECT SUM(cb) FROM h) AS nb
        FROM h),
    d AS (
        SELECT dollar, abs(cum_a * nb - cum_b * na) AS dev, na, nb
        FROM cum)
    SELECT CAST(na AS BIGINT) AS n_early, CAST(nb AS BIGINT) AS n_late,
           CAST(MAX(dev) * 10000 // (na * nb) AS BIGINT) AS ks_bp,
           CAST(MIN(CASE WHEN dev = (SELECT MAX(dev) FROM d) THEN dollar END)
               AS BIGINT) AS ks_at_dollar
    FROM d GROUP BY na, nb
    """


@_q("ks_value_drift", _SQL_KS_DRIFT)
def q_ks_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Kolmogorov–Smirnov drift statistic between the first and
    second half of the calendar (by distinct order days): KS = max
    |CDF_early − CDF_late| over order values, in bp, computed as the
    integer cross-product |cumA·nB − cumB·nA| over the bounded DOLLAR
    histogram — no float CDF ever exists, and the argmax dollar says
    WHERE the distributions diverge (`priority_mix_shift` tests
    categorical drift; KS is its continuous-value sibling, and the
    equi-depth bins of `equi_depth_bins` are the compressed form this
    statistic validates).

    Scale: era labels come from the calendar-bounded day-rank table
    (broadcast); the histogram is value-domain-bounded
    (`mad_price_outliers`' argument) so the CDF window sorts
    thousands of rows regardless of volume. int64: cum·n caps at
    ~9e12 per side at sf1 ×10⁴ amplification — comfortable; beyond,
    pre-divide both counts.
    """
    o = _t(spark, sf_dir, "orders").select(
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day"),
        F.floor("o_totalprice").cast("long").alias("dollar"),
    )
    days = o.select("day").distinct()
    nd = days.agg(F.count(F.lit(1)).cast("long").alias("nd"))
    days = days.crossJoin(F.broadcast(nd)).select(
        "day",
        "nd",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("rk"),
    )
    lab = o.join(F.broadcast(days), "day").select(
        "dollar",
        F.when(F.col("rk") * 2 <= F.col("nd"), F.lit(0))
        .otherwise(F.lit(1))
        .alias("era"),
    )
    h = lab.groupBy("dollar").agg(
        F.sum((F.col("era") == 0).cast("long")).cast("long").alias("ca"),
        F.sum((F.col("era") == 1).cast("long")).cast("long").alias("cb"),
    )
    tot = h.agg(
        F.sum("ca").cast("long").alias("na"), F.sum("cb").cast("long").alias("nb")
    )
    w = Window.orderBy("dollar").rowsBetween(Window.unboundedPreceding, 0)
    cum = h.crossJoin(F.broadcast(tot)).select(
        "dollar",
        "na",
        "nb",
        F.sum("ca").over(w).cast("long").alias("cum_a"),
        F.sum("cb").over(w).cast("long").alias("cum_b"),
    )
    d = cum.select(
        "dollar",
        "na",
        "nb",
        F.abs(F.col("cum_a") * F.col("nb") - F.col("cum_b") * F.col("na"))
        .cast("long")
        .alias("dev"),
    )
    mx = d.agg(F.max("dev").cast("long").alias("max_dev"))
    return (
        d.crossJoin(F.broadcast(mx))
        .groupBy("na", "nb", "max_dev")
        .agg(
            F.min(F.when(F.col("dev") == F.col("max_dev"), F.col("dollar")))
            .cast("long")
            .alias("ks_at_dollar")
        )
        .select(
            F.col("na").alias("n_early"),
            F.col("nb").alias("n_late"),
            F.expr("max_dev * 10000 div (na * nb)").cast("long").alias("ks_bp"),
            "ks_at_dollar",
        )
    )


# ---------------------------------------------------------------------------
# Cross-modality dedup agreement: text dup pairs vs embedding buckets
# ---------------------------------------------------------------------------
_DM_BITS = 12

_SQL_MODALITY_AGREE = f"""
    WITH d AS (
        SELECT doc_id,
               {_sql_hash64(f"array_to_string({_SQL_TOKENS}, ' ')")} AS fp
        FROM documents),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM d a JOIN d b ON a.fp = b.fp AND a.doc_id < b.doc_id),
    bkt AS (
        SELECT vec_id,
               CAST(list_sum(list_transform(generate_series(1, {_DM_BITS}),
                    i -> CASE WHEN embedding[i] > 0 THEN (1 << (i-1))
                         ELSE 0 END)) AS BIGINT) AS bucket
        FROM embeddings)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_dup_pairs,
           CAST(COALESCE(SUM(CASE WHEN ba.bucket = bb.bucket THEN 1 ELSE 0
               END), 0) AS BIGINT) AS n_bucket_agree,
           CAST(COALESCE(SUM(CASE WHEN ba.bucket = bb.bucket THEN 1 ELSE 0
               END), 0) * 10000 // GREATEST(COUNT(*), 1) AS BIGINT) AS agree_bp
    FROM pairs
    JOIN bkt ba ON pairs.id_a = ba.vec_id
    JOIN bkt bb ON pairs.id_b = bb.vec_id
    """


@_q("dedup_modality_agreement", _SQL_MODALITY_AGREE)
def q_dedup_modality_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-MODALITY dedup audit: of the exact-TEXT duplicate pairs
    (same normalized-token fingerprint), what share also collide in
    the 12-bit sign-LSH EMBEDDING bucket — the consistency check
    between the lexical dedup stack (`dedup_exact`) and the semantic
    one (`embedding_neardup`): low agreement means the embeddings
    don't even co-locate verbatim copies, so semantic dedup
    thresholds calibrated on them are untrustworthy (run this BEFORE
    trusting `ann_recall_eval`'s index on a new embedding version).
    Pairs ride the doc_id = vec_id contract.

    Scale: dup pairs expand within fingerprint groups only (bounded by
    group size — the oracle spells the fp self-join, the group sizes
    are `dedup_savings`' distribution); bucket lookups are two joins
    on the vector id key. Output is one row of integers.
    """
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", hash64(F.array_join(tokens(F.col("text")), " ")).alias("fp")
    )
    a = d.select(F.col("fp"), F.col("doc_id").alias("id_a"))
    b = d.select(F.col("fp"), F.col("doc_id").alias("id_b"))
    pairs = a.join(b, "fp").where(F.col("id_a") < F.col("id_b"))
    bkt = _t(spark, sf_dir, "embeddings").select(
        "vec_id", sign_lsh_bucket("embedding", n_bits=_DM_BITS).alias("bucket")
    )
    ba = bkt.select(F.col("vec_id").alias("id_a"), F.col("bucket").alias("b_a"))
    bb = bkt.select(F.col("vec_id").alias("id_b"), F.col("bucket").alias("b_b"))
    agree = (F.col("b_a") == F.col("b_b")).cast("long")
    return (
        pairs.join(ba, "id_a")
        .join(bb, "id_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dup_pairs"),
            F.coalesce(F.sum(agree), F.lit(0))
            .cast("long")
            .alias("n_bucket_agree"),
        )
        .select(
            "n_dup_pairs",
            "n_bucket_agree",
            F.expr("n_bucket_agree * 10000 div GREATEST(n_dup_pairs, 1)")
            .cast("long")
            .alias("agree_bp"),
        )
    )
