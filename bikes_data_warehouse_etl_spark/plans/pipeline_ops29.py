"""Round-4 batch 29: integer statistical estimators — OLS regression
slope, Gini concentration, and int8-quantization recall QA.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline. Signed integer division uses the sign-abs form
(pipeline_ops27 module docstring) wherever an operand can be negative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


def _sdiv_sql(num: str, den: str) -> str:
    """Truncation-toward-zero division, explicit on both engines."""
    return (
        f"CASE WHEN ({num}) < 0 THEN -((-({num})) // ({den}))"
        f" ELSE ({num}) // ({den}) END"
    )


def _sdiv_expr(num: str, den: str) -> str:
    return (
        f"CASE WHEN ({num}) < 0 THEN -((-({num})) div ({den}))"
        f" ELSE ({num}) div ({den}) END"
    )


# 128-bit-exact OLS slope over the canonical sufficient-sum aliases
# (n, sx, sy, sxy, sxx): the n·Σxy and n·Σxx PRODUCTS leave int64 at
# ~2.5e6 rows with bp-scale x (sf10 sweep caught this live in both
# `ols_discount_quantity` and `degree_assortativity`), so they are
# formed in DuckDB HUGEINT / Spark decimal(38,0) and only the
# milli-scale quotient returns to int64.
SLOPE128_SQL = _sdiv_sql(
    "CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy",
    "GREATEST((CAST(n AS HUGEINT) * sxx"
    " - CAST(sx AS HUGEINT) * sx) // 1000, 1)",
)
SLOPE128_EXPR = _sdiv_expr(
    "cast(n as decimal(38,0)) * sxy - cast(sx as decimal(38,0)) * sy",
    "GREATEST((cast(n as decimal(38,0)) * sxx"
    " - cast(sx as decimal(38,0)) * sx) div 1000, 1)",
)


# ---------------------------------------------------------------------------
# OLS: discount (bp) -> quantity slope per return flag
# ---------------------------------------------------------------------------
_SQL_OLS = f"""
    WITH xy AS (
        SELECT l_returnflag AS flag,
               CAST(ROUND(l_discount * 10000, 0) AS BIGINT) AS x,
               CAST(FLOOR(l_quantity) AS BIGINT) AS y
        FROM lineitem),
    s AS (
        SELECT flag, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM xy GROUP BY 1),
    est AS (
        SELECT flag, n,
               CAST({SLOPE128_SQL} AS BIGINT) AS slope_milli,
               sx, sy
        FROM s)
    SELECT flag, n AS n_rows, slope_milli,
           CAST({_sdiv_sql("sy * 1000 - slope_milli * sx", "n")} AS BIGINT)
               AS intercept_milli
    FROM est
    """


@_q("ols_discount_quantity", _SQL_OLS)
def q_ols_discount_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer OLS: the least-squares slope of quantity on discount
    (basis points) per return flag — "does a deeper discount move more
    units?" as a closed-form estimator, not a model fit. slope =
    (nΣxy−ΣxΣy)/(nΣxx−Σx²) evaluated with the denominator pre-scaled
    to milli (div-1000-then-divide, ≤0.1% quantization instead of any
    float); the intercept back-solves ȳ−slope·x̄ with the same integer
    discipline. Companion to `rank_corr_len_richness` (monotone
    association) — this one is the LINEAR effect size with units.

    Scale: one scan, one 5-long-wide map-side-combined aggregate per
    flag — the sufficient-statistics pattern: ANY OLS over 100 TB is
    these five sums, mergeable across shards like `incremental_agg_
    merge`. The five SUMS stay int64 (Σxx ≤ 1e6·rows — safe to ~9e12
    rows/flag); the slope's n·Σxx and n·Σxy PRODUCTS leave int64 at
    ~2.5e6 rows/flag (the sf10 sweep caught exactly this), so they
    are formed in 128-bit exact arithmetic — Spark decimal(38,0),
    DuckDB HUGEINT — and only the ≤milli-scale quotient returns to
    int64. Same ladder as `ols2_cramer` / `spearman_bp_from_ranks`.
    """
    xy = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_discount") * 10000, 0).cast("long").alias("x"),
        F.floor(F.col("l_quantity")).cast("long").alias("y"),
    )
    s = xy.groupBy("flag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    est = s.select(
        "flag",
        "n",
        F.expr(SLOPE128_EXPR).cast("long").alias("slope_milli"),
        "sx",
        "sy",
    )
    return est.select(
        "flag",
        F.col("n").alias("n_rows"),
        "slope_milli",
        F.expr(_sdiv_expr("sy * 1000 - slope_milli * sx", "n"))
        .cast("long")
        .alias("intercept_milli"),
    )


# ---------------------------------------------------------------------------
# Gini coefficient of customer revenue concentration
# ---------------------------------------------------------------------------
_SQL_GINI = f"""
    WITH cust AS (
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) // 1000
                   AS BIGINT) AS kc
        FROM orders GROUP BY 1),
    ranked AS (
        SELECT kc, CAST(ROW_NUMBER() OVER (ORDER BY kc, o_custkey) AS BIGINT)
                   AS i
        FROM cust),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(kc) AS BIGINT) AS total,
               CAST(SUM(i * kc) AS BIGINT) AS iy
        FROM ranked)
    SELECT n AS n_customers, total AS total_kilocents,
           CAST((2 * iy - (n + 1) * total)
                // GREATEST((n * total) // 10000, 1) AS BIGINT) AS gini_bp
    FROM s
    """


@_q("gini_customer_revenue", _SQL_GINI)
def q_gini_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GINI COEFFICIENT of revenue concentration across customers, in
    basis points — the single-number inequality measure behind
    `decile_lift`'s curve (G = (2Σi·yᵢ − (n+1)Σy) / (nΣy) over
    ascending-sorted values; ties ordered by custkey so both engines
    rank identically — the deterministic-tie variant of the textbook
    formula). Per-customer revenue is kilocents, the denominator is
    pre-scaled to bp — numerator stays under 4e16 at sf1 against the
    int64 ceiling.

    Scale: the per-customer rollup is the only fact-sized step
    (map-side combined on the customer key). The global ascending rank
    is the row-domain window to replace at extreme cardinality — the
    histogram form bins kc (Gini from a histogram is exact within bin
    granularity, `mad_price_outliers`' bounded-census trick) — but
    customer cardinality is dimension-sized here and for most real
    tenants.
    """
    cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.expr(
                "CAST(sum(CAST(round(o_totalprice * 100, 0) AS LONG)) div 1000"
                " AS LONG)"
            ).alias("kc")
        )
    )
    ranked = cust.select(
        "kc",
        F.row_number()
        .over(Window.orderBy("kc", "o_custkey"))
        .cast("long")
        .alias("i"),
    )
    s = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("kc").cast("long").alias("total"),
        F.sum(F.col("i") * F.col("kc")).cast("long").alias("iy"),
    )
    return s.select(
        F.col("n").alias("n_customers"),
        F.col("total").alias("total_kilocents"),
        F.expr(
            "CAST((2 * iy - (n + 1) * total)"
            " div GREATEST((n * total) div 10000, 1) AS LONG)"
        ).alias("gini_bp"),
    )


# ---------------------------------------------------------------------------
# int8 quantization recall: does the int8 index rank like the float one?
# ---------------------------------------------------------------------------
_QR_NQ = 8
_QR_K = 10

_SQL_Q8 = "GREATEST(LEAST(CAST(FLOOR(CAST({v} AS DOUBLE) * 127) AS BIGINT), 127), -127)"

_SQL_QUANT_RECALL = f"""
    WITH qs AS (
        SELECT vec_id AS qid, embedding AS qemb
        FROM embeddings WHERE vec_id < {_QR_NQ}),
    pairs AS (
        SELECT qs.qid, e.vec_id,
               CAST(list_sum(list_transform(list_zip(e.embedding, qs.qemb),
                    p -> CAST(FLOOR(CAST(p[1] AS DOUBLE) * 1000000) AS BIGINT)
                       * CAST(FLOOR(CAST(p[2] AS DOUBLE) * 1000000) AS BIGINT)))
                   AS BIGINT) AS ip_micro,
               CAST(list_sum(list_transform(list_zip(e.embedding, qs.qemb),
                    p -> {_SQL_Q8.format(v='p[1]')} * {_SQL_Q8.format(v='p[2]')}))
                   AS BIGINT) AS ip_q8
        FROM embeddings e, qs WHERE e.vec_id <> qs.qid),
    ex AS (
        SELECT qid, vec_id FROM (
            SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
                   ORDER BY ip_micro DESC, vec_id) AS rn FROM pairs)
        WHERE rn <= {_QR_K}),
    qq AS (
        SELECT qid, vec_id FROM (
            SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
                   ORDER BY ip_q8 DESC, vec_id) AS rn FROM pairs)
        WHERE rn <= {_QR_K})
    SELECT ex.qid,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(SUM(CASE WHEN qq.vec_id IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_hit,
           CAST(SUM(CASE WHEN qq.vec_id IS NOT NULL THEN 1 ELSE 0 END)
               * 10000 // COUNT(*) AS BIGINT) AS recall_bp
    FROM ex LEFT JOIN qq ON ex.qid = qq.qid AND ex.vec_id = qq.vec_id
    GROUP BY 1
    """


@_q("quantized_ann_recall", _SQL_QUANT_RECALL)
def q_quantized_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INT8 QUANTIZATION recall QA: top-10 overlap between the
    full-precision inner-product ranking (integer micros) and the
    ranking under symmetric int8 quantization (floor(x·127) clamped to
    ±127) for 8 sample queries — `embedding_quant_error` measures
    reconstruction error; this measures what serving actually cares
    about, RANK preservation, before an int8 index ships. Both ranking
    keys are integers, so the comparison is bit-exact cross-engine
    with no rounded-float contract at all.

    Scale: identical harness shape to `ann_recall_eval` — the 8-query
    sample broadcasts and rides ONE scan computing both ranking keys
    from the same zip (the quantized key costs nothing extra);
    per-query top-10s are sample-partitioned windows; the overlap join
    touches 80 rows. The int8 key is the one a production index stores
    — 4x less memory bandwidth, SIMD dot products — and this query is
    the gate on that swap.
    """
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < _QR_NQ).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qemb")
    )

    def micro(c):
        return F.floor(c.cast("double") * 1000000).cast("long")

    def q8(c):
        return F.greatest(
            F.least(
                F.floor(c.cast("double") * 127).cast("long"), F.lit(127).cast("long")
            ),
            F.lit(-127).cast("long"),
        )

    pairs = (
        emb.crossJoin(F.broadcast(qs))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.aggregate(
                F.zip_with(
                    F.col("embedding"), F.col("qemb"), lambda a, b: micro(a) * micro(b)
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("ip_micro"),
            F.aggregate(
                F.zip_with(
                    F.col("embedding"), F.col("qemb"), lambda a, b: q8(a) * q8(b)
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("ip_q8"),
        )
    )
    w_ex = Window.partitionBy("qid").orderBy(F.col("ip_micro").desc(), "vec_id")
    w_q8 = Window.partitionBy("qid").orderBy(F.col("ip_q8").desc(), "vec_id")
    ex = (
        pairs.withColumn("rn", F.row_number().over(w_ex))
        .where(F.col("rn") <= _QR_K)
        .select("qid", "vec_id")
    )
    qq = (
        pairs.withColumn("rn", F.row_number().over(w_q8))
        .where(F.col("rn") <= _QR_K)
        .select(F.col("qid").alias("q_qid"), F.col("vec_id").alias("q_vid"))
    )
    hit = (F.col("q_vid").isNotNull()).cast("long")
    return (
        ex.join(
            qq,
            (F.col("qid") == F.col("q_qid")) & (F.col("vec_id") == F.col("q_vid")),
            "left",
        )
        .groupBy("qid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_exact"),
            F.sum(hit).cast("long").alias("n_hit"),
        )
        .select(
            "qid",
            "n_exact",
            "n_hit",
            F.expr("n_hit * 10000 div n_exact").cast("long").alias("recall_bp"),
        )
    )
