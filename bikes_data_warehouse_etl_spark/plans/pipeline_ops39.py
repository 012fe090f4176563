"""Round-4 batch 39: corpus-law, population-estimation, and privacy
audits — a bit-length Zipf slope, Lincoln–Petersen capture-recapture,
and a k-anonymity census.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline. Signed division uses the sign-abs form (pipeline_ops27).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.text import tokens
from bikes_data_warehouse_etl_spark.plans.extensions import _SQL_TOKENS
from bikes_data_warehouse_etl_spark.plans.pipeline_ops29 import (
    _sdiv_expr,
    _sdiv_sql,
)
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Zipf slope: OLS over (bitlen rank, bitlen frequency)
# ---------------------------------------------------------------------------
_SQL_ZIPF = f"""
    WITH tok AS (
        SELECT unnest({_SQL_TOKENS}) AS term FROM documents),
    cf AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS n
        FROM tok WHERE term <> '' GROUP BY 1),
    ranked AS (
        SELECT CAST(LENGTH(BIN(ROW_NUMBER() OVER (ORDER BY n DESC, term)))
                   AS BIGINT) AS x,
               CAST(LENGTH(BIN(n)) AS BIGINT) AS y
        FROM cf),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM ranked)
    SELECT n AS n_terms,
           CAST({_sdiv_sql("n * sxy - sx * sy",
                           "GREATEST((n * sxx - sx * sx) // 1000, 1)")}
               AS BIGINT) AS zipf_slope_milli
    FROM s
    """


@_q("zipf_slope_bits", _SQL_ZIPF)
def q_zipf_slope_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIPF-LAW check: the OLS slope of log₂-frequency on log₂-rank
    over the term table, with both logs as exact integer BIT LENGTHS
    (`doc_surprisal_proxy`'s trick) and the slope from
    `ols_discount_quantity`'s sufficient sums — natural language sits
    near slope −1000 milli (Zipf exponent ≈ 1); a flat slope means
    template/generated text, a cliff means a truncated vocabulary.
    The corpus-law cousin of `hapax_by_source` and
    `vocab_coverage_curve`: same health question, distribution-shape
    answer. Bit-length quantization (±0.5 bit on each axis) perturbs
    the slope a few percent — fine for a health gate, documented for
    anyone expecting a fitted exponent.

    Scale: one token census (vocabulary-keyed, map-side combined);
    the rank window runs over the VOCABULARY, not the token stream —
    the one row-domain window here is vocab-sized, and the
    histogram-rank upgrade applies if a vocabulary ever rivals fact
    cardinality. Five mergeable sums finish it.
    """
    tok = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(tokens(F.col("text"))).alias("term"))
        .where(F.col("term") != "")
    )
    cf = tok.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("n"))
    ranked = cf.select(
        F.length(F.bin(F.row_number().over(Window.orderBy(F.col("n").desc(), "term"))))
        .cast("long")
        .alias("x"),
        F.length(F.bin(F.col("n"))).cast("long").alias("y"),
    )
    s = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    return s.select(
        F.col("n").alias("n_terms"),
        F.expr(
            "CAST("
            + _sdiv_expr(
                "n * sxy - sx * sy", "GREATEST((n * sxx - sx * sx) div 1000, 1)"
            )
            + " AS LONG)"
        ).alias("zipf_slope_milli"),
    )


# ---------------------------------------------------------------------------
# Capture-recapture: Lincoln–Petersen population estimate
# ---------------------------------------------------------------------------
_SQL_CAPTURE = """
    WITH o AS (
        SELECT o_custkey,
               CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS BIGINT) AS day
        FROM orders),
    days AS (
        SELECT day, ROW_NUMBER() OVER (ORDER BY day) AS rk,
               (SELECT COUNT(DISTINCT day) FROM o) AS nd
        FROM (SELECT DISTINCT day FROM o)),
    era AS (
        SELECT o.o_custkey,
               CASE WHEN days.rk * 2 <= days.nd THEN 0 ELSE 1 END AS e
        FROM o JOIN days ON o.day = days.day),
    sets AS (
        SELECT o_custkey,
               CAST(MAX(CASE WHEN e = 0 THEN 1 ELSE 0 END) AS BIGINT) AS in_a,
               CAST(MAX(CASE WHEN e = 1 THEN 1 ELSE 0 END) AS BIGINT) AS in_b
        FROM era GROUP BY 1),
    t AS (
        SELECT CAST(SUM(in_a) AS BIGINT) AS n1, CAST(SUM(in_b) AS BIGINT) AS n2,
               CAST(SUM(in_a * in_b) AS BIGINT) AS m,
               CAST(COUNT(*) AS BIGINT) AS actual
        FROM sets)
    SELECT n1 AS n_early, n2 AS n_late, m AS n_recaptured,
           CAST(n1 * n2 // GREATEST(m, 1) AS BIGINT) AS lp_estimate,
           actual AS n_actual_observed,
           CAST((n1 * n2 // GREATEST(m, 1)) * 10000
                // GREATEST(actual, 1) AS BIGINT) AS estimate_vs_observed_bp
    FROM t
    """


@_q("capture_recapture_customers", _SQL_CAPTURE)
def q_capture_recapture_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LINCOLN–PETERSEN capture-recapture: treat the two calendar
    halves as two observation windows of the customer population and
    estimate its TOTAL size as N̂ = n₁·n₂/m (m = customers seen in
    both) — the ecology estimator data teams reuse to answer "how many
    distinct users exist beyond the ones any single window sees"
    (`approx_distinct_parts` counts what WAS observed; this
    extrapolates what WASN'T, valid under equal-catchability — the
    comparison column against actually-observed distinct customers is
    the built-in sanity check: heavy-buyer bias pushes the estimate
    BELOW the observed count, itself a diagnostic).

    Scale: one fact scan to per-customer era flags (customer-keyed
    map-side-combined MAX), era labels from the broadcast
    calendar-rank table, four mergeable sums. Overflow-free: n₁·n₂ ≤
    customer-count², dimension-scale.
    """
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day"),
    )
    days = o.select("day").distinct()
    nd = days.agg(F.count(F.lit(1)).cast("long").alias("nd"))
    days = days.crossJoin(F.broadcast(nd)).select(
        "day",
        "nd",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("rk"),
    )
    era = o.join(F.broadcast(days), "day").select(
        "o_custkey",
        F.when(F.col("rk") * 2 <= F.col("nd"), F.lit(0)).otherwise(1).alias("e"),
    )
    sets = era.groupBy("o_custkey").agg(
        F.max((F.col("e") == 0).cast("long")).cast("long").alias("in_a"),
        F.max((F.col("e") == 1).cast("long")).cast("long").alias("in_b"),
    )
    t = sets.agg(
        F.sum("in_a").cast("long").alias("n1"),
        F.sum("in_b").cast("long").alias("n2"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("m"),
        F.count(F.lit(1)).cast("long").alias("actual"),
    )
    return t.select(
        F.col("n1").alias("n_early"),
        F.col("n2").alias("n_late"),
        F.col("m").alias("n_recaptured"),
        F.expr("n1 * n2 div GREATEST(m, 1)").cast("long").alias("lp_estimate"),
        F.col("actual").alias("n_actual_observed"),
        F.expr(
            "(n1 * n2 div GREATEST(m, 1)) * 10000 div GREATEST(actual, 1)"
        )
        .cast("long")
        .alias("estimate_vs_observed_bp"),
    )


# ---------------------------------------------------------------------------
# k-anonymity census over customer quasi-identifiers
# ---------------------------------------------------------------------------
_KA_K = 10

_SQL_K_ANON = f"""
    WITH g AS (
        SELECT c_mktsegment, c_nationkey, CAST(COUNT(*) AS BIGINT) AS k
        FROM customer GROUP BY 1, 2),
    t AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(MIN(k) AS BIGINT) AS min_k,
               CAST(SUM(k) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN k < {_KA_K} THEN k ELSE 0 END) AS BIGINT)
                   AS n_below
        FROM g)
    SELECT n_groups, min_k, n_rows,
           n_below AS n_rows_below_k,
           CAST(n_below * 10000 // n_rows AS BIGINT) AS below_k_bp
    FROM t
    """


@_q("k_anonymity_census", _SQL_K_ANON)
def q_k_anonymity_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ANONYMITY audit over the quasi-identifier pair (market
    segment, nation): the minimum equivalence-class size and the share
    of customers sitting in classes smaller than k=10 — the release
    gate a privacy review runs before sharing "anonymized" customer
    slices (a class of 1 re-identifies its member by the quasi-IDs
    alone; generalization/suppression shrinks below_k_bp to 0). The
    PII-surface sibling of `pii_scrub_stats`: that one scrubs
    identifiers INSIDE text, this one measures re-identification risk
    of the STRUCTURED columns that remain.

    Scale: one dimension scan, a quasi-ID-keyed map-side-combined
    census, a 1-row rollup — the audit costs one aggregate at any
    cardinality, and widening the quasi-ID set only widens the group
    key. l-diversity adds a COUNT(DISTINCT sensitive) per class to
    the same census.
    """
    g = (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    t = g.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("k").cast("long").alias("min_k"),
        F.sum("k").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("k") < _KA_K, F.col("k")).otherwise(0))
        .cast("long")
        .alias("n_below"),
    )
    return t.select(
        "n_groups",
        "min_k",
        "n_rows",
        F.col("n_below").alias("n_rows_below_k"),
        F.expr("n_below * 10000 div n_rows").cast("long").alias("below_k_bp"),
    )
