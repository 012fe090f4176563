"""Round-4 batch 56: empirical-Bayes shrinkage of per-nation means,
expected calibration error of a rate-based probability rule, and
Herfindahl–Hirschman supplier concentration per brand.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.plans.pipeline_ops29 import (
    _sdiv_expr,
    _sdiv_sql,
)
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Empirical-Bayes shrinkage of per-nation mean order values
# ---------------------------------------------------------------------------
_SQL_EB = f"""
    WITH per_nation AS (
        SELECT cn.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice, 0) AS BIGINT) // 1000)
                   AS BIGINT) AS s,
               CAST(SUM((CAST(ROUND(o_totalprice, 0) AS BIGINT) // 1000)
                        * (CAST(ROUND(o_totalprice, 0) AS BIGINT) // 1000))
                   AS BIGINT) AS ss
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        GROUP BY 1),
    g AS (
        SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(s) AS BIGINT) AS ts,
               CAST(SUM(ss) AS BIGINT) AS tss,
               CAST(COUNT(*) AS BIGINT) AS m
        FROM per_nation),
    kparam AS (
        SELECT tn, ts,
               -- within-variance / between-variance of group means,
               -- both in hectodollar^2, floored; k >= 1
               GREATEST(CAST({_sdiv_sql(
                   "(CAST(tn AS HUGEINT) * tss - CAST(ts AS HUGEINT) * ts)",
                   "CAST(tn AS HUGEINT) * tn")} AS BIGINT), 1) AS wv,
               GREATEST((SELECT {_sdiv_sql(
                   "SUM(n * (" + _sdiv_sql("s * 100", "n")
                   + " - " + _sdiv_sql("(SELECT ts FROM g) * 100",
                                       "(SELECT tn FROM g)") + ")"
                   + " * (" + _sdiv_sql("s * 100", "n")
                   + " - " + _sdiv_sql("(SELECT ts FROM g) * 100",
                                       "(SELECT tn FROM g)") + "))",
                   "SUM(n) * 10000")}
                   FROM per_nation), 1) AS bv
        FROM g)
    SELECT p.nation, p.n AS n_orders,
           CAST({_sdiv_sql("p.s * 1000", "p.n")} AS BIGINT)
               AS raw_mean_milli_kd,
           CAST({_sdiv_sql("k.ts * 1000", "k.tn")} AS BIGINT)
               AS grand_mean_milli_kd,
           CAST({_sdiv_sql(
               "(p.s * 1000 + (k.wv // k.bv) * (" + _sdiv_sql(
                   "k.ts * 1000", "k.tn") + "))",
               "(p.n + k.wv // k.bv)")} AS BIGINT)
               AS shrunk_mean_milli_kd,
           CAST(k.wv // k.bv AS BIGINT) AS k_pseudo_n
    FROM per_nation p, kparam k
    """


@_q("eb_shrunk_nation_means", _SQL_EB)
def q_eb_shrunk_nation_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMPIRICAL-BAYES SHRINKAGE: each nation's mean order value
    pulled toward the grand mean with a data-estimated pseudo-count
    k = within-variance / between-group-variance (the method-of-
    moments normal-normal prior), so small nations shrink hard and
    big nations barely move — the hierarchical-model answer to "rank
    segments without crowning a lucky small one", and the estimator
    behind every 'adjusted' leaderboard. `jackknife_nation_influence`
    measures how much a segment DISTORTS the pooled mean; this
    borrows pooled strength to STABILIZE the segment means. Units:
    milli-kilodollars; the within-variance tn·Σy² − (Σy)² product
    left int64 at sf10's order volume (sweep-caught) and is formed
    128-bit — HUGEINT / decimal(38,0) — with the floored
    hectodollar² wv back in int64.

    Scale: per-nation (n, Σy, Σy²) from one pass; k is 1-row
    arithmetic over those sums (between-variance reuses the same
    census, n-weighted); the shrunk means are a row-local blend.
    The hierarchy generalizes by nesting the same sums per level.
    """
    y = "CAST(ROUND(o_totalprice, 0) AS BIGINT) div 1000"
    per_nation = (
        _t(spark, sf_dir, "orders")
        .join(
            _t(spark, sf_dir, "customer").select(
                    "c_custkey", "c_nationkey"
                ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").select(
                    "n_nationkey", F.col("n_name").alias("nation")
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .selectExpr("nation", f"{y} AS y")
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("s"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("ss"),
        )
    )
    g = per_nation.agg(
        F.sum("n").cast("long").alias("tn"),
        F.sum("s").cast("long").alias("ts"),
        F.sum("ss").cast("long").alias("tss"),
    )
    pg = per_nation.crossJoin(F.broadcast(g))
    bv = pg.agg(
        F.expr(
            "GREATEST("
            + _sdiv_sql(
                "SUM(n * ("
                + _sdiv_sql("s * 100", "n")
                + " - "
                + _sdiv_sql("ts * 100", "tn")
                + ") * ("
                + _sdiv_sql("s * 100", "n")
                + " - "
                + _sdiv_sql("ts * 100", "tn")
                + "))",
                "SUM(n) * 10000",
            ).replace("//", "div")
            + ", 1)"
        ).alias("bv")
    )
    kparam = (
        g.crossJoin(F.broadcast(bv))
        .selectExpr(
            "tn",
            "ts",
            "GREATEST(CAST("
            + _sdiv_expr(
                "(cast(tn as decimal(38,0)) * tss"
                " - cast(ts as decimal(38,0)) * ts)",
                "cast(tn as decimal(38,0)) * tn",
            )
            + " AS BIGINT), 1) AS wv",
            "bv",
        )
        .selectExpr("tn", "ts", "wv div bv AS k")
    )
    return pg.select("nation", "n", "s").crossJoin(
        F.broadcast(kparam)
    ).selectExpr(
        "nation",
        "n AS n_orders",
        "CAST(" + _sdiv_expr("s * 1000", "n") + " AS BIGINT)"
        " AS raw_mean_milli_kd",
        "CAST(" + _sdiv_expr("ts * 1000", "tn") + " AS BIGINT)"
        " AS grand_mean_milli_kd",
        "CAST("
        + _sdiv_expr(
            "(s * 1000 + k * (" + _sdiv_expr("ts * 1000", "tn") + "))",
            "(n + k)",
        )
        + " AS BIGINT) AS shrunk_mean_milli_kd",
        "CAST(k AS BIGINT) AS k_pseudo_n",
    )


# ---------------------------------------------------------------------------
# Expected calibration error of a rate-based probability rule
# ---------------------------------------------------------------------------
_SQL_ECE = """
    WITH scored AS (
        SELECT l.l_returnflag = 'R' AS y,
               p.p_brand AS brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    conf AS (
        SELECT brand,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS r
        FROM scored GROUP BY 1),
    binned AS (
        SELECT CAST(r * 20 // n AS BIGINT) AS bin,
               CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(r) AS BIGINT) AS r,
               CAST(SUM(r * 10000 // n * n) AS BIGINT) AS conf_wsum
        FROM conf GROUP BY 1),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tn FROM binned)
    SELECT CAST(SUM(n * abs(conf_wsum // n - r * 10000 // n)) // MAX(tot.tn)
               AS BIGINT) AS ece_bp,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(MAX(tot.tn) AS BIGINT) AS n_lines
    FROM binned, tot
    """


@_q("ece_calibration", _SQL_ECE)
def q_ece_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPECTED CALIBRATION ERROR of the per-brand return-rate rule
    ("predict each line returns with its brand's historical rate"):
    predictions grouped into rate bins, ECE = Σ n_b·|confidence_b −
    accuracy_b| / N in basis points — near zero HERE by construction
    (in-sample rates are calibrated), which makes this query the
    harness whose value appears under drift: score yesterday's rates
    against today's outcomes and ECE reports exactly how stale the
    rule is. Completes the eval family: `classifier_eval_churn`
    grades decisions, `ndcg_bits_eval` rankings, this PROBABILITIES
    — and isotonic recalibration (`isotonic_calibration`) is the
    repair whose success this metric certifies.

    Scale: one joined pass to the ≤25-brand confidence census; bins
    and the ECE sum are arithmetic over that census. Per-period ECE
    adds the period key to both group-bys.
    """
    scored = (
        _t(spark, sf_dir, "lineitem")
        .join(
            _t(spark, sf_dir, "part").select("p_partkey", "p_brand"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            (F.col("l_returnflag") == "R").alias("y"),
            F.col("p_brand").alias("brand"),
        )
    )
    conf = scored.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("y").cast("long")).cast("long").alias("r"),
    )
    binned = conf.groupBy(
        F.expr("CAST(r * 20 div n AS BIGINT)").alias("bin")
    ).agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("r").cast("long").alias("r"),
        F.sum(F.expr("r * 10000 div n * n")).cast("long").alias(
            "conf_wsum"
        ),
    )
    tot = binned.agg(F.sum("n").cast("long").alias("tn"))
    return binned.crossJoin(F.broadcast(tot)).agg(
        F.expr(
            "CAST(SUM(n * abs(conf_wsum div n - r * 10000 div n))"
            " div MAX(tn) AS BIGINT)"
        ).alias("ece_bp"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.max("tn").cast("long").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman supplier concentration per brand
# ---------------------------------------------------------------------------
_SQL_HHI = """
    WITH vol AS (
        SELECT p.p_brand AS brand, l.l_suppkey AS sk,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2),
    tot AS (
        SELECT brand, CAST(SUM(q) AS BIGINT) AS tq,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers
        FROM vol GROUP BY 1)
    SELECT v.brand AS p_brand, t.n_suppliers,
           CAST(SUM((v.q * 10000 // t.tq) * (v.q * 10000 // t.tq))
                // 10000 AS BIGINT) AS hhi_bp,
           CAST(10000 // t.n_suppliers AS BIGINT) AS uniform_floor_bp
    FROM vol v JOIN tot t ON v.brand = t.brand
    GROUP BY 1, 2, t.tq
    """


@_q("hhi_supplier_concentration", _SQL_HHI)
def q_hhi_supplier_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """HERFINDAHL–HIRSCHMAN INDEX of supplier concentration within
    each brand's shipped volume — Σ (share_bp)²/10⁴, the antitrust
    measure whose floor 10⁴/n (uniform split) ships alongside as the
    reference line: hhi_bp near the floor means a healthy multi-
    source brand, near 10⁴ means a single-supplier dependency the
    procurement risk register should know about. The market-structure
    member of the concentration family — `gini_customer_revenue`
    measures inequality of a POPULATION, HHI dependency on a few
    COUNTERPARTIES, `pareto_suppliers` the 80/20 cut.

    Scale: one joined pass to (brand, supplier) volume cells —
    map-side combined on a bounded composite key — then a brand-keyed
    share rollup. Basis-point shares make HHI integer-exact with a
    single de-scale.
    """
    vol = (
        _t(spark, sf_dir, "lineitem")
        .join(
            _t(spark, sf_dir, "part").select("p_partkey", "p_brand"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.col("p_brand").alias("brand"), "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"))
    )
    tot = vol.groupBy("brand").agg(
        F.sum("q").cast("long").alias("tq"),
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
    )
    return (
        vol.join(tot, "brand")
        .groupBy(
            F.col("brand").alias("p_brand"), "n_suppliers", "tq"
        )
        .agg(
            F.expr(
                "CAST(SUM((q * 10000 div tq) * (q * 10000 div tq))"
                " div 10000 AS BIGINT)"
            ).alias("hhi_bp")
        )
        .selectExpr(
            "p_brand",
            "n_suppliers",
            "hhi_bp",
            "CAST(10000 div n_suppliers AS BIGINT) AS uniform_floor_bp",
        )
    )
