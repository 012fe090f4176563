"""Round-4 batch 42: degree-damped link prediction (Adamic–Adar with
bit-length logs), a two-feature OLS solved exactly through
decimal128/HUGEINT Cramer arithmetic, and Flesch readability from
vowel-group syllable counting.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.text import tokens
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
# Adamic–Adar link prediction with bit-length degree damping
# ---------------------------------------------------------------------------
_AA_TOP = 25

_SQL_ADAMIC_ADAR = f"""
    WITH {sql_coorder_edge_ctes()},
    {sql_capped_adj_ctes()},
    wadj AS (
        SELECT adj.v, adj.u,
               CAST(1000 // LENGTH(BIN(deg.d + 1)) AS BIGINT) AS wc
        FROM adj JOIN deg ON adj.v = deg.v),
    wedge AS (
        SELECT x.u AS p, y.u AS q2,
               CAST(SUM(x.wc) AS BIGINT) AS aa_milli,
               CAST(COUNT(*) AS BIGINT) AS cn
        FROM wadj x JOIN wadj y ON x.v = y.v AND x.u < y.u
        GROUP BY 1, 2),
    nonedge AS (
        SELECT wedge.p, wedge.q2, wedge.aa_milli, wedge.cn
        FROM wedge LEFT JOIN e ON wedge.p = e.a AND wedge.q2 = e.b
        WHERE e.a IS NULL)
    SELECT p AS id_a, q2 AS id_b, aa_milli, cn AS common_neighbors
    FROM nonedge
    ORDER BY aa_milli DESC, p, q2 LIMIT {_AA_TOP}
    """


@_q("adamic_adar_topk", _SQL_ADAMIC_ADAR)
def q_adamic_adar_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADAMIC–ADAR link prediction: the top-25 non-adjacent supplier
    pairs scored by Σ 1/log₂(deg(v)+1) over their common co-order
    neighbors v, with the log as an exact integer BIT LENGTH
    (`zipf_slope_bits`' trick) so both engines agree bit-for-bit —
    the degree damping that separates "share two niche partners"
    (strong signal) from "both trade with the hub everyone trades
    with" (noise), which raw `link_prediction_cn` counts equally.

    Scale: identical wedge shape to `link_prediction_cn`, including
    its implemented mitigation — the wedge census runs over the
    64-neighbor DEGREE-CAPPED adjacency (deterministic hash rank,
    oracle capped identically), bounding the self-join at |V|·64²/2
    rows, and carries NO broadcast hints (adjacency and edge set are
    data-scale; AQE decides from runtime sizes). The damping weight
    uses the TRUE pre-cap degree and rides the capped adjacency rows
    as one column, so Adamic–Adar costs common-neighbors plus a
    node-scale degree join. Top-25 is a per-partition heap.
    """
    # eager checkpoint (e feeds adjacency legs + the anti join); the
    # degree cap + no-broadcast-hint notes on `link_prediction_cn`
    # apply verbatim. The damping weight uses the TRUE degree (from
    # the uncapped adjacency) so hub down-weighting stays exact; only
    # the wedge ENUMERATION is capped.
    e = co_order_edges(spark, sf_dir).localCheckpoint(eager=True)
    adj0 = symmetric_adjacency(e)
    deg = adj0.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("d"))
    adj = capped_adjacency(adj0)
    wadj = adj.join(deg, "v").select(
        "v",
        "u",
        F.expr("CAST(1000 div LENGTH(BIN(d + 1)) AS BIGINT)").alias("wc"),
    )
    x = wadj.select(F.col("v").alias("c"), F.col("u").alias("p"), F.col("wc"))
    y = wadj.select(F.col("v").alias("c"), F.col("u").alias("q2"))
    wedge = (
        x.join(y, "c")
        .where(F.col("p") < F.col("q2"))
        .groupBy("p", "q2")
        .agg(
            F.sum("wc").cast("long").alias("aa_milli"),
            F.count(F.lit(1)).cast("long").alias("cn"),
        )
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
            "aa_milli",
            F.col("cn").alias("common_neighbors"),
        )
        .orderBy(F.col("aa_milli").desc(), "id_a", "id_b")
        .limit(_AA_TOP)
    )


# ---------------------------------------------------------------------------
# Two-feature OLS via exact decimal128 / HUGEINT Cramer solve
# ---------------------------------------------------------------------------
_SQL_OLS2 = """
    WITH obs AS (
        SELECT CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS x1,
               CAST(l_quantity AS BIGINT) AS x2,
               CAST(ROUND(l_extendedprice * (1 - l_discount), 0)
                   AS BIGINT) AS y
        FROM lineitem),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x1 * x1) AS BIGINT) AS s11,
               CAST(SUM(x2 * x2) AS BIGINT) AS s22,
               CAST(SUM(x1 * x2) AS BIGINT) AS s12,
               CAST(SUM(x1 * y) AS BIGINT) AS s1y,
               CAST(SUM(x2 * y) AS BIGINT) AS s2y
        FROM obs),
    ab AS (
        SELECT n, s1, s2, sy,
               CAST(n AS HUGEINT) * s11 - CAST(s1 AS HUGEINT) * s1 AS a11,
               CAST(n AS HUGEINT) * s12 - CAST(s1 AS HUGEINT) * s2 AS a12,
               CAST(n AS HUGEINT) * s22 - CAST(s2 AS HUGEINT) * s2 AS a22,
               CAST(n AS HUGEINT) * s1y - CAST(s1 AS HUGEINT) * sy AS b1,
               CAST(n AS HUGEINT) * s2y - CAST(s2 AS HUGEINT) * sy AS b2
        FROM s),
    sol AS (
        SELECT n, s1, s2, sy,
               CAST(b1 * a22 - b2 * a12 AS DOUBLE)
                   / CAST(a11 * a22 - a12 * a12 AS DOUBLE) AS beta1,
               CAST(b2 * a11 - b1 * a12 AS DOUBLE)
                   / CAST(a11 * a22 - a12 * a12 AS DOUBLE) AS beta2
        FROM ab)
    SELECT n AS n_lines,
           ROUND(beta1, 2) AS beta_discount_pct,
           ROUND(beta2, 2) AS beta_quantity,
           ROUND((CAST(sy AS DOUBLE) - beta1 * CAST(s1 AS DOUBLE)
                  - beta2 * CAST(s2 AS DOUBLE)) / CAST(n AS DOUBLE), 2)
               AS intercept_dollars
    FROM sol
    """


@_q("ols2_cramer", _SQL_OLS2)
def q_ols2_cramer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-FEATURE OLS, exactly: line revenue (whole dollars) regressed
    on discount percent and quantity, the 2×2 normal equations solved
    by Cramer's rule where every centered sum (n·Sxx − Sx²) and both
    determinant products are computed in 128-BIT EXACT arithmetic —
    Spark decimal(38,0), DuckDB HUGEINT — because n·Σx2y alone
    overflows int64 at sf1 volumes. Only the FINAL ratio drops to
    double (both engines round the same exact 128-bit integers to the
    same IEEE double, then divide — bit-identical), rounded to cents.
    The multivariate upgrade of `ols_discount_quantity`, and the
    repo's demonstration that exact >64-bit arithmetic is an engine
    surface, not a spreadsheet afterthought.

    Scale: nine mergeable int64 sums in one map-side-combined pass —
    the sufficient-statistics shape that makes OLS embarrassingly
    mergeable at any scale; the 128-bit widening happens once, on the
    9-value driver-side-free single row. Adding features grows the
    Gram matrix O(k²) sums, never a second data pass.
    """
    obs = _t(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("x1"),
        F.col("l_quantity").cast("long").alias("x2"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 0)
        .cast("long")
        .alias("y"),
    )
    s = obs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x1").cast("long").alias("s1"),
        F.sum("x2").cast("long").alias("s2"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").alias("s22"),
        F.sum(F.col("x1") * F.col("x2")).cast("long").alias("s12"),
        F.sum(F.col("x1") * F.col("y")).cast("long").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("long").alias("s2y"),
    )
    dec = "DECIMAL(19,0)"
    ab = s.selectExpr(
        "n",
        "s1",
        "s2",
        "sy",
        f"CAST(n AS {dec}) * s11 - CAST(s1 AS {dec}) * s1 AS a11",
        f"CAST(n AS {dec}) * s12 - CAST(s1 AS {dec}) * s2 AS a12",
        f"CAST(n AS {dec}) * s22 - CAST(s2 AS {dec}) * s2 AS a22",
        f"CAST(n AS {dec}) * s1y - CAST(s1 AS {dec}) * sy AS b1",
        f"CAST(n AS {dec}) * s2y - CAST(s2 AS {dec}) * sy AS b2",
    )
    sol = ab.selectExpr(
        "n",
        "s1",
        "s2",
        "sy",
        "CAST(b1 * a22 - b2 * a12 AS DOUBLE)"
        " / CAST(a11 * a22 - a12 * a12 AS DOUBLE) AS beta1",
        "CAST(b2 * a11 - b1 * a12 AS DOUBLE)"
        " / CAST(a11 * a22 - a12 * a12 AS DOUBLE) AS beta2",
    )
    return sol.selectExpr(
        "n AS n_lines",
        "ROUND(beta1, 2) AS beta_discount_pct",
        "ROUND(beta2, 2) AS beta_quantity",
        "ROUND((CAST(sy AS DOUBLE) - beta1 * CAST(s1 AS DOUBLE)"
        " - beta2 * CAST(s2 AS DOUBLE)) / CAST(n AS DOUBLE), 2)"
        " AS intercept_dollars",
    )


# ---------------------------------------------------------------------------
# Flesch reading ease from vowel-group syllable counting
# ---------------------------------------------------------------------------
_SQL_FLESCH = f"""
    WITH per_doc AS (
        SELECT lang,
               GREATEST(len(list_filter({{toks}}, t -> t <> '')), 1) AS w,
               GREATEST(length(regexp_extract_all(text, '[.!?]+')), 1) AS se,
               length(regexp_extract_all(lower(text), '[aeiouy]+')) AS sy
        FROM documents),
    scored AS (
        SELECT lang,
               206835 - (1015 * w) // se - (84600 * sy) // w AS f_milli
        FROM per_doc)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST({_sdiv_sql("SUM(f_milli)", "COUNT(*)")} AS BIGINT)
               AS mean_flesch_milli,
           CAST(SUM(CASE WHEN f_milli < 30000 THEN 1 ELSE 0 END) * 10000
                // COUNT(*) AS BIGINT) AS hard_share_bp
    FROM scored GROUP BY 1
    """


def _flesch_sql() -> str:
    from bikes_data_warehouse_etl_spark.plans.extensions import _SQL_TOKENS

    return _SQL_FLESCH.replace("{toks}", _SQL_TOKENS)


@_q("flesch_readability", _flesch_sql())
def q_flesch_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLESCH READING EASE per language, with syllables approximated
    by VOWEL-GROUP runs ([aeiouy]+ — the classic fast proxy, ±1
    syllable on silent-e words) and sentences by terminal-punctuation
    runs, so the whole score is integer arithmetic both engines
    truncate identically: 206.835 − 1.015·(words/sentence) −
    84.6·(syllables/word), in milli-points. The readability axis the
    `lang_quality` / `repetition_score` curation gates don't cover:
    those measure NOISE, this measures linguistic DIFFICULTY (the
    hard_share_bp column counts documents under 30 points —
    "college-graduate" text — the band filtered for child-safe or
    simple-language training mixes).

    Scale: three row-local regexp passes per document (one scan, no
    UDF, no shuffle before the ≤|langs| rollup). The regexp classes
    are ASCII-safe so Java and RE2 agree; CJK text has no [aeiouy]
    runs and correctly reports near-zero syllables — the lang key
    keeps those rows from polluting Latin-script means.
    """
    d = _t(spark, sf_dir, "documents")
    w = F.greatest(
        F.size(F.filter(tokens(F.col("text")), lambda t: t != "")),
        F.lit(1),
    ).cast("long")
    se = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), F.lit(0))),
        F.lit(1),
    ).cast("long")
    sy = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[aeiouy]+"), F.lit(0))
    ).cast("long")
    scored = d.select(
        "lang",
        w.alias("w"),
        se.alias("se"),
        sy.alias("sy"),
    ).select(
        "lang",
        (
            F.lit(206835).cast("long")
            - F.expr("(1015 * w) div se")
            - F.expr("(84600 * sy) div w")
        ).alias("f_milli"),
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr(
            "CAST(" + _sdiv_expr("SUM(f_milli)", "COUNT(*)") + " AS BIGINT)"
        ).alias("mean_flesch_milli"),
        F.expr(
            "CAST(SUM(CASE WHEN f_milli < 30000 THEN 1 ELSE 0 END) * 10000"
            " div COUNT(*) AS BIGINT)"
        ).alias("hard_share_bp"),
    )
