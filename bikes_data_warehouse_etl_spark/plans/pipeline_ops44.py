"""Round-4 batch 44: bitmap-index set algebra (weekly activity
bitmaps + bitwise Jaccard), an nDCG retrieval-quality eval with exact
bit-length discounts over the BM25 ranker, and Brown double
exponential smoothing from two chained dyadic EWMAs.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.text import tokens
from bikes_data_warehouse_etl_spark.plans.pipeline_ops26 import (
    _BM25_TERMS,
    _bm25_scored,
    _sql_bm25_scored,
)
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Weekly activity bitmaps per nation + pairwise bitwise Jaccard
# ---------------------------------------------------------------------------
_SQL_BITSET = """
    WITH wk AS (
        SELECT cn.n_name AS nation,
               CAST((date_diff('day', DATE '2001-01-01', o_orderdate)) // 7
                   AS BIGINT) AS w
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE o_orderdate >= TIMESTAMP '2001-01-01'
          AND o_orderdate < TIMESTAMP '2002-01-01'
          AND l_returnflag = 'R'),
    bm AS (
        SELECT nation,
               CAST(bit_or(CAST(1 AS BIGINT) << CAST(w AS INTEGER))
                   AS BIGINT) AS bits
        FROM wk GROUP BY 1)
    SELECT a.nation AS nation_a, b.nation AS nation_b,
           CAST(bit_count(a.bits) AS BIGINT) AS weeks_a,
           CAST(bit_count(b.bits) AS BIGINT) AS weeks_b,
           CAST(bit_count(a.bits & b.bits) * 10000
                // GREATEST(bit_count(a.bits | b.bits), 1) AS BIGINT)
               AS jaccard_bp
    FROM bm a JOIN bm b ON a.nation < b.nation
    """


@_q("bitset_week_overlap", _SQL_BITSET)
def q_bitset_week_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITMAP-INDEX set algebra: each nation's 2001 return-activity
    compressed to one 53-bit week bitmap (bit w set iff the nation's
    customers returned ≥1 item in week w), then pairwise week-overlap
    Jaccard computed ENTIRELY in bitwise arithmetic — bit_count(a&b) /
    bit_count(a|b), no joins on the week domain at all. This is the
    roaring-bitmap/bitmap-index pattern OLAP engines use for segment
    overlap ("which audiences co-occur in time?"): a set becomes one
    integer, set ops become single ALU instructions. The
    `source_overlap_matrix` question answered 400× cheaper when the
    element domain fits machine words.

    Scale: one filtered fact pass to (nation, week) — map-side
    combined — then bit_or collapses each nation to ONE 8-byte value;
    the pairwise stage is a ≤25×25 broadcast self-join on single
    longs. For domains past 64 elements, chunk the bitmap by
    (element div 64) and bit_or per chunk — counts and intersections
    sum across chunks (exactly roaring's container scheme).
    """
    wk = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .join(
            _t(spark, sf_dir, "orders")
            .where(
                (F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("2002-01-01").cast("timestamp"))
            )
            .select(
                "o_orderkey",
                "o_custkey",
                (
                    F.datediff(
                        F.col("o_orderdate"),
                        F.lit("2001-01-01").cast("date"),
                    )
                    / 7
                )
                .cast("int")
                .alias("w"),
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
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
        .select("nation", "w")
    )
    bm = wk.groupBy("nation").agg(
        F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), w))").alias("bits")
    )
    a = bm.select(F.col("nation").alias("nation_a"), F.col("bits").alias("ba"))
    b = bm.select(F.col("nation").alias("nation_b"), F.col("bits").alias("bb"))
    return (
        a.join(F.broadcast(b), F.col("nation_a") < F.col("nation_b"))
        .selectExpr(
            "nation_a",
            "nation_b",
            "CAST(bit_count(ba) AS BIGINT) AS weeks_a",
            "CAST(bit_count(bb) AS BIGINT) AS weeks_b",
            "CAST(bit_count(ba & bb) * 10000"
            " div GREATEST(bit_count(ba | bb), 1) AS BIGINT) AS jaccard_bp",
        )
    )


# ---------------------------------------------------------------------------
# nDCG@10 with exact bit-length discounts over the BM25 ranker
# ---------------------------------------------------------------------------
_NDCG_K = 10


def _sql_ndcg() -> str:
    rel = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
    WITH {_sql_bm25_scored()},
    rel AS (
        SELECT doc_id, CAST({rel} AS BIGINT) AS rel FROM d),
    sys AS (
        SELECT r.rel,
               ROW_NUMBER() OVER (ORDER BY s.bm25_milli DESC, s.doc_id)
                   AS rk
        FROM s JOIN rel r ON s.doc_id = r.doc_id
        ORDER BY s.bm25_milli DESC, s.doc_id LIMIT {_NDCG_K}),
    ideal AS (
        SELECT rel, ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS rk
        FROM rel ORDER BY rel DESC, doc_id LIMIT {_NDCG_K}),
    dcg AS (
        SELECT CAST(SUM(rel * 1000 // LENGTH(BIN(rk + 1))) AS BIGINT)
            AS dcg_milli FROM sys),
    idcg AS (
        SELECT CAST(SUM(rel * 1000 // LENGTH(BIN(rk + 1))) AS BIGINT)
            AS idcg_milli FROM ideal)
    SELECT dcg_milli, idcg_milli,
           CAST(dcg_milli * 10000 // GREATEST(idcg_milli, 1) AS BIGINT)
               AS ndcg_bp
    FROM dcg, idcg
    """


@_q("ndcg_bits_eval", _sql_ndcg())
def q_ndcg_bits_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETRIEVAL EVAL: nDCG@10 of the `bm25_top_docs` ranking against
    a term-coverage relevance proxy (rel = number of distinct query
    terms the document contains, 0–3), with the rank discount
    1/log₂(rank+1) made integer-exact as 1000/bitlen(rank+1) — the
    eval-harness member of the retrieval family (`ann_recall_eval`
    grades the VECTOR side; this grades the LEXICAL side, and
    `hybrid_rrf_topk`'s fusion would be tuned against exactly this
    metric). nDCG in basis points: 10000 means BM25's top-10 is
    rel-optimal.

    Scale: scoring is `bm25_top_docs`' row-local kernel; BOTH the
    system and ideal top-10s are TakeOrderedAndProject heaps (no
    global sort materializes), and the rank window runs on the 10
    surviving rows. The eval is one broadcast-free scan plus two
    10-row reductions regardless of corpus size.
    """
    scored = _bm25_scored(spark, sf_dir)
    toks = tokens(F.col("text"))
    rel_col = None
    for t in _BM25_TERMS:
        term = F.lit(t)
        has = (
            F.size(F.filter(toks, lambda x: x == term)) > 0
        ).cast("long")
        rel_col = has if rel_col is None else rel_col + has
    rel = _t(spark, sf_dir, "documents").select(
        "doc_id", rel_col.alias("rel")
    )
    sys10 = (
        scored.join(rel, "doc_id")
        .orderBy(F.col("bm25_milli").desc(), "doc_id")
        .limit(_NDCG_K)
        .select(
            "rel",
            F.row_number()
            .over(Window.orderBy(F.col("bm25_milli").desc(), "doc_id"))
            .alias("rk"),
        )
    )
    ideal10 = (
        rel.orderBy(F.col("rel").desc(), "doc_id")
        .limit(_NDCG_K)
        .select(
            "rel",
            F.row_number()
            .over(Window.orderBy(F.col("rel").desc(), "doc_id"))
            .alias("rk"),
        )
    )
    dcg = sys10.agg(
        F.expr(
            "CAST(SUM(rel * 1000 div LENGTH(BIN(rk + 1))) AS BIGINT)"
        ).alias("dcg_milli")
    )
    idcg = ideal10.agg(
        F.expr(
            "CAST(SUM(rel * 1000 div LENGTH(BIN(rk + 1))) AS BIGINT)"
        ).alias("idcg_milli")
    )
    return dcg.crossJoin(F.broadcast(idcg)).selectExpr(
        "dcg_milli",
        "idcg_milli",
        "CAST(dcg_milli * 10000 div GREATEST(idcg_milli, 1) AS BIGINT)"
        " AS ndcg_bp",
    )


# ---------------------------------------------------------------------------
# Brown double exponential smoothing from two chained dyadic EWMAs
# ---------------------------------------------------------------------------
_DS_W = 16

_SQL_BROWN = f"""
    WITH rev AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS BIGINT) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS cents
        FROM orders GROUP BY 1),
    spine AS (
        SELECT CAST(UNNEST(generate_series(
                   (SELECT MIN(day) FROM rev),
                   (SELECT MAX(day) FROM rev))) AS BIGINT) AS day),
    c1 AS (
        SELECT r.day + t.i AS day,
               CAST(r.cents AS HUGEINT)
               * (CAST(1 AS BIGINT) << ({_DS_W} - 1 - t.i)) AS w
        FROM rev r, generate_series(0, {_DS_W} - 1) AS t(i)),
    s1 AS (
        SELECT s.day,
               CAST(COALESCE(SUM(c1.w), 0) * 1000
                    // ((CAST(1 AS BIGINT) << {_DS_W}) - 1) AS BIGINT)
                   AS s1_milli
        FROM spine s LEFT JOIN c1 ON c1.day = s.day
        GROUP BY 1),
    c2 AS (
        SELECT a.day + t.i AS day,
               CAST(a.s1_milli AS HUGEINT)
               * (CAST(1 AS BIGINT) << ({_DS_W} - 1 - t.i)) AS w
        FROM s1 a, generate_series(0, {_DS_W} - 1) AS t(i)),
    s2 AS (
        SELECT s.day,
               CAST(COALESCE(SUM(c2.w), 0)
                    // ((CAST(1 AS BIGINT) << {_DS_W}) - 1) AS BIGINT)
                   AS s2_milli
        FROM spine s LEFT JOIN c2 ON c2.day = s.day
        GROUP BY 1)
    SELECT s1.day AS day,
           CAST(2 * s1.s1_milli - s2.s2_milli AS BIGINT) AS level_milli,
           CAST(s1.s1_milli - s2.s2_milli AS BIGINT) AS trend_milli,
           CAST(3 * s1.s1_milli - 2 * s2.s2_milli AS BIGINT)
               AS forecast_milli
    FROM s1 JOIN s2 ON s1.day = s2.day
    """


@_q("brown_double_smoothing", _SQL_BROWN)
def q_brown_double_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BROWN'S DOUBLE EXPONENTIAL SMOOTHING, exactly: the dyadic EWMA
    (`ewma_revenue_dyadic`) applied TWICE — S₂ smooths S₁ — then
    level = 2S₁ − S₂, trend = S₁ − S₂ (α = ½ makes Brown's trend
    factor α/(1−α) equal 1), forecast = level + trend. Because both
    smoothing passes are integer fan-outs with power-of-two weights,
    the whole trend-following forecaster is engine-exact — no float
    enters at any point. The short-horizon local-trend complement of
    `theil_sen_trend` (global robust slope) and
    `conformal_forecast_band` (which would wrap THIS point forecast
    with its interval).

    Scale: two chained 16-wide contribution fan-outs over the daily
    census — each a calendar-keyed equi-join shuffle with map-side
    combine, no windows over fact rows; the second pass reads the
    first's ~2.4k-row output, so doubling the smoother costs nothing
    at fact scale. Quantization: S₁ truncates to milli-cents once,
    identically on both engines, before feeding S₂. The weighted
    contributions (daily cents × 2¹⁵, then milli-S₁ × 2¹⁵) left int64
    at sf10's daily revenue (sweep-caught), so contributions and
    their sums are 128-bit exact — HUGEINT / decimal(38,0) — and only
    the truncated milli-scale smoothed values return to int64.
    """
    o = _t(spark, sf_dir, "orders")
    rev = (
        o.select(
            F.datediff(
                F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("day"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c"),
        )
        .groupBy("day")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    bounds = rev.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day")
    )
    denom = f"(shiftleft(CAST(1 AS BIGINT), {_DS_W}) - 1)"

    def _smooth(src: DataFrame, val: str, scale: int, out: str) -> DataFrame:
        contrib = src.select(
            "day",
            F.col(val),
            F.explode(F.sequence(F.lit(0), F.lit(_DS_W - 1))).alias("i"),
        ).select(
            (F.col("day") + F.col("i")).alias("day"),
            (
                F.col(val).cast("decimal(38,0)")
                * F.expr(f"shiftleft(CAST(1 AS BIGINT), {_DS_W} - 1 - i)")
            ).alias("w"),
        )
        num = contrib.groupBy("day").agg(F.sum("w").alias("num"))
        return spine.join(num, "day", "left").select(
            "day",
            F.expr(
                f"CAST(COALESCE(num, 0) * {scale} div {denom} AS BIGINT)"
            ).alias(out),
        )

    s1 = _smooth(rev, "cents", 1000, "s1_milli")
    s2 = _smooth(s1, "s1_milli", 1, "s2_milli")
    return s1.join(s2, "day").selectExpr(
        "day",
        "CAST(2 * s1_milli - s2_milli AS BIGINT) AS level_milli",
        "CAST(s1_milli - s2_milli AS BIGINT) AS trend_milli",
        "CAST(3 * s1_milli - 2 * s2_milli AS BIGINT) AS forecast_milli",
    )
