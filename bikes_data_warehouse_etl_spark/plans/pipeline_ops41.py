"""Round-4 batch 41: TPC-H Q8 market share, a qty-weighted median
unit price per brand, and positional term-proximity search over the
document corpus.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.text import tokens
from bikes_data_warehouse_etl_spark.plans.extensions import _SQL_TOKENS
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# TPC-H Q8: market share of one supplier nation in one region's market
# ---------------------------------------------------------------------------
_MS_REGION = "ASIA"
_MS_NATION = "NATION_2"
_MS_TYPE = "PROMO"

_SQL_MARKET_SHARE = f"""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                         AS BIGINT)) AS BIGINT) AS market_cents,
           CAST(SUM(CASE WHEN sn.n_name = '{_MS_NATION}'
                         THEN CAST(ROUND(l_extendedprice * (1 - l_discount)
                                         * 100, 0) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS nation_cents,
           CAST(SUM(CASE WHEN sn.n_name = '{_MS_NATION}'
                         THEN CAST(ROUND(l_extendedprice * (1 - l_discount)
                                         * 100, 0) AS BIGINT)
                         ELSE 0 END) * 10000
                // SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                            AS BIGINT)) AS BIGINT) AS share_bp
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey  = p_partkey AND p_type = '{_MS_TYPE}'
    JOIN supplier ON l_suppkey  = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region   ON cn.n_regionkey = r_regionkey AND r_name = '{_MS_REGION}'
    GROUP BY 1
    """


@_q("market_share_promo_asia", _SQL_MARKET_SHARE)
def q_market_share_promo_asia(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): within the {region} PROMO-part
    market — revenue where the BUYER sits in the region — the share
    supplied by {nation}'s suppliers, per order year, in basis points.
    The two-sided join graph (buyer side resolves customer→nation→
    region, seller side supplier→nation) is Q8's signature; the share
    is a conditional-sum ratio over one joined stream, the same
    single-pass shape as `promo_revenue_share`.

    Scale: part (filtered to one type) and the four dimension tables
    broadcast; the fact stream shuffles on orderkey then custkey only
    — two fact shuffles total, then a ≤|years| map-side-combined
    rollup. Catalyst pushes the p_type and r_name equality filters
    into the dimension scans, so the fact→part join already drops
    ~5/6 of lines before any wide exchange.
    """
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", cents.alias("cents")
    )
    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_type") == _MS_TYPE)
        .select("p_partkey")
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = (
        _t(spark, sf_dir, "region")
        .where(F.col("r_name") == _MS_REGION)
        .select("r_regionkey")
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cust_region = (
        c.join(
            F.broadcast(n.select("n_nationkey", "n_regionkey")),
            c.c_nationkey == F.col("n_nationkey"),
        )
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("c_custkey")
    )
    supp_nation = s.join(
        F.broadcast(n.select("n_nationkey", F.col("n_name").alias("s_nation"))),
        s.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "s_nation")
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cust_region, o.o_custkey == cust_region.c_custkey)
        .join(
            supp_nation,
            li.l_suppkey == supp_nation.s_suppkey,
        )
    )
    nat_cents = F.when(
        F.col("s_nation") == _MS_NATION, F.col("cents")
    ).otherwise(F.lit(0).cast("long"))
    return joined.groupBy("o_year").agg(
        F.sum("cents").cast("long").alias("market_cents"),
        F.sum(nat_cents).cast("long").alias("nation_cents"),
        F.expr(
            f"CAST(SUM(CASE WHEN s_nation = '{_MS_NATION}' THEN cents "
            "ELSE CAST(0 AS BIGINT) END) * 10000 div SUM(cents) AS BIGINT)"
        ).alias("share_bp"),
    )


# ---------------------------------------------------------------------------
# Qty-weighted median unit price per brand
# ---------------------------------------------------------------------------
_SQL_WMEDIAN = """
    WITH pc AS (
        SELECT p_brand,
               CAST(ROUND(l_extendedprice / l_quantity * 100, 0) AS BIGINT)
                   AS unit_cents,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_quantity > 0
        GROUP BY 1, 2),
    cum AS (
        SELECT p_brand, unit_cents, w,
               SUM(w) OVER (PARTITION BY p_brand ORDER BY unit_cents) AS cw,
               SUM(w) OVER (PARTITION BY p_brand) AS tw
        FROM pc)
    SELECT p_brand,
           CAST(MIN(unit_cents) AS BIGINT) AS wmedian_unit_cents,
           CAST(MIN(tw) AS BIGINT) AS total_qty
    FROM cum WHERE 2 * cw >= tw
    GROUP BY 1
    """


@_q("weighted_median_price", _SQL_WMEDIAN)
def q_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED MEDIAN: the quantity-weighted median unit price per
    part brand — the smallest unit price whose cumulative quantity
    reaches half the brand's total, i.e. the price at which half the
    UNITS (not half the line items) trade cheaper. Robust to the
    volume skew that defeats the plain median (`percentiles_by_segment`
    weights every line equally); the winsorized/MAD family's sibling
    for weighted populations.

    Scale: the stream collapses FIRST to (brand, unit_cents) cells
    with summed weights (map-side combine; the cell domain is brand ×
    observed-price, bounded and data-independent of row count), so the
    cumulative window runs over the collapsed histogram partitioned by
    brand — the same histogram-first discipline as `value_histogram` /
    `equi_depth_bins`. No global sort; everything keys on the ≤25-value
    brand domain.
    """
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 0)
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    pc = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select(
            "p_brand",
            F.round(
                F.col("l_extendedprice") / F.col("l_quantity") * 100, 0
            )
            .cast("long")
            .alias("unit_cents"),
            F.col("l_quantity").cast("long").alias("q"),
        )
        .groupBy("p_brand", "unit_cents")
        .agg(F.sum("q").cast("long").alias("w"))
    )
    wb = Window.partitionBy("p_brand")
    cum = pc.select(
        "p_brand",
        "unit_cents",
        "w",
        F.sum("w").over(wb.orderBy("unit_cents")).alias("cw"),
        F.sum("w").over(wb).alias("tw"),
    )
    return (
        cum.where(2 * F.col("cw") >= F.col("tw"))
        .groupBy("p_brand")
        .agg(
            F.min("unit_cents").cast("long").alias("wmedian_unit_cents"),
            F.min("tw").cast("long").alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Positional term proximity over documents
# ---------------------------------------------------------------------------
_TP_A = "hash"
_TP_B = "join"
_TP_DIST = 3

_SQL_PROXIMITY = f"""
    WITH tok0 AS (
        SELECT doc_id, source, unnest({_SQL_TOKENS}) AS term,
               CAST(generate_subscripts({_SQL_TOKENS}, 1) AS BIGINT) AS pos
        FROM documents),
    tok AS (
        SELECT * FROM tok0 WHERE term IN ('{_TP_A}', '{_TP_B}')),
    per_doc AS (
        SELECT doc_id, source,
               list(pos) FILTER (WHERE term = '{_TP_A}') AS pa,
               list(pos) FILTER (WHERE term = '{_TP_B}') AS pb
        FROM tok GROUP BY 1, 2),
    scored AS (
        SELECT source,
               CASE WHEN len(pa) > 0 AND len(pb) > 0 THEN 1 ELSE 0 END
                   AS has_both,
               CASE WHEN len(pa) > 0 AND len(pb) > 0
                    AND list_min(flatten(list_transform(pa,
                        x -> list_transform(pb, y -> abs(x - y)))))
                        <= {_TP_DIST}
                    THEN 1 ELSE 0 END AS near
        FROM per_doc)
    SELECT source,
           CAST(SUM(has_both) AS BIGINT) AS n_docs_both,
           CAST(SUM(near) AS BIGINT) AS n_docs_near,
           CAST(SUM(near) * 10000 // GREATEST(SUM(has_both), 1) AS BIGINT)
               AS near_given_both_bp
    FROM scored GROUP BY 1
    """


@_q("term_proximity", _SQL_PROXIMITY)
def q_term_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROXIMITY SEARCH: per source, how many documents mention both
    '{a}' and '{b}', and in how many the closest occurrence pair sits
    within {d} token positions — the "terms NEAR each other" operator
    of retrieval engines, answered from a positional posting list.
    Phrase-level dedup (`boilerplate_shingles`) sees adjacency only;
    this measures bounded-window CO-OCCURRENCE, the signal used for
    query rewriting and entity-relation mining. Conditional share
    (near | both) normalizes away source size.

    Scale: positions come from one posexplode pass, filtered to the
    TWO probe terms before any shuffle (the posting list for two terms
    is a vanishing fraction of the token stream — predicate-first, the
    inverted-index access path); per-doc position lists are bounded by
    per-doc term frequency, and the min-distance lambda is row-local
    compute on those small arrays. One doc-keyed shuffle, one
    source-keyed rollup.
    """
    tok = (
        _t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.posexplode(tokens(F.col("text"))).alias("pos", "term"),
        )
        .where(F.col("term").isin(_TP_A, _TP_B))
        .select("doc_id", "source", "term", F.col("pos").cast("long").alias("pos"))
    )
    per_doc = tok.groupBy("doc_id", "source").agg(
        F.collect_list(F.when(F.col("term") == _TP_A, F.col("pos"))).alias("pa"),
        F.collect_list(F.when(F.col("term") == _TP_B, F.col("pos"))).alias("pb"),
    )
    both = (F.size("pa") > 0) & (F.size("pb") > 0)
    mindist = F.expr(
        "array_min(flatten(transform(pa, x -> transform(pb, y -> abs(x - y)))))"
    )
    scored = per_doc.select(
        "source",
        both.cast("long").alias("has_both"),
        (both & (mindist <= _TP_DIST)).cast("long").alias("near"),
    )
    return scored.groupBy("source").agg(
        F.sum("has_both").cast("long").alias("n_docs_both"),
        F.sum("near").cast("long").alias("n_docs_near"),
        F.expr(
            "CAST(SUM(near) * 10000 div GREATEST(SUM(has_both), 1) AS BIGINT)"
        ).alias("near_given_both_bp"),
    )
