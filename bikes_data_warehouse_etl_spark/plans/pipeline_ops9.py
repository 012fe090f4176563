"""Training-data pipeline operators, round 2 batch 9: sketch-pruned
exact heavy hitters (the candidate-pruning differential), integer-day
SLA percentiles via bounded histograms, a range-partition split
planner (how a 100 TB sort picks its boundaries), corpus novelty
attribution by source, and the two-role dimension join (TPC-H
Q7-style trade matrix).

Standing contract: integer cross-engine arithmetic, identical column
aliases on both sides, bounded key spaces before joined/windowed
steps, scale note per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.text import (
    hash64,
    tokens,
    word_shingles,
)
from bikes_data_warehouse_etl_spark.plans.extensions import (
    _SQL_SHINGLES,
    _SQL_TOKENS,
    _sql_hash64,
)
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Heavy hitters: bucket-sketch pruning, exact final counts
# ---------------------------------------------------------------------------
_SQL_HEAVY_HITTERS = f"""
    WITH tok AS (
        SELECT t AS term FROM (
            SELECT unnest({_SQL_TOKENS}) AS t FROM documents)
        WHERE t <> ''),
    tot AS (SELECT COUNT(*) AS t FROM tok)
    SELECT term, CAST(COUNT(*) AS BIGINT) AS n
    FROM tok
    GROUP BY term
    HAVING COUNT(*) >= (SELECT t // 512 FROM tot)
    """


@_q("heavy_hitter_tokens", _SQL_HEAVY_HITTERS)
def q_heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terms with frequency ≥ N/512, found WITHOUT aggregating the
    full vocabulary: pass 1 counts 8 192 hash buckets (fixed-width
    state regardless of vocabulary size); any term above threshold
    must sit in a bucket above threshold, so pass 2 exact-counts only
    tokens in surviving buckets. The oracle is the PLAIN exact
    GROUP BY term HAVING — the hash match certifies the sketch prune
    is lossless (bucket sum ≥ member count ⇒ superset, then the exact
    recount trims overshoot).

    Scale: a web-scale corpus has billions of term types — the naive
    plan shuffles all of them every run. Here pass 1's entire state is
    the 8 192-bucket count sketch — 64 KB on the driver REGARDLESS of
    data size (the same bounded-collect legitimacy class as the IVF
    centroid pull in operators/similarity.py), and pass 2's shuffle
    carries only tokens from heavy buckets (the bucket list broadcasts
    as a semi-join). Exactly two scans of the token stream — the
    textbook two-pass heavy-hitter shape. Output is ≤ 512 rows by
    pigeonhole.
    """
    d = _t(spark, sf_dir, "documents")
    # bucket hash is INTERNAL to the prune (any hash yields a superset
    # — bucket sum >= member count regardless of function), invisible
    # to the oracle, so use native xxhash64: the portable md5 hash64
    # here cost a full md5 pass over every token occurrence, twice
    tok = (
        d.select(F.explode(tokens(F.col("text"))).alias("term"))
        .filter(F.col("term") != "")
        .select("term", F.pmod(F.xxhash64("term"), F.lit(8192)).alias("b"))
    )
    sketch = tok.groupBy("b").agg(F.count(F.lit(1)).alias("bc")).collect()
    thr = sum(r.bc for r in sketch) // 512
    heavy = spark.createDataFrame(
        [(r.b,) for r in sketch if r.bc >= thr], "b long"
    )
    return (
        tok.join(F.broadcast(heavy), "b", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .where(F.col("n") >= F.lit(thr))
        .select("term", "n")
    )


# ---------------------------------------------------------------------------
# Fulfillment SLA: exact integer-day percentiles by priority
# ---------------------------------------------------------------------------
_SQL_SHIP_SLA = """
    WITH j AS (
        SELECT o_orderpriority AS prio,
               date_diff('day', o_orderdate, l_shipdate) AS d
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    h AS (SELECT prio, d, COUNT(*) AS n FROM j GROUP BY prio, d),
    hc AS (
        SELECT prio, d, n,
               SUM(n) OVER (PARTITION BY prio ORDER BY d
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
               SUM(n) OVER (PARTITION BY prio) AS tot
        FROM h)
    SELECT prio,
           CAST(MIN(CASE WHEN cum * 100 >= 50 * tot THEN d END) AS INT)
               AS p50_d,
           CAST(MIN(CASE WHEN cum * 100 >= 90 * tot THEN d END) AS INT)
               AS p90_d,
           CAST(MIN(CASE WHEN cum * 100 >= 99 * tot THEN d END) AS INT)
               AS p99_d,
           CAST(MAX(tot) AS BIGINT) AS n_ship
    FROM hc
    GROUP BY prio
    """


@_q("ship_sla_percentiles", _SQL_SHIP_SLA)
def q_ship_sla_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship delay p50/p90/p99 in whole days per order priority —
    the fulfillment-SLA report, computed as EXACT discrete percentiles
    (smallest d with cume ≥ q) rather than percentile_approx, because
    the delay domain is bounded (integer days, ~0-122).

    Scale: the fact-fact join shuffles once on orderkey; everything
    after runs on the (priority × delay-day) histogram — ≤ 5 × 123
    rows no matter how many line items exist, the same bounded-domain
    discipline as `winsorized_price_stats`. percentile_approx would
    shuffle sketch state per group for an *approximate* answer; the
    histogram gives the exact one cheaper.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("prio"),
        F.datediff("l_shipdate", "o_orderdate").alias("d"),
    )
    h = j.groupBy("prio", "d").agg(F.count(F.lit(1)).alias("n"))
    wcum = (
        Window.partitionBy("prio")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("prio")
    hc = h.select(
        "prio",
        "d",
        F.sum("n").over(wcum).alias("cum"),
        F.sum("n").over(wtot).alias("tot"),
    )

    def pct(q: int):
        return (
            F.min(F.when(F.col("cum") * 100 >= q * F.col("tot"), F.col("d")))
            .cast("int")
            .alias(f"p{q}_d")
        )

    return hc.groupBy("prio").agg(
        pct(50), pct(90), pct(99), F.max("tot").cast("long").alias("n_ship")
    )


# ---------------------------------------------------------------------------
# Range-partition split planner
# ---------------------------------------------------------------------------
_SQL_SPLIT_PLANNER = """
    WITH c AS (
        SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) // 100000 AS b
        FROM orders),
    h AS (SELECT b, COUNT(*) AS n FROM c GROUP BY b),
    hc AS (
        SELECT b, n,
               SUM(n) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
               SUM(n) OVER () AS tot
        FROM h)
    SELECT CAST(k.k AS INT) AS split_id,
           CAST((MIN(hc.b) + 1) * 100000 AS BIGINT) AS boundary_cents,
           CAST(ARG_MIN(hc.cum, hc.b) AS BIGINT) AS rows_le
    FROM generate_series(1, 15) AS k(k)
    JOIN hc ON hc.cum * 16 >= k.k * hc.tot
    GROUP BY k.k
    """


@_q("range_split_planner", _SQL_SPLIT_PLANNER)
def q_range_split_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-way range-partition boundaries for o_totalprice — the split
    points a 100 TB global sort / range-bucketed layout needs, chosen
    so each range holds ≈1/16 of the rows. Split k lands on the first
    $1 000 histogram bucket whose cumulative count crosses k·N/16;
    the report carries the boundary (in cents) and the exact row
    count at or below it.

    Scale: this is how you plan `repartitionByRange` WITHOUT sampling
    or sorting the data — one pass builds a value histogram whose
    size is bounded by the VALUE DOMAIN (~600 $1 000 buckets), not the
    row count; the cumulative window and the 15-target join run on
    those ~600 rows on one task. Compare Spark's own RangePartitioner,
    which reservoir-samples and can misplace boundaries under skew —
    the histogram's counts are exact.
    """
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    h = (
        o.select(cents.alias("cents"))
        .select(F.expr("cents div 100000").alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wcum = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    hc = h.select(
        "b",
        F.sum("n").over(wcum).alias("cum"),
        F.sum("n").over(Window.partitionBy()).alias("tot"),
    )
    targets = spark.range(1, 16).select(F.col("id").alias("k"))
    return (
        hc.join(
            F.broadcast(targets),
            F.col("cum") * 16 >= F.col("k") * F.col("tot"),
        )
        .groupBy("k")
        .agg(
            F.min("b").alias("min_b"),
            F.min_by("cum", "b").cast("long").alias("rows_le"),
        )
        .select(
            F.col("k").cast("int").alias("split_id"),
            ((F.col("min_b") + 1) * 100000).cast("long").alias(
                "boundary_cents"
            ),
            "rows_le",
        )
    )


# ---------------------------------------------------------------------------
# Corpus novelty attribution by source
# ---------------------------------------------------------------------------
_SQL_NOVELTY = f"""
    WITH sh AS (
        SELECT doc_id, source, {_sql_hash64('s')} AS h
        FROM (SELECT doc_id, source, unnest({_SQL_SHINGLES}) AS s
              FROM documents)),
    fst AS (SELECT h, arg_min(source, doc_id) AS source
            FROM sh GROUP BY h),
    nf AS (SELECT source, COUNT(*) AS n_first_types FROM fst
           GROUP BY source),
    oc AS (SELECT source, COUNT(*) AS n_occurrences FROM sh
           GROUP BY source)
    SELECT oc.source,
           CAST(oc.n_occurrences AS BIGINT) AS n_occurrences,
           CAST(COALESCE(nf.n_first_types, 0) AS BIGINT) AS n_first_types,
           CAST(COALESCE(nf.n_first_types, 0) * 1000000
                // oc.n_occurrences AS BIGINT) AS novelty_ppm
    FROM oc LEFT JOIN nf USING (source)
    """


@_q("shingle_novelty_by_source", _SQL_NOVELTY)
def q_shingle_novelty_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which sources actually add new content? Every 3-word shingle's
    FIRST occurrence (by doc_id order) is attributed to the source of
    that first document; a source's novelty is first-occurrence types
    per million shingle occurrences it contributes. Low novelty_ppm =
    the source mostly repeats what the corpus already has — the
    data-mixing signal behind deduplicated-corpus weighting.

    Scale: shingles reduce to 8-byte hashes before the shuffle
    (`hash64`, the dedup-family discipline); first-occurrence is ONE
    min_by aggregate on h — the exploded stream is never joined back
    to itself (the naive plan re-joins the h-level min to every
    occurrence). Two aggregates + a 2-source-row join; map-side
    combine collapses repeats within partitions.
    """
    d = _t(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        "source",
        F.explode(word_shingles(F.col("text"), 3)).alias("s"),
    ).select("doc_id", "source", hash64("s").alias("h"))
    fst = sh.groupBy("h").agg(F.min_by("source", "doc_id").alias("source"))
    nf = fst.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_first_types")
    )
    oc = sh.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    return (
        oc.join(nf, "source", "left")
        .select(
            "source",
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
            F.coalesce(F.col("n_first_types"), F.lit(0))
            .cast("long")
            .alias("n_first_types"),
            F.expr(
                "CAST(coalesce(n_first_types, 0) * 1000000 "
                "div n_occurrences AS LONG)"
            ).alias("novelty_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Two-role dimension join: nation→nation trade matrix (TPC-H Q7 shape)
# ---------------------------------------------------------------------------
_SQL_TRADE_MATRIX = """
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                         AS BIGINT)) AS BIGINT) AS rev_cents
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier s ON l_suppkey = s_suppkey
    JOIN nation nc ON c_nationkey = nc.n_nationkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    GROUP BY ns.n_name, nc.n_name
    """


@_q("nation_trade_matrix", _SQL_TRADE_MATRIX)
def q_nation_trade_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-nation × customer-nation revenue flows (the TPC-H Q7
    volume-shipping shape): the same dimension table joins the fact
    twice in DIFFERENT ROLES — once through the supplier leg, once
    through the customer leg — producing the ≤ 25×25 trade matrix.

    Scale: the only heavy edges are the two fact-side joins (lineitem
    ⋈ orders on orderkey, then ⋈ customer on custkey) — supplier and
    customer scale with the fact, so neither is hint-broadcast (AQE
    decides); nation is genuinely bounded and broadcasts in both
    roles (aliased, so the two copies are independent build sides).
    The final aggregate has 625 possible keys — partial combine
    collapses it map-side to nothing.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
        .cast("long")
        .alias("cents"),
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    nc = n.select(
        F.col("n_nationkey").alias("c_nk"),
        F.col("n_name").alias("cust_nation"),
    )
    ns = n.select(
        F.col("n_nationkey").alias("s_nk"),
        F.col("n_name").alias("supp_nation"),
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(nc), c.c_nationkey == nc.c_nk)
        .join(F.broadcast(ns), s.s_nationkey == ns.s_nk)
        .groupBy("supp_nation", "cust_nation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("cents").cast("long").alias("rev_cents"),
        )
    )
