"""Training-data pipeline operators, round 2 batch 7: GROUPING SETS
(completing the rollup/cube family), session path mining, a
point-in-time SCD2 dimension join, co-occurrence (market-basket)
mining, and an approx-percentile sketch audit.

Standing contract: integer cross-engine arithmetic (cents / bp / ppm),
identical column aliases on both sides, bounded key spaces before any
joined or windowed step, and a scale note per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions import packing
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# GROUPING SETS: the explicit-set sibling of rollup/cube
# ---------------------------------------------------------------------------
_SQL_GROUPING_SETS = """
    SELECT COALESCE(n.n_name, 'ALL') AS nation,
           COALESCE(c.c_mktsegment, 'ALL') AS segment,
           CAST(GROUPING(n.n_name) AS BIGINT) AS g_nation,
           CAST(GROUPING(c.c_mktsegment) AS BIGINT) AS g_segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
               AS BIGINT) AS revenue_cents
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY GROUPING SETS ((n.n_name, c.c_mktsegment), (n.n_name), ())
    """


@_q("grouping_sets_revenue", _SQL_GROUPING_SETS)
def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue under explicit GROUPING SETS ((nation, segment),
    (nation), ()) — the third member of the multi-granularity family
    (`rollup_nation_segment` / `cube_status_priority` cover the other
    two). GROUPING() flags disambiguate a real 'ALL' value from an
    aggregated-out level, the standard cube-table contract.

    Scale: Spark expands grouping sets BEFORE the shuffle (the Expand
    operator multiplies rows map-side, then one hash aggregate with
    map-side combine runs over all levels at once) — one exchange
    regardless of how many sets are requested. Dimension joins
    broadcast; the fact shuffles once on the expanded grouping key.
    """
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    base = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select(
            "n_name",
            "c_mktsegment",
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
    )
    g = base.groupingSets(
        [["n_name", "c_mktsegment"], ["n_name"], []],
        "n_name",
        "c_mktsegment",
    ).agg(
        F.grouping("n_name").cast("long").alias("g_nation"),
        F.grouping("c_mktsegment").cast("long").alias("g_segment"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )
    return g.select(
        F.coalesce("n_name", F.lit("ALL")).alias("nation"),
        F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
        "g_nation",
        "g_segment",
        "n_orders",
        "revenue_cents",
    )


# ---------------------------------------------------------------------------
# Session path mining: top event trigrams within 30-minute sessions
# ---------------------------------------------------------------------------
_SQL_SESSION_PATHS = """
    WITH ev AS (
        SELECT user_id, event_id, event_type,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS es
        FROM events),
    g AS (
        SELECT *,
               CASE WHEN es - LAG(es) OVER w IS NULL
                         OR es - LAG(es) OVER w > 1800
                    THEN 1 ELSE 0 END AS new_s
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
    s AS (
        SELECT *,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY es, event_id
                                ROWS UNBOUNDED PRECEDING) AS sess
        FROM g),
    tri AS (
        SELECT LAG(event_type, 2) OVER w2 AS t1,
               LAG(event_type, 1) OVER w2 AS t2,
               event_type AS t3
        FROM s WINDOW w2 AS (PARTITION BY user_id, sess ORDER BY es, event_id))
    SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n_paths
    FROM tri WHERE t1 IS NOT NULL
    GROUP BY t1, t2, t3
    """


@_q("session_paths", _SQL_SESSION_PATHS)
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey mining: frequency of every 3-step event-type path
    inside gap-based sessions (30-min inactivity splits) — the
    "what do users do before purchasing" sequence table that feeds
    funnel design (pairs with `event_funnel` / `event_transition_matrix`,
    which are the 1- and 2-step views).

    Scale: the sessionize window and both LAG windows all cluster by
    user_id — hash partitioning on user_id satisfies the (user_id,
    sess) clustering requirement, so the whole chain runs on ONE
    exchange of fixed-width rows plus per-partition sorts. The final
    aggregate's key space is |event_types|³ ≤ 125, map-side combined
    to nothing. Ties broken by event_id so the path order is
    deterministic across engines and reruns.
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_timestamp("ts").cast("long").alias("es"),
    )
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    gap = F.col("es") - F.lag("es").over(w)
    g = ev.withColumn(
        "new_s", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    s = g.withColumn(
        "sess",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    w2 = Window.partitionBy("user_id", "sess").orderBy("es", "event_id")
    tri = s.select(
        F.lag("event_type", 2).over(w2).alias("t1"),
        F.lag("event_type", 1).over(w2).alias("t2"),
        F.col("event_type").alias("t3"),
    )
    return (
        tri.where(F.col("t1").isNotNull())
        .groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
    )


# ---------------------------------------------------------------------------
# Point-in-time SCD2 dimension join (temporal as-of correctness)
# ---------------------------------------------------------------------------
_PIT_SPLIT = "1998-07-01"

_SQL_PIT_JOIN = f"""
    WITH dim AS (
        SELECT c_custkey, c_mktsegment AS segment,
               TIMESTAMP '1992-01-01' AS eff_from,
               TIMESTAMP '{_PIT_SPLIT}' AS eff_to
        FROM customer
        UNION ALL
        SELECT c_custkey,
               CASE WHEN c_custkey % 3 = 0 THEN 'MOVED'
                    ELSE c_mktsegment END AS segment,
               TIMESTAMP '{_PIT_SPLIT}' AS eff_from,
               TIMESTAMP '9999-12-31' AS eff_to
        FROM customer)
    SELECT o.o_orderkey, o.o_custkey, d.segment AS segment_at_order
    FROM orders o
    JOIN dim d ON o.o_custkey = d.c_custkey
              AND o.o_orderdate >= d.eff_from
              AND o.o_orderdate < d.eff_to
    """


@_q("pit_dim_join", _SQL_PIT_JOIN)
def q_pit_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct dimension join: each order picks the SCD2
    dimension version whose [eff_from, eff_to) validity interval
    contains the order date — the temporal-join semantics that make
    SCD2 history (operators/merge.py scd2_merge, ref LoadBikesDW.py's
    Prdct_Dim versioning) actually *queryable*. A synthetic two-version
    customer dim (segment change at 1998-07-01 for custkey % 3 = 0)
    keeps the oracle deterministic.

    Scale: the dim is dimension-sized (versions × customers), so the
    interval predicate rides a broadcast hash join on custkey — the
    fact never shuffles and never expands (validity intervals are
    disjoint per key, so exactly one version matches). If the dim
    outgrows broadcast, the same plan shuffles both sides on custkey
    and the interval filter stays a post-join predicate — never a
    range-only join.
    """
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    v1 = c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("1992-01-01").cast("timestamp").alias("eff_from"),
        F.lit(_PIT_SPLIT).cast("timestamp").alias("eff_to"),
    )
    v2 = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 3 == 0, "MOVED")
        .otherwise(F.col("c_mktsegment"))
        .alias("segment"),
        F.lit(_PIT_SPLIT).cast("timestamp").alias("eff_from"),
        F.lit("9999-12-31").cast("timestamp").alias("eff_to"),
    )
    dim = v1.unionByName(v2)
    return o.join(
        dim,
        (o["o_custkey"] == dim["c_custkey"])
        & (o["o_orderdate"] >= dim["eff_from"])
        & (o["o_orderdate"] < dim["eff_to"]),
    ).select(
        "o_orderkey", "o_custkey", F.col("segment").alias("segment_at_order")
    )


# ---------------------------------------------------------------------------
# Co-purchase pairs: bounded-fanout market-basket co-occurrence
# ---------------------------------------------------------------------------
_SQL_COPURCHASE = """
    WITH lp AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS support
    FROM lp a JOIN lp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
    HAVING COUNT(*) >= 2
    """


@_q("copurchase_pairs", _SQL_COPURCHASE)
def q_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent co-occurrence mining: part pairs bought together in ≥2
    orders (the support-counting core of market-basket / association
    rules, and the same shape as co-citation or token co-occurrence
    mining on document data).

    Scale: pairs are generated ROW-LOCALLY from per-order part baskets
    (the `co_order_edges` pattern — one collect_set shuffle on the
    order key, fan-out ≤ C(items_per_order, 2) ≈ 21 for a 7-item
    order, never corpus-quadratic; the set dedups repeat parts inside
    the aggregate). The round-4 formulation (distinct projection +
    self-join on the order key) paid the distinct shuffle AND a
    sort-merge join that re-materialized every basket² row through the
    join operator; the basket build pays one shuffle and emits the a<b
    half directly. The pair aggregate — the widest exchange here —
    shuffles ONE packed long per pair (partkeys are 32-bit in this
    schema, bounded like the suppkeys in `co_order_edges`; same
    filter-then-transform allocation saving), unpacked by two bit ops
    after the HAVING has pruned the singleton long tail.
    """
    baskets = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.collect_set("l_partkey").alias("parts"))
        .where(F.size("parts") >= 2)
    )
    return (
        baskets.select(packing.explode_packed_pairs("parts"))
        .groupBy("ab")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .where(F.col("support") >= 2)
        .select(
            packing.unpack_hi("ab").alias("part_a"),
            packing.unpack_lo("ab").alias("part_b"),
            "support",
        )
    )


# ---------------------------------------------------------------------------
# Approx-percentile sketch audit (pairs with minhash_accuracy)
# ---------------------------------------------------------------------------
_SQL_QUANTILE_AUDIT = """
    WITH c AS (
        SELECT o_orderpriority AS priority,
               CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders)
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(quantile_disc(cents, 0.5) AS BIGINT) AS exact_p50_cents,
           TRUE AS approx_ok
    FROM c GROUP BY priority
    """


@_q("quantile_sketch_audit", _SQL_QUANTILE_AUDIT)
def q_quantile_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit of Spark's `approx_percentile` (Greenwald-Khanna sketch)
    per order priority — the third sketch-accuracy gate
    (`minhash_accuracy` audits MinHash, `approx_distinct_parts` audits
    HLL). Two parts, both rank-based because a value tolerance is
    meaningless on heavy-tailed money amounts (adjacent order
    statistics near the median can differ by >1%):

    * `exact_p50_cents` — the exact *discrete* median: GK with
      accuracy=INT_MAX degenerates to exact, and its "smallest value
      with ≥ ⌈p·n⌉ rows ≤ it" convention picks the identical element
      as DuckDB's `quantile_disc` for p=0.5 at every n — an integer
      the hash gate can pin.
    * `approx_ok` — a coarse sketch (accuracy=100) is certified by its
      *rank*: the count of rows ≤ its answer must sit within
      2%+2 rows of n/2 (GK guarantees n/100). The oracle asserts TRUE,
      so a sketch-config regression fails the external hash gate.

    Scale: sketches are mergeable fixed-size state, map-side combined
    — the 100 TB quantile path. The certification join broadcasts
    |priorities| rows back over the fact; the production exact-quantile
    alternative at scale is the bounded value histogram
    (`token_len_decile_gate`, `winsorized_price_stats`).
    """
    c = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    g = c.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.expr("approx_percentile(cents, 0.5, 2147483647)")
        .cast("long")
        .alias("exact_p50_cents"),
        F.expr("approx_percentile(cents, 0.5, 100)")
        .cast("long")
        .alias("approx_p50"),
    )
    cert = (
        c.join(F.broadcast(g), "priority")
        .groupBy("priority", "n_orders", "exact_p50_cents")
        .agg(
            F.sum(
                F.when(F.col("cents") <= F.col("approx_p50"), 1).otherwise(0)
            ).alias("cnt_le")
        )
    )
    rank_ok = (
        F.abs(F.col("cnt_le") - F.expr("n_orders div 2")) * 100
        <= F.col("n_orders") * 2 + 200
    )
    return cert.select(
        "priority", "n_orders", "exact_p50_cents", rank_ok.alias("approx_ok")
    )


# ---------------------------------------------------------------------------
# Rate-based source rebalancing: mix to a target distribution, row-local
# ---------------------------------------------------------------------------
_SQL_MIX_HASH = (
    "CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15)) "
    "AS BIGINT)"
)

_SQL_SOURCE_REBALANCE = f"""
    WITH w AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CASE WHEN CAST(regexp_extract(source, '([0-9]+)$', 1) AS INT)
                         % 2 = 0
                    THEN 3 ELSE 1 END AS tw
        FROM documents GROUP BY source),
    r AS (
        SELECT source, n_docs,
               CAST(tw * 1000000 // MAX(tw) OVER () AS BIGINT) AS rate_ppm
        FROM w)
    SELECT d.source, r.n_docs, r.rate_ppm,
           CAST(SUM(CASE WHEN {_SQL_MIX_HASH} % 1000000 < r.rate_ppm
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM documents d JOIN r ON d.source = r.source
    GROUP BY d.source, r.n_docs, r.rate_ppm
    """


@_q("source_rebalance_sample", _SQL_SOURCE_REBALANCE)
def q_source_rebalance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-based source rebalancing: derive a per-source keep-rate
    from target mixture weights (here: even-indexed sources upweighted
    3:1), normalize so the heaviest source keeps 100%, and decide each
    document row-locally by salted hash — the "temperature mixing"
    pass that reshapes a training corpus toward a target distribution.
    This is the scale path promised in `source_quota_cap`'s docstring:
    the cap there is an exact-K rank window; here the decision is a
    pure filter once the |sources|-row rate table exists.

    Scale: one map-side-combined aggregate builds the rate table
    (|sources| rows); the MAX-normalization window runs on that tiny
    table; rates broadcast back; the keep decision and the audit
    re-aggregation are one more fixed-width shuffle. No row-level
    sort, no rank window over the corpus.
    """
    from bikes_data_warehouse_etl_spark.functions.text import hash64

    d = _t(spark, sf_dir, "documents")
    tw = F.when(
        F.regexp_extract("source", r"([0-9]+)$", 1).cast("int") % 2 == 0, 3
    ).otherwise(1)
    w = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.max(tw).alias("tw"),
    )
    r = w.select(
        "source",
        "n_docs",
        F.expr("tw * 1000000 div MAX(tw) OVER ()").cast("long").alias(
            "rate_ppm"
        ),
    )
    h = hash64(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")))
    return (
        d.join(F.broadcast(r), "source")
        .groupBy("source", "n_docs", "rate_ppm")
        .agg(
            F.sum(F.when(h % 1000000 < F.col("rate_ppm"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept")
        )
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage curve: how much corpus does a top-k vocab cover?
# ---------------------------------------------------------------------------
from bikes_data_warehouse_etl_spark.plans.extensions import _SQL_TOKENS  # noqa: E402

_SQL_VOCAB_CURVE = f"""
    WITH tc AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest({_SQL_TOKENS}) AS term FROM documents)
        WHERE term <> '' GROUP BY term),
    rk AS (
        SELECT ROW_NUMBER() OVER (ORDER BY n DESC, term) AS k,
               SUM(n) OVER (ORDER BY n DESC, term
                            ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(n) OVER () AS tot
        FROM tc)
    SELECT CAST(k AS BIGINT) AS k,
           CAST(cum AS BIGINT) AS cum_tokens,
           CAST(tot AS BIGINT) AS total_tokens,
           CAST(cum * 1000000 // tot AS BIGINT) AS cover_ppm
    FROM rk WHERE k IN (10, 100, 1000)
    """


@_q("vocab_coverage_curve", _SQL_VOCAB_CURVE)
def q_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: the share of all corpus tokens
    covered by the top-10/100/1000 most frequent terms — the
    tokenizer-design study (how big must a vocab be before OOV is
    negligible; pairs with `oov_rate`, which audits one fixed vocab).

    Scale: term counting is the word-count shape (explode, map-side
    combine, one fixed-width shuffle). The ranking window then runs
    over the *vocabulary*, not the corpus — single-partition is
    acceptable because |vocab| ≪ corpus (and is itself cappable by a
    min-count HAVING); at web scale swap the exact rank for the
    count-histogram trick (`token_len_decile_gate`) — same output
    columns.
    """
    d = _t(spark, sf_dir, "documents")
    from bikes_data_warehouse_etl_spark.functions.text import tokens

    tc = (
        d.select(F.explode(tokens(F.col("text"))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wk = Window.orderBy(F.col("n").desc(), F.col("term"))
    rk = tc.select(
        F.row_number().over(wk).cast("long").alias("k"),
        F.sum("n")
        .over(wk.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("n").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("tot"),
    )
    return rk.where(F.col("k").isin(10, 100, 1000)).select(
        "k",
        F.col("cum").cast("long").alias("cum_tokens"),
        F.col("tot").cast("long").alias("total_tokens"),
        F.expr("cum * 1000000 div tot").cast("long").alias("cover_ppm"),
    )


# ---------------------------------------------------------------------------
# Embedding quantization audit: integer-exact reconstruction error
# ---------------------------------------------------------------------------
_SQL_QMILLI = (
    "GREATEST(LEAST(CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT), 3999), "
    "-4000)"
)

_SQL_QUANT_ERROR = f"""
    WITH e AS (
        SELECT label,
               CAST(list_sum(list_transform(embedding,
                    x -> (({_SQL_QMILLI} + 4000) % 8)
                         * (({_SQL_QMILLI} + 4000) % 8))) AS BIGINT) AS err2
        FROM embeddings)
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(err2) AS BIGINT) AS sum_err2,
           CAST(MAX(err2) AS BIGINT) AS max_err2,
           CAST(SUM(err2) // COUNT(*) AS BIGINT) AS avg_err2
    FROM e GROUP BY label
    """


@_q("embedding_quant_error", _SQL_QUANT_ERROR)
def q_embedding_quant_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantization-impact audit: per-label squared reconstruction
    error of a uniform 8-milli-step (~10-bit) embedding quantizer —
    the check run before shipping a quantized ANN index (a label whose
    error is 10× the rest has an out-of-range scale and will lose
    recall). Components clamp to [-4.0, 4.0) then quantize by integer
    step, so the error fold is exact integer math on both engines
    (the residual is (v mod 8)² on the shifted non-negative value —
    no float subtraction anywhere).

    Scale: row-local higher-order fold (no explode), one
    map-side-combined shuffle carrying (label, long); output is
    |labels| rows. Same shape as `embedding_norm_stats`.
    """
    e = _t(spark, sf_dir, "embeddings")

    def comp_err(x):
        m = F.greatest(
            F.least(F.floor(x.cast("double") * 1000).cast("long"), F.lit(3999)),
            F.lit(-4000),
        )
        r = (m + 4000) % 8
        return r * r

    err2 = F.aggregate(
        "embedding", F.lit(0).cast("long"), lambda acc, x: acc + comp_err(x)
    ).alias("err2")
    return (
        e.select("label", err2)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("err2").cast("long").alias("sum_err2"),
            F.max("err2").cast("long").alias("max_err2"),
            F.expr("SUM(err2) div COUNT(*)").cast("long").alias("avg_err2"),
        )
    )
