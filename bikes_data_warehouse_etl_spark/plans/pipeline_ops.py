"""Training-data pipeline operators, round 2: sampling, corpus
statistics, indexing, data profiling, and behavioral analytics.

Same contract as the rest of the query surface — every entry is a
(Spark plan, DuckDB oracle) pair that hash-matches bit-for-bit:

* integer arithmetic everywhere a ratio appears (ppm / integer cents /
  ``div``), never cross-engine float division;
* the portable md5-prefix ``hash64`` wherever a hash value is part of
  the *semantics* (sampling); production swaps ``xxhash64`` in;
* deterministic ordering on every LIMIT (count DESC, key ASC).

Scale notes are per-query docstrings; the shared theme: each operator
is one or two shuffles on fixed-width keys with map-side partial
aggregation, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.text import (
    hash64,
    quality_score,
    token_count,
    tokens,
)
from bikes_data_warehouse_etl_spark.plans.extensions import (
    _SQL_NEARDUP,
    _SQL_NTOK,
    _SQL_QUALITY,
    _SQL_TOKENS,
)
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t

_SQL_HASH_SMP = (
    "CAST(('0x' || substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 15)) "
    "AS BIGINT)"
)


# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------
@_q(
    "sample_stratified",
    f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_SQL_HASH_SMP} % 10 < CASE WHEN lang = 'en' THEN 1 ELSE 3 END
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum sampling: keep 10% of English docs,
    30% of everything else, decided by a salted content-key hash — the
    reproducible alternative to ``df.sample`` (whose output depends on
    partitioning and seed plumbing, so no two engines agree).

    Scale: a row-local filter — no shuffle, no state, trivially
    restartable, and the same doc always lands in (or out of) the
    sample across reruns and engines. This is how training mixtures
    pin their sampling decisions at 100 TB.
    """
    d = _t(spark, sf_dir, "documents")
    h = hash64(F.concat(F.lit("smp:"), F.col("doc_id").cast("string")))
    rate = F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(3))
    return d.filter(h % 10 < rate).select("doc_id", "lang", "source")


# ---------------------------------------------------------------------------
# Corpus statistics: global term frequencies
# ---------------------------------------------------------------------------
@_q(
    "top_terms",
    f"""
    SELECT term, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest({_SQL_TOKENS}) AS term FROM documents)
    WHERE term <> ''
    GROUP BY term
    ORDER BY n DESC, term
    LIMIT 50
    """,
)
def q_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-50 terms — the classic distributed word count.

    Scale: explode → hash-agg with map-side partial combine (the
    term-count map collapses per partition before the shuffle moves
    only (term, partial_n) pairs), then TakeOrderedAndProject for the
    top-k — the full term dictionary never sorts globally. Ties broken
    on the term so the cut at 50 is deterministic cross-engine.
    """
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens(F.col("text"))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("term").asc())
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Document rarity scoring (the IDF half of TF-IDF, integer-exact)
# ---------------------------------------------------------------------------
_SQL_DISTINCT_TOKS = f"""
    SELECT DISTINCT doc_id, term FROM (
        SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents)
    WHERE term <> ''
"""


@_q(
    "doc_rarity_score",
    f"""
    WITH toks AS ({_SQL_DISTINCT_TOKS}),
    dfreq AS (SELECT term, COUNT(*) AS df FROM toks GROUP BY term)
    SELECT t.doc_id,
           CAST((SUM(d.df) * 1000000) // COUNT(*) AS BIGINT) AS mean_df_ppm,
           CAST(COUNT(*) AS BIGINT) AS n_terms
    FROM toks t JOIN dfreq d USING (term)
    GROUP BY t.doc_id
    """,
)
def q_doc_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical rarity per document: the mean document-frequency of its
    distinct terms (low = rare vocabulary), scaled to integer ppm so
    both engines divide exactly (``div`` / ``//`` — no float division
    in the contract).

    This is the IDF half of TF-IDF as a quality-filtering signal.
    Scale: two shuffles — (term) for document frequencies, (doc_id)
    for the roll-up — both on fixed-width keys with partial
    aggregation; the term→df side is a classic broadcast candidate
    once the dictionary is pruned (AQE decides).
    """
    d = _t(spark, sf_dir, "documents")
    toks = (
        d.select(
            "doc_id",
            F.explode(F.array_distinct(tokens(F.col("text")))).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    dfreq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return (
        toks.join(dfreq, "term")
        .groupBy("doc_id")
        .agg(
            F.expr("(sum(df) * 1000000) div count(*)").alias("mean_df_ppm"),
            F.count(F.lit(1)).cast("long").alias("n_terms"),
        )
    )


# ---------------------------------------------------------------------------
# Inverted index (posting lists)
# ---------------------------------------------------------------------------
@_q(
    "inverted_index",
    f"""
    WITH toks AS ({_SQL_DISTINCT_TOKS})
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS df,
           array_to_string(list_sort(list(doc_id)), ',') AS postings
    FROM toks
    GROUP BY term
    HAVING COUNT(*) * 10 <= (SELECT COUNT(*) FROM documents)
       AND COUNT(*) <= 1000
    """,
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list construction for rare terms: term → sorted doc-id
    list, serialized as a comma-joined string so the cross-engine hash
    is representation-stable.

    The rarity band is *relative* (df ≤ 10% of the corpus — stable as
    the data scales) with an absolute posting-length cap (df ≤ 1000 —
    the bound that actually protects executors; at 100 TB a "rare" 0.1%
    term is still millions of docs, so real indexers page postings
    beyond the cap). Scale: one shuffle on the term; the corpus size
    joins in as a broadcast 1-row aggregate, never a driver action;
    stop-word-frequency terms are dropped by the same aggregation's
    count before any large list leaves the executor.
    """
    d = _t(spark, sf_dir, "documents")
    toks = (
        d.select(
            "doc_id",
            F.explode(F.array_distinct(tokens(F.col("text")))).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        toks.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
            ).alias("postings"),
        )
        .join(F.broadcast(n_docs))
        .filter((F.col("df") * 10 <= F.col("n_docs")) & (F.col("df") <= 1000))
        .select("term", "df", "postings")
    )


# ---------------------------------------------------------------------------
# Month-over-month revenue (LAG window)
# ---------------------------------------------------------------------------
@_q(
    "monthly_revenue_mom",
    """
    WITH m AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
                   AS rev_cents
        FROM orders GROUP BY 1)
    SELECT month, rev_cents,
           LAG(rev_cents) OVER (ORDER BY month) AS prev_cents,
           rev_cents - LAG(rev_cents) OVER (ORDER BY month) AS delta_cents
    FROM m
    """,
)
def q_monthly_revenue_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue deltas via LAG.

    The unpartitioned window is safe *by construction*: it runs on the
    post-aggregation monthly series, whose cardinality is bounded by
    the calendar (~84 rows for 7 years) regardless of fact-table size —
    the aggregation shuffle (month key, partial sums map-side) is the
    only data-sized stage.
    """
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
    ).agg(F.sum(cents).alias("rev_cents"))
    w = Window.orderBy("month")
    prev = F.lag("rev_cents").over(w)
    return monthly.select(
        "month",
        "rev_cents",
        prev.alias("prev_cents"),
        (F.col("rev_cents") - prev).alias("delta_cents"),
    )


# ---------------------------------------------------------------------------
# Column completeness / cardinality profiling (data quality)
# ---------------------------------------------------------------------------
@_q(
    "column_completeness",
    """
    SELECT 'c_acctbal' AS col_name,
           CAST(COUNT(*) - COUNT(c_acctbal) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT c_acctbal) AS BIGINT) AS n_distinct
    FROM customer
    UNION ALL
    SELECT 'c_mktsegment', CAST(COUNT(*) - COUNT(c_mktsegment) AS BIGINT),
           CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'c_name', CAST(COUNT(*) - COUNT(c_name) AS BIGINT),
           CAST(COUNT(DISTINCT c_name) AS BIGINT)
    FROM customer
    """,
)
def q_column_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null counts and exact cardinalities — the profiling
    pass every ingestion pipeline runs before trusting a feed.

    Scale: ONE scan computes all columns' stats in a single aggregate
    (Spark plans the multi-COUNT-DISTINCT as an expand ×3 — still one
    pass over the data, vs the oracle's three scans which are fine for
    a 1500-row differential check but not for 100 TB). Swap
    ``approx_count_distinct`` in at scale and drop to rows-only.
    """
    c = _t(spark, sf_dir, "customer")
    agg = c.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("c_name").alias("nn_name"),
        F.count_distinct("c_name").alias("nd_name"),
        F.count("c_acctbal").alias("nn_bal"),
        F.count_distinct("c_acctbal").alias("nd_bal"),
        F.count("c_mktsegment").alias("nn_seg"),
        F.count_distinct("c_mktsegment").alias("nd_seg"),
    )
    return agg.select(
        F.expr(
            "stack(3, "
            "'c_acctbal', n_rows - nn_bal, nd_bal, "
            "'c_mktsegment', n_rows - nn_seg, nd_seg, "
            "'c_name', n_rows - nn_name, nd_name"
            ") as (col_name, n_nulls, n_distinct)"
        )
    )


# ---------------------------------------------------------------------------
# Key-skew diagnostics
# ---------------------------------------------------------------------------
@_q(
    "key_skew_profile",
    """
    WITH pk AS (SELECT l_partkey, COUNT(*) AS n FROM lineitem GROUP BY 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(MIN(n) AS BIGINT) AS min_rows,
           CAST(MAX(n) AS BIGINT) AS max_rows,
           CAST(SUM(n) // COUNT(*) AS BIGINT) AS avg_rows_floor,
           ROUND(quantile_cont(n, 0.99), 4) AS p99_rows
    FROM pk
    """,
)
def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile for ``l_partkey``: per-key row counts
    rolled up to min/max/floor-mean/p99 — the diagnostic you run
    BEFORE choosing salting factors or AQE skew thresholds
    (``operators/skew.py``). max_rows/avg_rows is the skew ratio.

    Scale: groupBy(key) with map-side combine, then a single-row
    global aggregate over one long per key. The exact p99 sorts the
    per-key counts (fine: |keys| ≪ |rows|); at extreme key counts swap
    ``approx_percentile``.
    """
    li = _t(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    return per_key.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.min("n").cast("long").alias("min_rows"),
        F.max("n").cast("long").alias("max_rows"),
        F.expr("sum(n) div count(*)").alias("avg_rows_floor"),
        F.round(F.expr("percentile(n, 0.99)"), 4).alias("p99_rows"),
    )


# ---------------------------------------------------------------------------
# Near-dup clustering: candidate pairs → connected components
# ---------------------------------------------------------------------------
_SQL_COMPONENTS = f"""
    WITH RECURSIVE
    -- MATERIALIZED is load-bearing (the co_order_edges precedent,
    -- pipeline_ops16.sql_coorder_edge_ctes): DuckDB inlines plain CTEs
    -- per reference, so the recursive reach join re-executed the full
    -- shingle self-join EVERY iteration — observed as a 70 GB spill at
    -- sf10 where the materialized pair set is a few thousand rows.
    pairs AS MATERIALIZED (SELECT id_a, id_b FROM ({_SQL_NEARDUP})),
    edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    reach AS (
        SELECT src AS node, src AS r FROM edges
        UNION
        SELECT w.node, e.dst FROM reach w JOIN edges e ON e.src = w.r
    ),
    comp AS (SELECT node AS doc_id, MIN(r) AS component_id
             FROM reach GROUP BY node)
    SELECT c.doc_id, c.component_id, s.n_members
    FROM comp c
    JOIN (SELECT component_id, CAST(COUNT(*) AS BIGINT) AS n_members
          FROM comp GROUP BY component_id) s USING (component_id)
    """


@_q("neardup_components", _SQL_COMPONENTS)
def q_neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup group closure: verified near-dup pairs (exact Jaccard ≥
    0.2) clustered into connected components by min-label propagation
    — A~B and B~C collapse to one keeper even though A~C was never
    scored. Output: (doc_id, component_id, n_members) for every doc in
    a multi-doc component; component_id is the smallest member id (the
    row the dedup keeps).

    The oracle side computes the same transitive closure as a DuckDB
    recursive CTE — the rare case where the differential gate checks an
    *iterative* Spark algorithm against a declarative fixpoint.
    """
    from bikes_data_warehouse_etl_spark.operators.dedup import (
        neardup_components,
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.2)
    comps = neardup_components(pairs)
    sizes = comps.groupBy("component_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    return comps.select(F.col("node").alias("doc_id"), "component_id").join(
        sizes, "component_id"
    ).select("doc_id", "component_id", "n_members")


# ---------------------------------------------------------------------------
# Event funnel (ordered-firsts conversion)
# ---------------------------------------------------------------------------
@_q(
    "event_funnel",
    """
    WITH pu AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS tv,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS tc,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
        FROM events GROUP BY user_id)
    SELECT CAST(COUNT(tv) AS BIGINT) AS n_view_users,
           CAST(COUNT(CASE WHEN tv < tc THEN 1 END) AS BIGINT)
               AS n_view_then_click,
           CAST(COUNT(CASE WHEN tv < tc AND tc < tp THEN 1 END) AS BIGINT)
               AS n_full_funnel
    FROM pu
    """,
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase conversion funnel, ordered-firsts
    semantics: a user converts a stage if their first view precedes
    their first click precedes their first purchase.

    Scale: ONE shuffle (user_id) computing three conditional MINs
    map-side, then a single-row roll-up — the standard funnel shape
    that never materializes per-event sequences. Only timestamp
    *comparisons* cross the engines (counts out), so nanosecond
    normalization differences can't leak into the hash.
    """
    e = _t(spark, sf_dir, "events")
    pu = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("tv"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("tc"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "tp"
        ),
    )
    return pu.agg(
        F.count("tv").alias("n_view_users"),
        F.count(F.when(F.col("tv") < F.col("tc"), 1)).alias(
            "n_view_then_click"
        ),
        F.count(
            F.when((F.col("tv") < F.col("tc")) & (F.col("tc") < F.col("tp")), 1)
        ).alias("n_full_funnel"),
    )


# ---------------------------------------------------------------------------
# The composed training-data pipeline: dedup → quality gate → split
# ---------------------------------------------------------------------------
_SQL_HASH_SPLIT = (
    "CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15)) "
    "AS BIGINT)"
)


@_q(
    "curated_corpus",
    f"""
    WITH ranked AS (
        SELECT doc_id, lang, text,
               ROW_NUMBER() OVER (
                   PARTITION BY CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)
                   ORDER BY doc_id) AS rn
        FROM documents),
    kept AS (
        SELECT doc_id, lang,
               {_SQL_QUALITY} AS quality,
               {_SQL_NTOK} AS tok_cnt
        FROM ranked
        WHERE rn = 1)
    SELECT doc_id, lang,
           CASE WHEN {_SQL_HASH_SPLIT} % 100 < 90 THEN 'train'
                WHEN {_SQL_HASH_SPLIT} % 100 < 95 THEN 'val'
                ELSE 'test' END AS split,
           quality, tok_cnt
    FROM kept
    WHERE quality >= 0.5 AND tok_cnt >= 20
    """,
)
def q_curated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline every pretraining corpus runs,
    end-to-end in one plan: exact dedup (keep the lowest doc_id per
    content hash) → quality gate (composite score ≥ 0.5, ≥ 20 tokens)
    → deterministic 90/5/5 train/val/test split by a salted id hash.

    Scale shape: ONE shuffle total, and it is THIN — quality, token
    count and the content hash are all computed row-locally in the
    scan stage, the text column is dropped BEFORE the exchange, and
    the lowest-doc_id survivor per content hash comes from a
    map-side-combinable ``min_by`` aggregate (partial aggregation
    keeps one candidate row per hash per mapper, so identical-
    boilerplate hot keys collapse before they travel). The round-4
    formulation put a row_number window on the hash FIRST and scored
    afterwards, which — because the scorer needs ``text`` — silently
    shuffled every full document body through the exchange and paid a
    per-partition sort instead of a combinable aggregate (sf10
    measured 43 s → see PERF.md). Scoring runs on dupes too under
    this order, but scoring is row-local CPU on the scan while body
    bytes through a shuffle are the thing that kills at 100 TB. The
    split is salted independently of the sampling hash (``smp:`` vs
    ``split:``) so composing both operators never correlates their
    decisions.
    """
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        hash64("text").alias("h"),
        quality_score("text").alias("quality"),
        token_count("text").alias("tok_cnt"),
    )
    kept = (
        d.groupBy("h")
        .agg(
            F.min_by(
                F.struct("doc_id", "lang", "quality", "tok_cnt"),
                F.col("doc_id"),
            ).alias("s")
        )
        .select("s.doc_id", "s.lang", "s.quality", "s.tok_cnt")
    )
    bucket = hash64(
        F.concat(F.lit("split:"), F.col("doc_id").cast("string"))
    ) % 100
    return (
        kept.filter((F.col("quality") >= 0.5) & (F.col("tok_cnt") >= 20))
        .select(
            "doc_id",
            "lang",
            F.when(bucket < 90, "train")
            .when(bucket < 95, "val")
            .otherwise("test")
            .alias("split"),
            "quality",
            "tok_cnt",
        )
    )


# ---------------------------------------------------------------------------
# Weekly user retention (behavioral analytics over events)
# ---------------------------------------------------------------------------
@_q(
    "user_retention_weekly",
    """
    WITH wau AS (
        SELECT DISTINCT CAST(date_trunc('week', ts) AS DATE) AS wk, user_id
        FROM events),
    f AS (
        SELECT wk,
               CASE WHEN LAG(wk) OVER (PARTITION BY user_id ORDER BY wk)
                         = wk - 7
                    THEN 1 ELSE 0 END AS r
        FROM wau)
    SELECT wk, CAST(COUNT(*) AS BIGINT) AS wau,
           CAST(SUM(r) AS BIGINT) AS retained
    FROM f GROUP BY wk
    """,
)
def q_user_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week retention: of this week's active users, how many
    were also active last week.

    Shape chosen FOR scale: a user is retained in week w iff their
    previous distinct active week is exactly w-7 — a LAG over the
    per-user week sequence. That's one distinct on (wk, user), one
    window partitioned by user_id (high-cardinality, evenly spread),
    one final roll-up — 3 exchanges, no self-join. The naive
    wau ⋈ wau self-join costs 7 exchanges and recomputes the distinct
    set twice (measured; pinned in test_plan_shapes.py). Spark and
    DuckDB both start ISO weeks on Monday, so the buckets agree.
    """
    e = _t(spark, sf_dir, "events")
    wau = (
        e.select(
            F.date_trunc("week", F.col("ts")).cast("date").alias("wk"),
            "user_id",
        )
        .distinct()
    )
    prev_wk = F.lag("wk").over(
        Window.partitionBy("user_id").orderBy("wk")
    )
    flagged = wau.select(
        "wk",
        F.when(prev_wk == F.date_sub("wk", 7), 1).otherwise(0).alias("r"),
    )
    return flagged.groupBy("wk").agg(
        F.count(F.lit(1)).cast("long").alias("wau"),
        F.sum("r").cast("long").alias("retained"),
    )
