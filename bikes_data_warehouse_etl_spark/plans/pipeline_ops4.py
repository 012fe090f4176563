"""Training-data pipeline operators, round 2 batch 4: leakage-safe
dataset splitting, histogram-exact winsorization, language-ID
evaluation, distribution-drift monitoring, incremental partial-
aggregate merge, and bigram collocation (PMI-lift) mining.

Same contract as the earlier ``pipeline_ops*`` batches: every query is
a (Spark plan, DuckDB oracle) pair expected to hash-match bit-for-bit.
Cross-engine arithmetic stays integer (ppm / cents / milli), and the
one deliberate float step (PMI lift) is a single IEEE expression with
pinned association evaluated identically by both engines.

Shared scale theme (continues batch 3): reduce to a bounded key space
— a fingerprint, a price histogram, a |langs|² matrix, an
|event_types| profile, daily partials, a vocabulary — before any
windowed / joined / quadratic step, so the expensive stage's input is
independent of raw row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.text import (
    STOPWORDS,
    fingerprint,
    lang_id_guess,
    tokens,
    word_shingles_from_tokens,
)
from bikes_data_warehouse_etl_spark.plans.extensions import (
    _SQL_LANG,
    _SQL_TOKENS,
    _sql_hash64,
    _sql_stop,
)
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t

_SQL_FP = _sql_hash64(
    "array_to_string(list_sort(list_distinct(" + _SQL_TOKENS + ")), ' ')"
)

# per-row dollars→cents, exact in both engines (2dp source values)
_SQL_CENTS = "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"


# ---------------------------------------------------------------------------
# Leakage-safe train/val/test split
# ---------------------------------------------------------------------------
@_q(
    "train_split_assign",
    f"""
    WITH fp AS (
        SELECT lang, n_chars, {_SQL_FP} AS fp FROM documents),
    tagged AS (
        SELECT lang, n_chars, fp,
               CASE WHEN fp % 100 < 80 THEN 'train'
                    WHEN fp % 100 < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM fp)
    SELECT split, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_clusters,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM tagged GROUP BY split, lang
    """,
)
def q_train_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment keyed on the
    *content fingerprint*, not the doc_id — exact duplicates (and
    token-reordered near-duplicates) land in the same split by
    construction, the leakage guard every eval-contamination postmortem
    wishes it had.  Reports per-(split, lang) doc counts, distinct
    cluster counts, and char volume for split-balance auditing.

    Scale: the fingerprint and bucket are row-local; the only shuffle
    is the (split, lang, fp) aggregate, and COUNT(DISTINCT fp) expands
    map-side (partial distinct on the 64-bit key) rather than moving
    text.  Assignment is stable under re-runs and cluster re-sizing —
    no RNG, no sampling.
    """
    d = _t(spark, sf_dir, "documents")
    tagged = d.select(
        "lang",
        "n_chars",
        fingerprint("text").alias("fp"),
    ).withColumn(
        "split",
        F.when(F.col("fp") % 100 < 80, "train")
        .when(F.col("fp") % 100 < 90, "val")
        .otherwise("test"),
    )
    return tagged.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fp").alias("n_clusters"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )


# ---------------------------------------------------------------------------
# Histogram-exact winsorization (p05/p95 clip without sorting the data)
# ---------------------------------------------------------------------------
@_q(
    "winsorized_price_stats",
    f"""
    WITH cents AS (
        SELECT o_orderpriority AS seg, {_SQL_CENTS} AS c FROM orders),
    hist AS (
        SELECT seg, c, COUNT(*) AS cnt FROM cents GROUP BY seg, c),
    ranked AS (
        SELECT seg, c, cnt,
               SUM(cnt) OVER (PARTITION BY seg ORDER BY c
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               SUM(cnt) OVER (PARTITION BY seg) AS n
        FROM hist),
    thr AS (
        SELECT seg, MAX(n) AS n_orders,
               MIN(CASE WHEN cum >= (5 * n + 99) // 100 THEN c END) AS p05,
               MIN(CASE WHEN cum >= (95 * n + 99) // 100 THEN c END) AS p95
        FROM ranked GROUP BY seg)
    SELECT r.seg,
           CAST(t.n_orders AS BIGINT) AS n_orders,
           CAST(t.p05 AS BIGINT) AS p05_cents,
           CAST(t.p95 AS BIGINT) AS p95_cents,
           CAST(SUM(r.c * r.cnt) AS BIGINT) AS sum_cents,
           CAST(SUM(LEAST(GREATEST(r.c, t.p05), t.p95) * r.cnt) AS BIGINT)
               AS sum_winsorized_cents,
           CAST(SUM(CASE WHEN r.c < t.p05 THEN r.cnt ELSE 0 END) AS BIGINT)
               AS n_clipped_lo,
           CAST(SUM(CASE WHEN r.c > t.p95 THEN r.cnt ELSE 0 END) AS BIGINT)
               AS n_clipped_hi
    FROM ranked r JOIN thr t ON r.seg = t.seg
    GROUP BY r.seg, t.n_orders, t.p05, t.p95
    """,
)
def q_winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment winsorized spend: clip order values at the exact
    (rank-selected, not interpolated) 5th/95th percentile and report
    raw vs clipped sums plus clip counts — the outlier-robust
    normalization step before any value lands in a training target.

    Scale: percentile-by-sorting is the anti-pattern (|segments| is 5,
    so a per-segment sort means five near-global sorts).  This plan
    selects percentiles from the *value histogram* instead: one
    map-side-combined aggregate to (seg, cents) counts, a cumulative
    window whose input is bounded by the price DOMAIN (~5e7 distinct
    cents) rather than the row count, and the clipped re-aggregation
    also runs on the histogram — raw rows are scanned exactly once.
    Thresholds (5 rows) broadcast back.  Same domain-bounded shape as
    ``token_len_decile_gate``, extended to per-group thresholds and
    clip-and-reaggregate.
    """
    o = _t(spark, sf_dir, "orders")
    cents = o.select(
        F.col("o_orderpriority").alias("seg"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c"),
    )
    hist = cents.groupBy("seg", "c").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("seg")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = hist.select(
        "seg",
        "c",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("seg")).alias("n"),
    )
    thr = ranked.groupBy("seg").agg(
        F.max("n").alias("n_orders"),
        F.min(
            F.when(F.col("cum") >= F.expr("(5 * n + 99) div 100"), F.col("c"))
        ).alias("p05"),
        F.min(
            F.when(F.col("cum") >= F.expr("(95 * n + 99) div 100"), F.col("c"))
        ).alias("p95"),
    )
    clipped = F.least(F.greatest(F.col("c"), F.col("p05")), F.col("p95"))
    return (
        ranked.join(F.broadcast(thr), "seg")
        .groupBy("seg", "n_orders", "p05", "p95")
        .agg(
            F.sum(F.col("c") * F.col("cnt")).cast("long").alias("sum_cents"),
            F.sum(clipped * F.col("cnt"))
            .cast("long")
            .alias("sum_winsorized_cents"),
            F.sum(F.when(F.col("c") < F.col("p05"), F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("n_clipped_lo"),
            F.sum(F.when(F.col("c") > F.col("p95"), F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("n_clipped_hi"),
        )
        .select(
            "seg",
            F.col("n_orders").cast("long").alias("n_orders"),
            F.col("p05").cast("long").alias("p05_cents"),
            F.col("p95").cast("long").alias("p95_cents"),
            "sum_cents",
            "sum_winsorized_cents",
            "n_clipped_lo",
            "n_clipped_hi",
        )
    )


# ---------------------------------------------------------------------------
# Language-ID evaluation: confusion matrix vs labeled lang
# ---------------------------------------------------------------------------
@_q(
    "langid_confusion",
    f"""
    WITH counted AS (
        SELECT lang, text,
               {_sql_stop(STOPWORDS['en'])} AS c_en,
               {_sql_stop(STOPWORDS['es'])} AS c_es,
               {_sql_stop(STOPWORDS['de'])} AS c_de,
               {_sql_stop(STOPWORDS['fr'])} AS c_fr
        FROM documents),
    pred AS (
        SELECT lang, {_SQL_LANG} AS pred_lang FROM counted)
    SELECT lang, pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST((COUNT(*) * 1000000) //
               SUM(COUNT(*)) OVER (PARTITION BY lang) AS BIGINT)
               AS row_share_ppm,
           lang = pred_lang AS is_correct
    FROM pred GROUP BY lang, pred_lang
    """,
)
def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the stopword-vote language-ID heuristic
    against the labeled ``lang`` column, with per-true-language recall
    shares in ppm — the accuracy audit that decides whether a cheap
    classifier is good enough to gate a corpus.

    Scale: prediction is row-local (same expression as
    ``lang_quality``); the matrix aggregate is map-side-combined down
    to ≤ |langs|² rows, and the recall normalisation window runs on
    that matrix, not the corpus.
    """
    d = _t(spark, sf_dir, "documents")
    tokd = d.select("lang", "text", tokens("text").alias("__toks__"))
    pred = tokd.select(
        "lang", lang_id_guess("text", F.col("__toks__")).alias("pred_lang")
    )
    cells = pred.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    return cells.select(
        "lang",
        "pred_lang",
        F.col("n").cast("long").alias("n_docs"),
        F.expr("(n * 1000000) div sum(n) over (partition by lang)")
        .cast("long")
        .alias("row_share_ppm"),
        (F.col("lang") == F.col("pred_lang")).alias("is_correct"),
    )


# ---------------------------------------------------------------------------
# Distribution drift: early-half vs late-half event profile
# ---------------------------------------------------------------------------
@_q(
    "event_drift",
    """
    WITH tagged AS (
        SELECT event_type,
               CASE WHEN CAST(FLOOR(epoch(ts)) AS BIGINT) < 1705363200
                    THEN 1 ELSE 0 END AS early,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS vc
        FROM events),
    agg AS (
        SELECT event_type,
               CAST(SUM(early) AS BIGINT) AS n_early,
               CAST(SUM(1 - early) AS BIGINT) AS n_late,
               CAST(SUM(CASE WHEN early = 1 THEN vc ELSE 0 END) AS BIGINT)
                   AS cents_early,
               CAST(SUM(CASE WHEN early = 0 THEN vc ELSE 0 END) AS BIGINT)
                   AS cents_late
        FROM tagged GROUP BY event_type)
    SELECT event_type, n_early, n_late,
           CAST((n_early * 1000000) // SUM(n_early) OVER () AS BIGINT)
               AS share_early_ppm,
           CAST((n_late * 1000000) // SUM(n_late) OVER () AS BIGINT)
               AS share_late_ppm,
           CAST(ABS((n_early * 1000000) // SUM(n_early) OVER ()
               - (n_late * 1000000) // SUM(n_late) OVER ()) AS BIGINT)
               AS drift_ppm,
           cents_early, cents_late
    FROM agg
    """,
)
def q_event_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-mix drift between the first and second half of the
    event stream (fixed epoch cutoff 2024-01-16T00:00Z): per event
    type, early/late counts, share-of-traffic in ppm, and the absolute
    share delta — the monitor that catches a pipeline silently
    changing its input mix between snapshots.

    Scale: the half tag and cents conversion are row-local (epoch
    comparison on the long, no timezone math); one map-side-combined
    aggregate reduces the stream to |event_types| rows, and the
    share-normalisation windows run over that profile in a single
    partition — bounded by the type vocabulary, not the event count.
    """
    ev = _t(spark, sf_dir, "events")
    tagged = ev.select(
        "event_type",
        F.when(F.unix_timestamp("ts") < 1705363200, 1)
        .otherwise(0)
        .alias("early"),
        F.round(F.col("value") * 100, 0).cast("long").alias("vc"),
    )
    agg = tagged.groupBy("event_type").agg(
        F.sum("early").cast("long").alias("n_early"),
        F.sum(1 - F.col("early")).cast("long").alias("n_late"),
        F.sum(F.when(F.col("early") == 1, F.col("vc")).otherwise(0))
        .cast("long")
        .alias("cents_early"),
        F.sum(F.when(F.col("early") == 0, F.col("vc")).otherwise(0))
        .cast("long")
        .alias("cents_late"),
    )
    share_e = "(n_early * 1000000) div sum(n_early) over ()"
    share_l = "(n_late * 1000000) div sum(n_late) over ()"
    return agg.select(
        "event_type",
        "n_early",
        "n_late",
        F.expr(share_e).cast("long").alias("share_early_ppm"),
        F.expr(share_l).cast("long").alias("share_late_ppm"),
        F.expr(f"abs({share_e} - {share_l})").cast("long").alias("drift_ppm"),
        "cents_early",
        "cents_late",
    )


# ---------------------------------------------------------------------------
# Incremental aggregation: daily partials merged to monthly
# ---------------------------------------------------------------------------
@_q(
    "incremental_agg_merge",
    f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM({_SQL_CENTS}) AS BIGINT) AS revenue_cents,
           CAST(MAX({_SQL_CENTS}) AS BIGINT) AS max_order_cents
    FROM orders GROUP BY 1, 2
    """,
)
def q_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-partial aggregation: build *daily* (day, priority)
    partials first, then merge them into the monthly rollup — the
    incremental-pipeline pattern where yesterday's partials are reused
    instead of rescanning history.  The oracle aggregates the raw
    table directly, proving merge(partials) == direct for the
    decomposable stats (count, sum, max).

    Scale: this is exactly why a 100 TB daily pipeline stays
    incremental — each day aggregates once (map-side partials on the
    (day, priority) key), and the monthly merge touches |days|×
    |priorities| rows, not raw orders.  Means are carried as
    (sum, count) pairs, never averaged-then-averaged.
    """
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    daily = o.groupBy(
        F.to_date("o_orderdate").alias("day"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("s"),
        F.max(cents).alias("m"),
    )
    return daily.groupBy(
        F.trunc("day", "month").alias("month"), "priority"
    ).agg(
        F.sum("n").cast("long").alias("n_orders"),
        F.sum("s").cast("long").alias("revenue_cents"),
        F.max("m").cast("long").alias("max_order_cents"),
    )


# ---------------------------------------------------------------------------
# Collocation mining: top bigrams by PMI lift
# ---------------------------------------------------------------------------
@_q(
    "bigram_pmi_top",
    f"""
    WITH toks AS (
        SELECT {_SQL_TOKENS} AS t FROM documents),
    uni AS (
        SELECT unnest(t) AS w FROM toks),
    ucnt AS (
        SELECT w, COUNT(*) AS n FROM uni GROUP BY w),
    big AS (
        SELECT unnest(list_transform(generate_series(1, len(t) - 1),
               i -> array_to_string(t[i:i+1], ' '))) AS bg
        FROM toks),
    bcnt AS (
        SELECT bg, COUNT(*) AS n FROM big GROUP BY bg
        HAVING COUNT(*) >= 5),
    tot AS (
        SELECT (SELECT COUNT(*) FROM uni) AS n_uni,
               (SELECT COUNT(*) FROM big) AS n_big)
    SELECT b.bg AS bigram,
           CAST(b.n AS BIGINT) AS n_pair,
           CAST(x.n AS BIGINT) AS n_x,
           CAST(y.n AS BIGINT) AS n_y,
           CAST(FLOOR((CAST(b.n AS DOUBLE) * CAST(t.n_uni AS DOUBLE)
                       * CAST(t.n_uni AS DOUBLE))
               / (CAST(t.n_big AS DOUBLE) * CAST(x.n AS DOUBLE)
                  * CAST(y.n AS DOUBLE)) * 1000) AS BIGINT) AS lift_milli
    FROM bcnt b
    CROSS JOIN tot t
    JOIN ucnt x ON x.w = string_split(b.bg, ' ')[1]
    JOIN ucnt y ON y.w = string_split(b.bg, ' ')[2]
    ORDER BY lift_milli DESC, bigram LIMIT 50
    """,
)
def q_bigram_pmi_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 bigram collocations by PMI lift
    (p(xy) / (p(x)·p(y)), floored to milli-units) with a min-support
    floor of 5 — the phrase-mining / tokenizer-vocabulary pass of a
    text pipeline.

    Scale: unigram and bigram counting are linear explodes with
    map-side combine; the lift join runs on the *vocabulary* (counts,
    not token occurrences), keyed on the token strings — at 100 TB,
    key those joins on hash64(token) so the shuffle carries 8-byte
    keys.  Corpus totals are a 1-row broadcast.  Top-k is
    TakeOrderedAndProject (no global sort), deterministic via the
    (lift, bigram) order.  The lift itself is one pinned IEEE
    expression — identical association in both engines, so it
    hash-matches bit-for-bit.
    """
    d = _t(spark, sf_dir, "documents")
    toks = d.select(tokens("text").alias("t"))
    uni = toks.select(F.explode("t").alias("w"))
    ucnt = uni.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    big = toks.select(
        F.explode(word_shingles_from_tokens(F.col("t"), 2)).alias("bg")
    )
    bcnt = (
        big.groupBy("bg")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= 5)
    )
    totals = uni.agg(F.count(F.lit(1)).alias("n_uni")).crossJoin(
        big.agg(F.count(F.lit(1)).alias("n_big"))
    )
    parts = F.split(F.col("bg"), " ")
    pairs = bcnt.select(
        "bg",
        "n_pair",
        parts.getItem(0).alias("x"),
        parts.getItem(1).alias("y"),
    )
    ux = ucnt.select(F.col("w").alias("x"), F.col("n").alias("n_x"))
    uy = ucnt.select(F.col("w").alias("y"), F.col("n").alias("n_y"))
    lift = F.floor(
        (
            F.col("n_pair").cast("double")
            * F.col("n_uni").cast("double")
            * F.col("n_uni").cast("double")
        )
        / (
            F.col("n_big").cast("double")
            * F.col("n_x").cast("double")
            * F.col("n_y").cast("double")
        )
        * 1000
    ).cast("long")
    return (
        pairs.join(ux, "x")
        .join(uy, "y")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col("bg").alias("bigram"),
            F.col("n_pair").cast("long").alias("n_pair"),
            F.col("n_x").cast("long").alias("n_x"),
            F.col("n_y").cast("long").alias("n_y"),
            lift.alias("lift_milli"),
        )
        .orderBy(F.desc("lift_milli"), "bigram")
        .limit(50)
    )
