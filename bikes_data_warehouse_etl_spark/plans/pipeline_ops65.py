"""Round-6 batch 65: exact substring-span duplication census and a
SemDeDup-style semantic-dedup threshold curve.

Two training-data-curation reporting operators the corpus families did
not yet cover: span-level exact duplication (the statistic behind
suffix-array "train-data dedup" pipelines — what fraction of each
source's 8-token spans appear elsewhere in the corpus) and the
keep/drop savings curve of embedding-space semantic dedup at several
cosine thresholds (choosing tau IS the task; the curve is the tool).

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.text import (
    tokens,
    word_shingles_from_tokens,
)
from bikes_data_warehouse_etl_spark.plans.extensions import (
    _SQL_COS,
    _SQL_TOKENS,
)
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Exact substring-span duplication census (8-token grams, per source)
# ---------------------------------------------------------------------------
_SQL_DUP_SPAN = f"""
    WITH t AS (SELECT doc_id, source, {_SQL_TOKENS} AS tk FROM documents),
    inst AS (
        SELECT doc_id, source,
               unnest(list_transform(generate_series(1, len(tk) - 7),
                      i -> array_to_string(tk[i:i+7], ' '))) AS h
        FROM t),
    g AS (SELECT doc_id, source, h, COUNT(*) AS k
          FROM inst GROUP BY 1, 2, 3),
    wc AS (SELECT doc_id, source, k, SUM(k) OVER (PARTITION BY h) AS c
           FROM g),
    pd AS (
        SELECT doc_id, source,
               SUM(k) AS n_spans,
               SUM(CASE WHEN c >= 2 THEN k ELSE 0 END) AS n_dup
        FROM wc GROUP BY 1, 2)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(CASE WHEN n_dup > 0 THEN 1 END) AS BIGINT)
               AS docs_with_dup,
           CAST(SUM(n_spans) AS BIGINT) AS span_total,
           CAST(SUM(n_dup) AS BIGINT) AS dup_span_total,
           CAST(SUM(n_dup) * 10000 // SUM(n_spans) AS BIGINT)
               AS dup_frac_bp
    FROM pd GROUP BY source
    """


@_q("dup_span_fraction", _SQL_DUP_SPAN)
def q_dup_span_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level EXACT duplication census: for every 8-token span
    (word 8-gram) in the corpus, is the identical span present anywhere
    else — same doc or another doc? Reported per source: docs counted
    (those with >= 8 tokens), docs containing at least one duplicated
    span, total spans, duplicated-span instances, and the duplicated
    fraction in basis points. This is the reporting statistic behind
    suffix-array exact-substring train-data dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): a span
    duplicated across documents is exactly what that pipeline would cut,
    so ``dup_frac_bp`` is the fraction of the corpus such a pass
    removes — computed here with hashed fixed-width grams instead of a
    suffix array, the standard distributed approximation.

    Scale: the expensive part — tokenize + 8-gram build + explode —
    runs EXACTLY ONCE; the naive formulation (global dup census, then
    join the instances back against it) evaluates that scan once per
    consumer, measured 2x the cost at every sf. Instead the instance
    stream collapses immediately to per-(doc, span) counts ``k`` (one
    combine-friendly shuffle — within-doc repeats merge map-side),
    the global span frequency is a window ``sum(k) over (partition by
    h)`` on those REDUCED rows (second shuffle, keyed by the span),
    and the per-doc/per-source rollups are successively tiny. Spans
    travel as xxhash64 LONGS through both shuffles — 8 bytes instead
    of the ~50-byte 8-gram strings (a counting census tolerates
    xxhash64's ~2^-64 pairwise collision odds; the ORACLE keeps the
    raw strings, i.e. exact semantics, so every hash match
    re-certifies collision-freeness at that sf — the
    `incremental_dedup_ingest` convention). Measured 32.9 s → ~21 s
    at sf10 (same-JVM warm passes), and the strings now die in the
    map stage that builds them.
    Document text itself never shuffles, and nothing is quadratic:
    work is linear in total token count at any corpus size, the same
    budget tokenization itself costs. ``widen_scan`` lifts the
    tokenize+explode stage off the single split the small testdata
    file provides (one core did 100% of the 8-gram build; measured
    ~5.2 s of this query's sf0.1 floor) and is a no-op at production
    split counts, keeping the scan stage exchange-free at scale.
    """
    from bikes_data_warehouse_etl_spark.sources.parquet import widen_scan

    d = widen_scan(
        _t(spark, sf_dir, "documents").select("doc_id", "source", "text"),
        spark,
    ).select("doc_id", "source", tokens(F.col("text")).alias("tk"))
    sh = d.select(
        "doc_id",
        "source",
        word_shingles_from_tokens(F.col("tk"), k=8).alias("sh"),
    )
    inst = sh.select(
        "doc_id", "source", F.explode("sh").alias("s")
    ).select("doc_id", "source", F.xxhash64("s").alias("h"))
    g = inst.groupBy("doc_id", "source", "h").agg(
        F.count(F.lit(1)).alias("k")
    )
    wc = g.select(
        "doc_id",
        "source",
        "k",
        F.sum("k").over(Window.partitionBy("h")).alias("c"),
    )
    per_doc = wc.groupBy("doc_id", "source").agg(
        F.sum("k").cast("long").alias("n_spans"),
        F.sum(F.when(F.col("c") >= 2, F.col("k")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_dup"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count(F.when(F.col("n_dup") > 0, 1))
            .cast("long")
            .alias("docs_with_dup"),
            F.sum("n_spans").cast("long").alias("span_total"),
            F.sum("n_dup").cast("long").alias("dup_span_total"),
        )
        .select(
            "source",
            "n_docs",
            "docs_with_dup",
            "span_total",
            "dup_span_total",
            F.expr("dup_span_total * 10000 div span_total")
            .cast("long")
            .alias("dup_frac_bp"),
        )
    )


# ---------------------------------------------------------------------------
# SemDeDup-style semantic-dedup savings curve over embeddings
# ---------------------------------------------------------------------------
_SEM_TAUS = (2500, 5000, 7500)

_SQL_SEMANTIC_DEDUP = f"""
    WITH b AS (
        SELECT vec_id, embedding,
               CAST(list_sum(list_transform(generate_series(1, 12),
                    i -> CASE WHEN embedding[i] > 0 THEN (1 << (i-1))
                         ELSE 0 END)) AS BIGINT) AS bucket
        FROM embeddings),
    p AS (
        SELECT q.vec_id AS id_b,
               CAST(FLOOR(round({_SQL_COS}, 6) * 10000) AS BIGINT) AS cos_bp
        FROM b e JOIN b q ON e.bucket = q.bucket AND e.vec_id < q.vec_id
        WHERE FLOOR(round({_SQL_COS}, 6) * 10000) >= {_SEM_TAUS[0]}),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM embeddings),
    taus AS (SELECT CAST(unnest([{', '.join(map(str, _SEM_TAUS))}])
                         AS BIGINT) AS tau_bp)
    SELECT taus.tau_bp, t.n_total,
           CAST(COUNT(DISTINCT p.id_b) AS BIGINT) AS n_dropped,
           CAST(t.n_total - COUNT(DISTINCT p.id_b) AS BIGINT) AS n_kept,
           CAST(COUNT(DISTINCT p.id_b) * 10000 // t.n_total AS BIGINT)
               AS drop_bp
    FROM taus CROSS JOIN t LEFT JOIN p ON p.cos_bp >= taus.tau_bp
    GROUP BY taus.tau_bp, t.n_total
    """


@_q("semantic_dedup_curve", _SQL_SEMANTIC_DEDUP)
def q_semantic_dedup_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-dedup savings curve (SemDeDup, Abbas et al. 2023): a
    vector is DROPPED at threshold tau if a lower-id vector in its
    12-bit sign-LSH bucket has cosine >= tau — the deterministic
    keep-lowest-id greedy rule — and the curve reports kept/dropped
    counts at tau in {0.25, 0.50, 0.75} basis points. Picking tau is
    the actual curation decision; this query IS the evidence for it
    (SemDeDup's clusters are k-means cells; sign-LSH buckets play that
    role here with no training step, same within-cell pairwise rule).

    Scale: candidate pairs come from the proven basket form
    (``knn_basket_bucketed`` — one shuffle collects each bucket's
    vectors once, all in-bucket pairs scored row-locally; no vector is
    ever duplicated per pair), thresholded at the LOWEST tau so the
    threshold fan-out (explode over 3 taus) runs on the already-small
    candidate pair set, never the corpus. The distinct-dropped count
    per tau groups on a 3-value key; totals are a 1-row aggregate
    broadcast back. Work beyond the bucket shuffle is bounded by
    in-bucket pair count — the same budget ``embedding_neardup``
    already pays, measured linear on the 100x ladder.
    """
    from bikes_data_warehouse_etl_spark.operators.similarity import (
        knn_basket_bucketed,
    )

    emb = _t(spark, sf_dir, "embeddings")
    pairs = knn_basket_bucketed(emb, n_bits=12, min_cos_bp=_SEM_TAUS[0])
    tau_arr = F.array(*[F.lit(t).cast("long") for t in _SEM_TAUS])
    tot = emb.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    taus = tot.select(F.explode(tau_arr).alias("tau_bp"), "n_total")
    dropped = (
        pairs.select(F.explode(tau_arr).alias("tau_bp"), "id_b", "cos_bp")
        .filter(F.col("cos_bp") >= F.col("tau_bp"))
        .groupBy("tau_bp")
        .agg(F.count_distinct("id_b").cast("long").alias("nd"))
    )
    return (
        taus.join(dropped, "tau_bp", "left")
        .select(
            "tau_bp",
            "n_total",
            F.coalesce(F.col("nd"), F.lit(0)).cast("long").alias("n_dropped"),
            (F.col("n_total") - F.coalesce(F.col("nd"), F.lit(0)))
            .cast("long")
            .alias("n_kept"),
            F.expr("coalesce(nd, 0) * 10000 div n_total")
            .cast("long")
            .alias("drop_bp"),
        )
    )
