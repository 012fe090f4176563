"""Round-6 batch 67: incremental corpus maintenance across snapshots,
sketch tuning, and retrieval-training mining.

A production corpus is not built once — it is REFRESHED: every ingest
batch must be deduplicated against the existing snapshot (not just
within itself), the merged corpus re-capped per source, the vocabulary
drift between snapshots monitored, and the retriever's training set
mined for hard negatives. These five queries are those operations. The
base/ingest split is a deterministic ``doc_id % 2`` (a fixed
``vec_id < 50`` batch for the mining queries) so both engines see the
identical partition at every scale factor and the differential gate
stays exact.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.text import tokens
from bikes_data_warehouse_etl_spark.plans.extensions import (
    _SQL_COS,
    _SQL_TOKENS,
)
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Incremental dedup: classify an ingest batch against the base snapshot
# ---------------------------------------------------------------------------
_SQL_INCR_DEDUP = """
    WITH d AS (
        SELECT doc_id, source, text, doc_id % 2 AS snap FROM documents),
    base_txt AS (
        SELECT DISTINCT text FROM d WHERE snap = 0),
    ing AS (
        SELECT doc_id, source, text,
               MIN(doc_id) OVER (PARTITION BY text) AS grp_min
        FROM d WHERE snap = 1),
    cls AS (
        SELECT ing.source,
               CASE WHEN b.text IS NOT NULL THEN 'dup_of_base'
                    WHEN ing.doc_id = ing.grp_min THEN 'novel'
                    ELSE 'intra_batch_dup' END AS dedup_class
        FROM ing LEFT JOIN base_txt b ON ing.text = b.text)
    SELECT source, dedup_class, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM cls GROUP BY source, dedup_class
    """


@_q("incremental_dedup_ingest", _SQL_INCR_DEDUP)
def q_incremental_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify every document of an ingest batch against the existing
    base snapshot — THE daily operation of a growing corpus: a new doc
    is a ``dup_of_base`` (its exact content already lives in the
    snapshot), an ``intra_batch_dup`` (novel content, but another doc
    of the same batch keeps it), or ``novel`` (the batch's keeper of
    unseen content). Reported as per-(source, class) counts — the
    ingest health dashboard row.

    Scale: text never shuffles — both sides reduce to a 64-bit
    xxhash64 content key first (the standing ~n²/2⁶⁴ collision
    assumption; the oracle groups on raw text, i.e. EXACT semantics,
    so the hash gate also re-certifies the collision-freeness of the
    hash at every sf). The intra-batch keeper is a min window on the
    8-byte key; the base membership probe is a sort-merge left join
    hash-key-to-hash-key (the base side is corpus-scale — deliberately
    NOT broadcast). Distinct-ing the base side before the join keeps
    the probe 1:1 instead of fanning out per base duplicate.
    """
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.xxhash64("text").alias("h"),
        (F.col("doc_id") % 2).alias("snap"),
    )
    base = d.filter(F.col("snap") == 0).select("h").distinct()
    ing = d.filter(F.col("snap") == 1).withColumn(
        "grp_min", F.min("doc_id").over(Window.partitionBy("h"))
    )
    cls = ing.join(
        base.withColumn("__in_base__", F.lit(1)), "h", "left"
    ).select(
        "source",
        F.when(F.col("__in_base__").isNotNull(), F.lit("dup_of_base"))
        .when(F.col("doc_id") == F.col("grp_min"), F.lit("novel"))
        .otherwise(F.lit("intra_batch_dup"))
        .alias("dedup_class"),
    )
    return cls.groupBy("source", "dedup_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


# ---------------------------------------------------------------------------
# Vocabulary drift between snapshots (top-200 rank displacement)
# ---------------------------------------------------------------------------
_VOCAB_TOP = 200

_SQL_VOCAB_DRIFT = f"""
    WITH tok AS (
        SELECT doc_id % 2 AS snap, unnest({_SQL_TOKENS}) AS w
        FROM documents),
    cnt AS (
        SELECT snap, w, COUNT(*) AS n FROM tok GROUP BY snap, w),
    rk AS (
        SELECT snap, w,
               ROW_NUMBER() OVER (PARTITION BY snap ORDER BY n DESC, w)
                   AS rnk
        FROM cnt),
    top AS (SELECT * FROM rk WHERE rnk <= {_VOCAB_TOP}),
    wide AS (
        SELECT w,
               MAX(CASE WHEN snap = 0 THEN rnk END) AS r0,
               MAX(CASE WHEN snap = 1 THEN rnk END) AS r1
        FROM top GROUP BY w)
    SELECT CAST(SUM(CASE WHEN r0 IS NOT NULL AND r1 IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
           CAST(SUM(CASE WHEN r1 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_only_base,
           CAST(SUM(CASE WHEN r0 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_only_ingest,
           CAST(COALESCE(SUM(CASE WHEN r0 IS NOT NULL AND r1 IS NOT NULL
                    THEN ABS(r0 - r1) END), 0) AS BIGINT) AS rank_disp
    FROM wide
    """


@_q("snapshot_vocab_drift", _SQL_VOCAB_DRIFT)
def q_snapshot_vocab_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary drift between the base and ingest snapshots: compare
    each side's top-200 token vocabulary (count desc, token tiebreak)
    and report the overlap plus the summed rank displacement over the
    common tokens — the cheap canary that fires before a tokenizer or
    quality-classifier trained on the old snapshot quietly degrades on
    the new one.

    Scale: one tokenize pass tagged with the snapshot bit; the census
    shuffle carries (bit, token-string) with map-side combine, the same
    shape as `oov_rate`'s single-pass census. Ranking happens on the
    censused vocabulary (≤ distinct tokens, data-independent of corpus
    row count) and the top-200 sides collapse to a conditional-agg
    pivot on the token — no self-join. Output is one row.
    """
    tok = _t(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 2).alias("snap"),
        F.explode(tokens("text")).alias("w"),
    )
    cnt = tok.groupBy("snap", "w").agg(F.count(F.lit(1)).alias("n"))
    rk = cnt.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("snap").orderBy(F.col("n").desc(), "w")
        ),
    ).filter(F.col("rnk") <= _VOCAB_TOP)
    wide = rk.groupBy("w").agg(
        F.max(F.when(F.col("snap") == 0, F.col("rnk"))).alias("r0"),
        F.max(F.when(F.col("snap") == 1, F.col("rnk"))).alias("r1"),
    )
    both = F.col("r0").isNotNull() & F.col("r1").isNotNull()
    return wide.agg(
        F.sum(F.when(both, 1).otherwise(0)).cast("long").alias("n_common"),
        F.sum(F.when(F.col("r1").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_only_base"),
        F.sum(F.when(F.col("r0").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_only_ingest"),
        F.coalesce(
            F.sum(F.when(both, F.abs(F.col("r0") - F.col("r1")))), F.lit(0)
        )
        .cast("long")
        .alias("rank_disp"),
    )


# ---------------------------------------------------------------------------
# Hard-negative mining for retrieval training
# ---------------------------------------------------------------------------
_HN_QUERIES = 50

_SQL_HARD_NEG = f"""
    WITH q AS (
        SELECT vec_id, embedding, label FROM embeddings
        WHERE vec_id < {_HN_QUERIES}),
    e AS (
        SELECT vec_id, embedding, label FROM embeddings
        WHERE vec_id >= {_HN_QUERIES}),
    scored AS (
        SELECT q.vec_id, q.label,
               e.label AS e_label,
               CAST(FLOOR(round({_SQL_COS}, 6) * 10000) AS BIGINT) AS cos_bp
        FROM e CROSS JOIN q)
    SELECT vec_id, CAST(label AS BIGINT) AS label,
           CAST(MAX(CASE WHEN e_label = label THEN cos_bp END) AS BIGINT)
               AS pos_bp,
           CAST(MAX(CASE WHEN e_label <> label THEN cos_bp END) AS BIGINT)
               AS hard_neg_bp,
           CAST(MAX(CASE WHEN e_label = label THEN cos_bp END)
              - MAX(CASE WHEN e_label <> label THEN cos_bp END) AS BIGINT)
               AS margin_bp
    FROM scored GROUP BY vec_id, label
    """


@_q("hard_negative_margin", _SQL_HARD_NEG)
def q_hard_negative_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining readout for retrieval/contrastive training:
    for a FIXED batch of query vectors (vec_id < 50 — a mining run
    processes a constant query batch per job, whatever the corpus
    size), the best same-label cosine (the positive ceiling), the best
    DIFFERENT-label cosine (the hard negative a contrastive batch
    should include), and the margin between them — queries with small
    or negative margins are where the label space is entangled and
    where mined negatives carry the training signal.

    Scale: the query batch is CONSTANT-SIZE by contract (a %-of-corpus
    sample made total work quadratic-ish: ~1000 queries × 200k vectors
    = 200M interpreted cosine folds = 301 s at sf10; the fixed batch
    is linear in the corpus — 20M folds, and more queries mean more
    JOBS, not a bigger join). The batch is broadcast; the corpus side
    streams ONCE: cosine is a zip_with fold per (corpus row × query),
    and the per-query conditional MAX partial-aggregates map-side, so
    the shuffle carries two longs per (query, label) — never the
    similarity matrix. A query whose label covers the whole complement
    would emit a NULL hard negative (kept NULL in both engines; labels
    here are ~10-way so it does not occur, but the contract is
    explicit).
    """
    from bikes_data_warehouse_etl_spark.functions.vectors import dot, norm

    # norms hoisted to per-ROW projections on each join input (computed
    # once per corpus row / once per query row, not once per PAIR) —
    # the inline cosine paid the two interpreted norm folds per
    # (corpus row × query) pair, 2/3 of the query's fold count
    # (functions/vectors.py r11; same-JVM ABBA 2.5-3.1 s → 1.1-2.2 s,
    # rows identical). The per-pair dot fold is the irreducible term.
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _HN_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.col("label").alias("qlabel"),
        norm(F.col("embedding")).alias("qnrm"),
    )
    corpus = e.filter(F.col("vec_id") >= _HN_QUERIES).select(
        "vec_id",
        "embedding",
        "label",
        norm(F.col("embedding")).alias("enrm"),
    )
    cos = F.when(
        (F.col("enrm") > 0) & (F.col("qnrm") > 0),
        dot(F.col("embedding"), F.col("qvec"))
        / (F.col("enrm") * F.col("qnrm")),
    )
    scored = corpus.crossJoin(F.broadcast(q)).select(
        F.col("qid").alias("vec_id"),
        F.col("qlabel"),
        F.col("label").alias("e_label"),
        F.floor(F.round(cos, 6) * 10000).cast("long").alias("cos_bp"),
    )
    pos = F.max(
        F.when(F.col("e_label") == F.col("qlabel"), F.col("cos_bp"))
    )
    neg = F.max(
        F.when(F.col("e_label") != F.col("qlabel"), F.col("cos_bp"))
    )
    return (
        scored.groupBy("vec_id", "qlabel")
        .agg(
            pos.cast("long").alias("pos_bp"),
            neg.cast("long").alias("hard_neg_bp"),
            (pos - neg).cast("long").alias("margin_bp"),
        )
        .select(
            "vec_id",
            F.col("qlabel").cast("long").alias("label"),
            "pos_bp",
            "hard_neg_bp",
            "margin_bp",
        )
    )


# ---------------------------------------------------------------------------
# LSH band-tuning curve: candidate volume + exact quality per band count
# ---------------------------------------------------------------------------
def _sql_band_curve() -> str:
    from bikes_data_warehouse_etl_spark.plans.pipeline_ops5 import (
        _sql_minhash_accuracy,
    )

    return f"""
    SELECT band_matches,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(FLOOR(CAST(SUM(exact_bp) AS DOUBLE) / COUNT(*)) AS BIGINT)
               AS mean_exact_bp,
           CAST(MIN(exact_bp) AS BIGINT) AS min_exact_bp,
           CAST(MAX(exact_bp) AS BIGINT) AS max_exact_bp
    FROM ({_sql_minhash_accuracy()})
    GROUP BY band_matches
    """


@_q("lsh_band_curve", _sql_band_curve())
def q_lsh_band_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-tuning curve behind `minhash_accuracy`: per
    band-match count (how many of the 4 LSH bands agreed), the
    candidate-pair volume and the exact-Jaccard quality (mean/min/max
    in basis points) of those candidates. Reading this table is how a
    banding config is chosen: if band_matches=1 pairs are numerous and
    low-Jaccard, the bands are too permissive (precision cost); if
    even 4-band pairs have modest Jaccard, the shingle width is wrong.

    Scale: a ≤4-row aggregate over `minhash_accuracy`'s
    candidate-bounded output — every stage is candidate-restricted
    (that query's own scale note), and the mean stays cross-engine
    exact by summing integers and flooring an exact double (|sum| ≪
    2⁵³, the `label_centroids` discipline).
    """
    from bikes_data_warehouse_etl_spark.plans.pipeline_ops5 import (
        q_minhash_accuracy,
    )

    acc = q_minhash_accuracy(spark, sf_dir)
    return acc.groupBy("band_matches").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.floor(F.sum("exact_bp").cast("double") / F.count(F.lit(1)))
        .cast("long")
        .alias("mean_exact_bp"),
        F.min("exact_bp").cast("long").alias("min_exact_bp"),
        F.max("exact_bp").cast("long").alias("max_exact_bp"),
    )


# ---------------------------------------------------------------------------
# Corpus refresh merge: base-stable dedup + per-source quota re-cap
# ---------------------------------------------------------------------------
_REFRESH_QUOTA = 100

_SQL_REFRESH = f"""
    WITH d AS (
        SELECT doc_id, source, text, n_chars, doc_id % 2 AS snap
        FROM documents),
    keep AS (
        SELECT source, n_chars, snap, doc_id,
               ROW_NUMBER() OVER (PARTITION BY text
                                  ORDER BY snap, doc_id) AS dup_rk
        FROM d),
    capped AS (
        SELECT source, n_chars, snap,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS q_rk
        FROM keep WHERE dup_rk = 1)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_from_base,
           CAST(SUM(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_from_ingest
    FROM capped WHERE q_rk <= {_REFRESH_QUOTA}
    GROUP BY source
    """


@_q("corpus_refresh_merge", _SQL_REFRESH)
def q_corpus_refresh_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole corpus-refresh transaction as one plan: union the base
    and ingest snapshots, deduplicate exact content PREFERRING the base
    copy (stable doc identity across refreshes — re-training data
    loaders cache by id), then re-apply the per-source quota (top-100
    by length, deterministic tiebreak) and report per source what the
    refreshed corpus keeps and where it came from.

    Scale: dedup groups on the 64-bit content hash (min_by over
    (snap, doc_id) — text never shuffles; the oracle windows over raw
    text, exact semantics, so the gate re-certifies the hash). The
    quota pass re-uses `source_quota_cap`'s top-k-per-group shape: a
    rank window partitioned by source over (length, id) — at 100 TB
    sources are few and the window input is already quota-bounded per
    source only AFTER ranking, so the exchange is the deduped
    (source, n_chars, snap, id) projection, 24 bytes/row, never the
    bodies.
    """
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "n_chars",
        F.xxhash64("text").alias("h"),
        (F.col("doc_id") % 2).alias("snap"),
    )
    keep = (
        d.groupBy("h")
        .agg(
            F.min(F.struct("snap", "doc_id", "source", "n_chars")).alias(
                "k"
            )
        )
        .select("k.source", "k.n_chars", "k.snap", "k.doc_id")
    )
    capped = keep.withColumn(
        "q_rk",
        F.row_number().over(
            Window.partitionBy("source").orderBy(
                F.col("n_chars").desc(), "doc_id"
            )
        ),
    ).filter(F.col("q_rk") <= _REFRESH_QUOTA)
    return capped.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum(F.when(F.col("snap") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_from_base"),
        F.sum(F.when(F.col("snap") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_from_ingest"),
    )
