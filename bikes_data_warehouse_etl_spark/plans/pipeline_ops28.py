"""Round-4 batch 28: evaluation harnesses and language-model
estimation — ANN recall measurement against the exact baseline,
label-conditional term affinity, add-one-smoothed bigram conditional
probabilities, and forecast-baseline MAPE scoring.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic (floats only where the established rounded-cosine contract
already applies), identical aliases both sides, bounded key domains,
scale notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.text import tokens
from bikes_data_warehouse_etl_spark.functions.vectors import (
    dot,
    norm,
    sign_lsh_bucket,
)
from bikes_data_warehouse_etl_spark.plans.extensions import _SQL_COS, _SQL_TOKENS
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# ANN recall@10: LSH bucket probe vs exact brute force, 8 queries
# ---------------------------------------------------------------------------
_AR_NQ = 8  # query vectors: vec_id < 8
_AR_K = 10
_AR_BITS = 8

_SQL_ANN_RECALL = f"""
    WITH qs AS (
        SELECT vec_id AS qid, embedding AS qemb,
               CAST(list_sum(list_transform(generate_series(1, {_AR_BITS}),
                    i -> CASE WHEN embedding[i] > 0 THEN (1 << (i-1))
                         ELSE 0 END)) AS BIGINT) AS qbucket
        FROM embeddings WHERE vec_id < {_AR_NQ}),
    cand AS (
        SELECT qs.qid, qs.qbucket, e.vec_id,
               round({_SQL_COS.replace('q.embedding', 'qs.qemb')}, 6) AS cos_sim,
               CAST(list_sum(list_transform(generate_series(1, {_AR_BITS}),
                    i -> CASE WHEN e.embedding[i] > 0 THEN (1 << (i-1))
                         ELSE 0 END)) AS BIGINT) AS bucket
        FROM embeddings e, qs
        WHERE e.vec_id <> qs.qid),
    exact AS (
        SELECT qid, vec_id FROM (
            SELECT qid, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY cos_sim DESC, vec_id) AS rn
            FROM cand) WHERE rn <= {_AR_K}),
    approx AS (
        SELECT qid, vec_id FROM (
            SELECT qid, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY cos_sim DESC, vec_id) AS rn
            FROM cand WHERE bucket = qbucket) WHERE rn <= {_AR_K})
    SELECT exact.qid,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(SUM(CASE WHEN approx.vec_id IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_hit,
           CAST(SUM(CASE WHEN approx.vec_id IS NOT NULL THEN 1 ELSE 0 END)
               * 10000 // COUNT(*) AS BIGINT) AS recall_bp
    FROM exact LEFT JOIN approx
      ON exact.qid = approx.qid AND exact.vec_id = approx.vec_id
    GROUP BY 1
    """


@_q("ann_recall_eval", _SQL_ANN_RECALL)
def q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN RECALL HARNESS: for 8 query vectors, recall@10 of the 8-bit
    sign-LSH bucket probe (`ann_lsh_topk`'s strategy) against the exact
    brute-force top-10 (`embedding_topk`'s) — the measurement that
    decides whether an index's speed is worth its misses, run as a
    query so it can gate an index rollout the way `minhash_accuracy`
    gates the text-LSH parameters. Cosines are the established
    round-6dp contract; list membership and recall are integers.

    Scale: this evaluates by DESIGN on a bounded query sample (8
    here), so the exact arm is |sample| x N — a broadcast of 8 query
    vectors riding the one scan, NOT an N² self-join; per-query top-10
    is a window over the sample's candidates ((qid)-partitioned). The
    approx arm reuses the same scored stream filtered to the probe
    bucket, and the recall join touches 80 rows. At 100 TB the exact
    arm is the only full-scan term and amortizes across the whole
    query sample in one pass.
    """
    # norms hoisted to per-ROW projections on both cross-join inputs —
    # the inline cosine re-folded both norms per (row × query) pair
    # (vectors.py r11; ABBA 0.85-2.3 s → 0.64-1.1 s, rows identical)
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < _AR_NQ).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qemb"),
        sign_lsh_bucket("embedding", n_bits=_AR_BITS).alias("qbucket"),
        norm(F.col("embedding")).alias("qnrm"),
    )
    base = emb.select(
        "vec_id",
        "embedding",
        norm(F.col("embedding")).alias("enrm"),
        sign_lsh_bucket("embedding", n_bits=_AR_BITS).alias("bucket"),
    )
    cos = F.when(
        (F.col("enrm") > 0) & (F.col("qnrm") > 0),
        dot(F.col("embedding"), F.col("qemb"))
        / (F.col("enrm") * F.col("qnrm")),
    )
    cand = (
        base.crossJoin(F.broadcast(qs))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "qbucket",
            "vec_id",
            F.round(cos, 6).alias("cos_sim"),
            "bucket",
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), "vec_id")
    exact = (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _AR_K)
        .select("qid", "vec_id")
    )
    approx = (
        cand.where(F.col("bucket") == F.col("qbucket"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _AR_K)
        .select(F.col("qid").alias("a_qid"), F.col("vec_id").alias("a_vid"))
    )
    hit = (F.col("a_vid").isNotNull()).cast("long")
    return (
        exact.join(
            approx,
            (F.col("qid") == F.col("a_qid")) & (F.col("vec_id") == F.col("a_vid")),
            "left",
        )
        .groupBy("qid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_exact"),
            F.sum(hit).cast("long").alias("n_hit"),
        )
        .select(
            "qid",
            "n_exact",
            "n_hit",
            F.expr("n_hit * 10000 div n_exact").cast("long").alias("recall_bp"),
        )
    )


# ---------------------------------------------------------------------------
# Label-term affinity: which terms characterize each embedding label
# ---------------------------------------------------------------------------
_LT_MIN_DF = 5
_LT_TOP = 3

_SQL_LABEL_TERM = f"""
    WITH dt AS (
        SELECT DISTINCT doc_id, term FROM (
            SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents)
        WHERE term <> ''),
    lab AS (
        SELECT dt.doc_id, dt.term, e.label
        FROM dt JOIN embeddings e ON dt.doc_id = e.vec_id),
    n_all AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
              FROM documents),
    df_t AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM dt GROUP BY 1),
    n_l AS (SELECT label, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nl
            FROM lab GROUP BY 1),
    df_tl AS (
        SELECT label, term, CAST(COUNT(*) AS BIGINT) AS dfl
        FROM lab GROUP BY 1, 2),
    lift AS (
        SELECT df_tl.label, df_tl.term, df_tl.dfl,
               CAST(df_tl.dfl * n_all.n_docs * 1000
                    // (df_t.df * n_l.nl) AS BIGINT) AS lift_milli
        FROM df_tl
        JOIN df_t ON df_tl.term = df_t.term
        JOIN n_l ON df_tl.label = n_l.label
        CROSS JOIN n_all
        WHERE df_tl.dfl >= {_LT_MIN_DF})
    SELECT label, term, dfl, lift_milli FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                   ORDER BY lift_milli DESC, term) AS rn
        FROM lift) WHERE rn <= {_LT_TOP}
    """


@_q("label_term_affinity", _SQL_LABEL_TERM)
def q_label_term_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTER INTERPRETATION: the top-3 terms by LIFT for each
    embedding label — lift = P(term|label) / P(term) in milli, the
    association score that names what a cluster is "about" (the
    readout you run after `kmeans_lloyd_step` / `label_centroids` to
    turn cluster ids into human labels). Document-term incidence is
    DISTINCT presence (not tf), the cross-modal join rides the 1:1
    doc_id = vec_id contract (`hybrid_rrf_topk`'s), and lift is
    integer-exact with a df >= 5 support floor killing
    one-doc-wonder terms.

    Scale: doc-term incidence shuffles on the term (vocabulary-keyed,
    like `tfidf_top_terms`); the label join broadcasts the |labels|
    table; lift joins are vocabulary-sized; top-3-per-label is a
    window over |labels| x |vocab| rows — all bounded domains, none
    proportional to corpus size except the tokenize scan.
    """
    dt = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .where(F.col("term") != "")
        .distinct()
    )
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "label"
    )
    lab = dt.join(emb, "doc_id")
    n_all = _t(spark, sf_dir, "documents").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs")
    )
    df_t = dt.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n_l = lab.groupBy("label").agg(
        F.countDistinct("doc_id").cast("long").alias("nl")
    )
    df_tl = lab.groupBy("label", "term").agg(
        F.count(F.lit(1)).cast("long").alias("dfl")
    )
    lift = (
        df_tl.where(F.col("dfl") >= _LT_MIN_DF)
        .join(df_t, "term")
        .join(F.broadcast(n_l), "label")
        .crossJoin(F.broadcast(n_all))
        .select(
            "label",
            "term",
            "dfl",
            F.expr("dfl * n_docs * 1000 div (df * nl)")
            .cast("long")
            .alias("lift_milli"),
        )
    )
    w = Window.partitionBy("label").orderBy(F.col("lift_milli").desc(), "term")
    return (
        lift.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _LT_TOP)
        .select("label", "term", "dfl", "lift_milli")
    )


# ---------------------------------------------------------------------------
# Bigram LM estimation: add-one-smoothed conditional probabilities
# ---------------------------------------------------------------------------
_SQL_BIGRAM_LM = f"""
    WITH ft AS (
        SELECT doc_id, list_filter({_SQL_TOKENS}, t -> t <> '') AS toks
        FROM documents),
    bg AS (
        SELECT p[1] AS w1, p[2] AS w2 FROM (
            SELECT unnest(list_filter(list_zip(toks, toks[2:]),
                          p -> p[1] IS NOT NULL AND p[2] IS NOT NULL)) AS p
            FROM ft)),
    c12 AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_bigram
        FROM bg GROUP BY 1, 2),
    c1 AS (
        SELECT w1, CAST(SUM(n_bigram) AS BIGINT) AS n_start
        FROM c12 GROUP BY 1),
    v AS (
        SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS vocab FROM (
            SELECT unnest(toks) AS t FROM ft))
    SELECT c12.w1, c12.w2, c12.n_bigram,
           CAST((c12.n_bigram + 1) * 1000
                // (c1.n_start + v.vocab) AS BIGINT) AS p_milli
    FROM c12 JOIN c1 ON c12.w1 = c1.w1 CROSS JOIN v
    ORDER BY c12.n_bigram DESC, c12.w1, c12.w2 LIMIT 25
    """


@_q("bigram_cond_prob", _SQL_BIGRAM_LM)
def q_bigram_cond_prob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIGRAM LANGUAGE-MODEL estimation: add-one-smoothed conditional
    probability P(w2|w1) = (c(w1,w2)+1) / (c(w1·)+V) in milli for the
    25 most frequent bigrams — the counting step of n-gram LM training
    (`bigram_pmi_top` measures association; this estimates the
    PREDICTIVE distribution a perplexity scorer consumes, and the
    smoothing is what keeps unseen continuations from zeroing a
    document's score). The conditioning count is the bigram-START sum
    (marginalizing c12), so numerator and denominator are exactly
    consistent; everything is integer.

    Scale: bigrams are generated ROW-LOCALLY (zip of the token array
    with its own tail — no posexplode self-join); the census shuffles
    on the (w1, w2) key — vocabulary²-bounded, ≪ the pair stream after
    map-side combine; the unigram table derives from the bigram table
    (no second scan); V is a 1-row broadcast. Heap top-25.
    """
    ft = _t(spark, sf_dir, "documents").select(
        F.filter(tokens(F.col("text")), lambda t: t != "").alias("toks")
    )
    bg = ft.select(
        F.explode(
            F.filter(
                F.zip_with(
                    F.col("toks"),
                    F.slice(
                        F.col("toks"), 2, F.greatest(F.size("toks") - 1, F.lit(0))
                    ),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                ),
                lambda p: p["w1"].isNotNull() & p["w2"].isNotNull(),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    c12 = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigram")
    )
    c1 = c12.groupBy("w1").agg(F.sum("n_bigram").cast("long").alias("n_start"))
    v = ft.select(F.explode("toks").alias("t")).agg(
        F.countDistinct("t").cast("long").alias("vocab")
    )
    return (
        c12.join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "w1",
            "w2",
            "n_bigram",
            F.expr("(n_bigram + 1) * 1000 div (n_start + vocab)")
            .cast("long")
            .alias("p_milli"),
        )
        .orderBy(F.col("n_bigram").desc(), "w1", "w2")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Forecast-baseline evaluation: naive-1 and seasonal-naive-7 MAPE
# ---------------------------------------------------------------------------
_SQL_NAIVE_MAPE = """
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS BIGINT) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS cents
        FROM orders GROUP BY 1),
    scored AS (
        SELECT 'naive_1' AS model, a.day,
               abs(a.cents - f.cents) * 10000 // a.cents AS ape_bp
        FROM daily a JOIN daily f ON f.day = a.day - 1
        UNION ALL
        SELECT 'seasonal_naive_7' AS model, a.day,
               abs(a.cents - f.cents) * 10000 // a.cents AS ape_bp
        FROM daily a JOIN daily f ON f.day = a.day - 7)
    SELECT model, CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(ape_bp) // COUNT(*) AS BIGINT) AS mape_bp
    FROM scored GROUP BY 1
    """


@_q("seasonal_naive_mape", _SQL_NAIVE_MAPE)
def q_seasonal_naive_mape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORECAST-BASELINE scoring: MAPE (in basis points) of the two
    baselines every real forecaster must beat — naive-1 (yesterday's
    revenue) and seasonal-naive-7 (same weekday last week) — over the
    daily revenue series. Forecast days with no actual (calendar gaps)
    drop out via the equi-join on the exact day offset, the
    gap-robust form `yoy_revenue` uses instead of row-counting LAG;
    per-day APE and the mean are integer (amplify-by-10⁴ before the
    division, sum-then-divide for the mean).

    Scale: the day-domain rollup is calendar-bounded
    (`temporal_split_embargo`'s argument), so the two self-joins and
    the final 2-row aggregate are all on tiny tables no matter the
    fact volume; the one full scan is the daily rollup itself,
    map-side combined on ~thousands of day keys.
    """
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("day")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    a = daily.select(F.col("day").alias("a_day"), F.col("cents").alias("a_cents"))

    def _scored(offset: int, model: str) -> DataFrame:
        f = daily.select(
            (F.col("day") + offset).alias("a_day"), F.col("cents").alias("f_cents")
        )
        return a.join(f, "a_day").select(
            F.lit(model).alias("model"),
            F.expr("abs(a_cents - f_cents) * 10000 div a_cents").alias("ape_bp"),
        )

    scored = _scored(1, "naive_1").unionAll(_scored(7, "seasonal_naive_7"))
    return scored.groupBy("model").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.expr("sum(ape_bp) div count(*)").cast("long").alias("mape_bp"),
    )
