"""Round-4 batch 26: clustering and retrieval-ranking primitives for
the training-data pipeline — one k-means Lloyd iteration over the
embedding table, integer BM25 document ranking, hybrid lexical+semantic
retrieval fused with reciprocal-rank fusion, and a leakage-safe
temporal train/embargo/test split.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline. Tokenization is the shared whitespace-normalized form
(`functions/text.py tokens` == extensions._SQL_TOKENS).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.text import tokens
from bikes_data_warehouse_etl_spark.plans.extensions import _SQL_TOKENS
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# k-means: one Lloyd iteration (assign + recompute + shift) in micros
# ---------------------------------------------------------------------------
_KM_K = 8

_SQL_KMEANS = f"""
    WITH seeds AS (
        SELECT vec_id AS cid, embedding FROM embeddings
        ORDER BY vec_id LIMIT {_KM_K}),
    sx AS (
        SELECT cid, generate_subscripts(embedding, 1) - 1 AS dim,
               CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                   AS BIGINT) AS s_micro
        FROM seeds),
    ex AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
               CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                   AS BIGINT) AS micro
        FROM embeddings),
    dist AS (
        SELECT ex.vec_id, sx.cid,
               CAST(SUM((ex.micro - sx.s_micro) * (ex.micro - sx.s_micro))
                   AS BIGINT) AS dist_sq
        FROM ex JOIN sx ON ex.dim = sx.dim
        GROUP BY 1, 2),
    rn AS (
        SELECT vec_id, cid, dist_sq,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist_sq, cid) AS r
        FROM dist),
    a AS (SELECT vec_id, cid, dist_sq FROM rn WHERE r = 1),
    newc AS (
        SELECT a.cid, ex.dim,
               CAST(FLOOR(CAST(SUM(ex.micro) AS DOUBLE) / COUNT(*))
                   AS BIGINT) AS n_micro
        FROM a JOIN ex ON a.vec_id = ex.vec_id
        GROUP BY 1, 2),
    shift AS (
        SELECT newc.cid,
               CAST(SUM((newc.n_micro - sx.s_micro)
                        * (newc.n_micro - sx.s_micro)) AS BIGINT) AS shift_sq
        FROM newc JOIN sx ON newc.cid = sx.cid AND newc.dim = sx.dim
        GROUP BY 1)
    SELECT a.cid AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(a.dist_sq // 1000) AS BIGINT) AS inertia_kilo,
           shift.shift_sq
    FROM a JOIN shift ON a.cid = shift.cid
    GROUP BY 1, shift.shift_sq
    """


@_q("kmeans_lloyd_step", _SQL_KMEANS)
def q_kmeans_lloyd_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One k-means LLOYD ITERATION over the embedding table: assign
    every vector to its nearest of k=8 seed centroids (the 8 smallest
    vec_ids — deterministic query-by-example seeding), recompute each
    cluster's mean centroid, and report per-cluster size, inertia, and
    centroid SHIFT (squared seed→mean distance — the convergence
    metric a k-means driver loop watches). All distance arithmetic is
    integer micro-units (`embedding_outliers`' trick: elements floored
    to micros BEFORE any aggregation), the argmin is the lexicographic
    min of (dist_sq, cid) so ties break identically cross-engine, and
    inertia sums per-vector ``dist_sq // 1000`` (int64 headroom to
    ~3e7 vectors per cluster at 64 dims; the full driver loop lives in
    the CC/pagerank pattern — localCheckpoint between iterations).

    Scale: seeds are 512 rows broadcast; the dimension-exploded stream
    joins them on ``dim`` (k-way row-local fan-out) and partial-aggs
    map-side before the one (vec_id, cid)-keyed shuffle; the argmin is
    a struct-min aggregate, NOT a per-vector window sort; the new
    centroids are |k|x|dims| rows broadcast back for the shift. A
    1000-executor run shuffles 8 longs per vector and nothing else.
    """
    emb = _t(spark, sf_dir, "embeddings")
    seeds = emb.orderBy("vec_id").limit(_KM_K).select(
        F.col("vec_id").alias("cid"), "embedding"
    )
    sx = seeds.select("cid", F.posexplode("embedding").alias("dim", "v")).select(
        "cid",
        "dim",
        F.floor(F.col("v").cast("double") * 1000000).cast("long").alias("s_micro"),
    )
    ex = emb.select("vec_id", F.posexplode("embedding").alias("dim", "v")).select(
        "vec_id",
        "dim",
        F.floor(F.col("v").cast("double") * 1000000).cast("long").alias("micro"),
    )
    d = F.col("micro") - F.col("s_micro")
    dist = (
        ex.join(F.broadcast(sx), "dim")
        .groupBy("vec_id", "cid")
        .agg(F.sum(d * d).cast("long").alias("dist_sq"))
    )
    a = (
        dist.groupBy("vec_id")
        .agg(F.min(F.struct("dist_sq", "cid")).alias("m"))
        .select("vec_id", F.col("m.cid").alias("cid"), F.col("m.dist_sq").alias("dist_sq"))
    )
    newc = (
        a.join(ex, "vec_id")
        .groupBy("cid", "dim")
        .agg(
            F.floor(F.sum("micro").cast("double") / F.count(F.lit(1)))
            .cast("long")
            .alias("n_micro")
        )
    )
    sh = F.col("n_micro") - F.col("s_micro")
    shift = (
        newc.join(F.broadcast(sx), ["cid", "dim"])
        .groupBy("cid")
        .agg(F.sum(sh * sh).cast("long").alias("shift_sq"))
    )
    return (
        a.groupBy("cid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum(F.expr("dist_sq div 1000")).cast("long").alias("inertia_kilo"),
        )
        .join(F.broadcast(shift), "cid")
        .select(
            F.col("cid").alias("cluster"), "n_vecs", "inertia_kilo", "shift_sq"
        )
    )


# ---------------------------------------------------------------------------
# BM25: integer-exact document ranking for a fixed query term set
# ---------------------------------------------------------------------------
# k1 = 6/5 and b = 3/4 folded into one exact integer quotient:
#   tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
#     = 44*avgdl*tf / (20*avgdl*tf + 6*avgdl + 18*dl)
# idf is the log-free BM25+ style monotone proxy (N-df)*1000//df.
_BM25_TERMS = ("dup", "window", "customer")


def _sql_bm25_scored() -> str:
    """Oracle CTE chain ending in ``s(doc_id, bm25_milli)``."""
    tf_cols = ", ".join(
        f"CAST(len(list_filter({_SQL_TOKENS}, t -> t = '{t}')) AS BIGINT)"
        f" AS tf{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ", ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(_BM25_TERMS))
    )
    score = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN"
        f" (((n_docs - df{i}) * 1000 // df{i}) * (44 * avgdl * tf{i}))"
        f" // (20 * avgdl * tf{i} + 6 * avgdl + 18 * dl)"
        f" ELSE 0 END)"
        for i in range(len(_BM25_TERMS))
    )
    return f"""d AS (
        SELECT doc_id,
               CAST(len(list_filter({_SQL_TOKENS}, t -> t <> '')) AS BIGINT)
                   AS dl,
               {tf_cols}
        FROM documents),
    g AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) // COUNT(*) AS BIGINT) AS avgdl,
               {df_cols}
        FROM d),
    s AS (
        SELECT d.doc_id, CAST({score} AS BIGINT) AS bm25_milli
        FROM d, g)"""


_SQL_BM25_TOPK = f"""
    WITH {_sql_bm25_scored()}
    SELECT doc_id, bm25_milli
    FROM s ORDER BY bm25_milli DESC, doc_id LIMIT 20
    """


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of `_sql_bm25_scored`: per-doc integer BM25 score for
    the fixed term set. Row-local except one 1-row global aggregate
    (N, avgdl, per-term df) broadcast back."""
    toks = tokens(F.col("text"))

    def _tf(term: str):
        # single-arg lambda: a 2-arg lambda would make F.filter pass
        # the ELEMENT INDEX as the second argument
        return F.size(F.filter(toks, lambda t: t == F.lit(term)))

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.filter(toks, lambda t: t != "")).cast("long").alias("dl"),
        *[
            _tf(term).cast("long").alias(f"tf{i}")
            for i, term in enumerate(_BM25_TERMS)
        ],
    )
    g = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr("sum(dl) div count(*)").cast("long").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long"))
            .cast("long")
            .alias(f"df{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    score = None
    for i in range(len(_BM25_TERMS)):
        term_score = F.when(
            F.col(f"tf{i}") > 0,
            F.expr(
                f"(((n_docs - df{i}) * 1000 div df{i}) * (44 * avgdl * tf{i}))"
                f" div (20 * avgdl * tf{i} + 6 * avgdl + 18 * dl)"
            ),
        ).otherwise(F.lit(0).cast("long"))
        score = term_score if score is None else score + term_score
    return d.crossJoin(F.broadcast(g)).select(
        "doc_id", score.cast("long").alias("bm25_milli")
    )


@_q("bm25_top_docs", _SQL_BM25_TOPK)
def q_bm25_top_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact BM25 top-20 for a fixed query term set — the
    lexical side of a retrieval stack (`tfidf_top_terms` profiles the
    corpus; this RANKS documents for a query). k1=1.2 / b=0.75 are
    folded into one exact quotient (44*avgdl*tf) / (20*avgdl*tf +
    6*avgdl + 18*dl) — amplify-before-divide, so no float ever exists —
    and idf is the log-free monotone proxy (N-df)*1000//df (the
    log-smoothed variant needs only a bigger scale constant; `doc_
    surprisal_proxy` shows the bit-length route when log-shape
    matters). Term scores add only when tf > 0, which also guards the
    df division (tf > 0 on any doc implies df >= 1).

    Scale: per-doc tf/dl are row-local over the token array (no
    explode, no per-token shuffle); the corpus statistics are ONE
    1-row aggregate broadcast back; ranking is TakeOrderedAndProject
    (per-partition heap, 20-row driver merge). A real query planner
    would precompute `inverted_index` and touch only posting lists —
    this is the scoring kernel both share.
    """
    return (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.col("bm25_milli").desc(), "doc_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of BM25 and embedding IP
# ---------------------------------------------------------------------------
_RRF_K = 60
_RRF_POOL = 100

_SQL_HYBRID_RRF = f"""
    WITH {_sql_bm25_scored()},
    lex AS (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY bm25_milli DESC, doc_id)
                   AS BIGINT) AS r_lex
        FROM s ORDER BY r_lex LIMIT {_RRF_POOL}),
    qx AS (
        SELECT generate_subscripts(embedding, 1) - 1 AS dim,
               CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                   AS BIGINT) AS q_micro
        FROM embeddings WHERE vec_id = 0),
    vx AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
               CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                   AS BIGINT) AS micro
        FROM embeddings),
    ip AS (
        SELECT vx.vec_id,
               CAST(SUM(vx.micro * qx.q_micro) AS BIGINT) AS ip_micro
        FROM vx JOIN qx ON vx.dim = qx.dim
        GROUP BY 1),
    sem AS (
        SELECT vec_id,
               CAST(ROW_NUMBER() OVER (ORDER BY ip_micro DESC, vec_id)
                   AS BIGINT) AS r_sem
        FROM ip ORDER BY r_sem LIMIT {_RRF_POOL})
    SELECT COALESCE(lex.doc_id, sem.vec_id) AS id,
           CAST(COALESCE(1000000 // ({_RRF_K} + r_lex), 0)
                + COALESCE(1000000 // ({_RRF_K} + r_sem), 0) AS BIGINT)
               AS rrf_micro,
           CAST(COALESCE(r_lex, 0) AS BIGINT) AS r_lex,
           CAST(COALESCE(r_sem, 0) AS BIGINT) AS r_sem
    FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.vec_id
    ORDER BY rrf_micro DESC, id LIMIT 20
    """


@_q("hybrid_rrf_topk", _SQL_HYBRID_RRF)
def q_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID retrieval: fuse the lexical BM25 ranking
    (`bm25_top_docs`' scoring kernel) with a semantic embedding ranking
    (integer-micro inner product against the vec_id-0 query vector —
    query-by-example, the doc/vec id spaces are 1:1) via RECIPROCAL
    RANK FUSION: score = sum over systems of 1e6 // (60 + rank), the
    standard k=60 RRF. Absent-from-pool contributes 0. Ranks, products
    and fusion scores are all integers, so both engines agree bit-for-
    bit; rank ties cannot exist (row_number with id tie-break).

    Scale: each system's pool is top-100 under a deterministic total
    order — Spark takes it with TakeOrderedAndProject (per-partition
    heaps, no global sort) and ranks INSIDE the 100-row pool, which
    equals the oracle's rank-then-limit because both use the same total
    order; the fusion is a 100x100 full outer join on the driver-sized
    pools. Nothing in the plan scales with corpus size except the two
    scans. The IP is a row-local zip-fold over the micro arrays (no
    posexplode — the 64-wide fold stays inside codegen).
    """
    lex_pool = (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.col("bm25_milli").desc(), "doc_id")
        .limit(_RRF_POOL)
    )
    lex = lex_pool.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("bm25_milli").desc(), "doc_id"))
        .cast("long")
        .alias("r_lex"),
    )
    emb = _t(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").collect()
    # 1-row bounded collect (the `ivf_topk` centroid precedent); floor
    # matches the engine-side FLOOR(x*1e6) micro cast for negatives too
    qv = [float(x) for x in qrow[0]["embedding"]]
    q_micro = F.array(
        *[F.lit(int(math.floor(v * 1000000))).cast("long") for v in qv]
    )
    v_micro = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * 1000000).cast("long"),
    )
    ip = emb.select(
        "vec_id",
        F.aggregate(
            F.zip_with(v_micro, q_micro, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("ip_micro"),
    )
    sem_pool = ip.orderBy(F.col("ip_micro").desc(), "vec_id").limit(_RRF_POOL)
    sem = sem_pool.select(
        "vec_id",
        F.row_number()
        .over(Window.orderBy(F.col("ip_micro").desc(), "vec_id"))
        .cast("long")
        .alias("r_sem"),
    )
    fused = lex.join(sem, lex["doc_id"] == sem["vec_id"], "full_outer")
    rrf = F.coalesce(
        F.expr(f"1000000 div ({_RRF_K} + r_lex)"), F.lit(0).cast("long")
    ) + F.coalesce(
        F.expr(f"1000000 div ({_RRF_K} + r_sem)"), F.lit(0).cast("long")
    )
    return (
        fused.select(
            F.coalesce(F.col("doc_id"), F.col("vec_id")).alias("id"),
            rrf.cast("long").alias("rrf_micro"),
            F.coalesce(F.col("r_lex"), F.lit(0)).cast("long").alias("r_lex"),
            F.coalesce(F.col("r_sem"), F.lit(0)).cast("long").alias("r_sem"),
        )
        .orderBy(F.col("rrf_micro").desc(), "id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Temporal split with embargo: leakage-safe train/test on the calendar
# ---------------------------------------------------------------------------
_SQL_TEMPORAL_SPLIT = """
    WITH days AS (
        SELECT o_orderdate AS day, CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY 1),
    r AS (
        SELECT day, n, ROW_NUMBER() OVER (ORDER BY day) AS rk,
               (SELECT COUNT(*) FROM days) AS nd
        FROM days),
    lab AS (
        SELECT day, n,
               CASE WHEN rk * 10 <= nd * 7 THEN 'train'
                    WHEN rk * 10 > nd * 8 THEN 'test'
                    ELSE 'embargo' END AS split
        FROM r)
    SELECT split, CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(n) AS BIGINT) AS n_orders,
           MIN(day) AS min_day, MAX(day) AS max_day
    FROM lab GROUP BY 1
    """


@_q("temporal_split_embargo", _SQL_TEMPORAL_SPLIT)
def q_temporal_split_embargo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PURGED temporal split: the first 70% of distinct order DAYS are
    train, the last 20% test, and the 10% between is an EMBARGO band
    excluded from both — the forecasting-correct alternative to
    `train_split_assign`'s content-hash split, which is leakage-safe
    for exchangeable documents but NOT for time series (a random split
    lets the model interpolate its own test horizon; the embargo also
    absorbs label-window overlap at the boundary, Lopez de Prado's
    purged k-fold idea in its simplest form). Boundaries are integer
    rank arithmetic (rk*10 vs nd*7 / nd*8) — no float percentile, no
    off-by-one disagreement between engines.

    Scale: the split domain is DISTINCT CALENDAR DAYS, bounded by the
    calendar itself (~2.4k rows here, ~37k for a century) regardless of
    fact volume — so the global rank window is safe at any data scale,
    unlike row-domain windows (`length_outlier_gate` documents the
    histogram upgrade those need). One map-side-combined day rollup,
    one tiny window, one broadcast-sized label table; assigning the
    label back to FACTS (when materializing the split) is a broadcast
    join on o_orderdate.
    """
    days = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    nd = days.agg(F.count(F.lit(1)).cast("long").alias("nd"))
    r = days.crossJoin(F.broadcast(nd)).select(
        "day",
        "n",
        "nd",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("rk"),
    )
    lab = r.select(
        "day",
        "n",
        F.when(F.col("rk") * 10 <= F.col("nd") * 7, F.lit("train"))
        .when(F.col("rk") * 10 > F.col("nd") * 8, F.lit("test"))
        .otherwise(F.lit("embargo"))
        .alias("split"),
    )
    return lab.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("n").cast("long").alias("n_orders"),
        F.min("day").alias("min_day"),
        F.max("day").alias("max_day"),
    )
