"""Round-4 batch 27: distributed sampling and representation-learning
primitives — weighted priority sampling (bottom-k sketch), skip-gram
context-pair generation from event sequences, and one PCA power
iteration over the embedding table.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline. Negative integer division is written as
``sign(x) * (abs(x) div d)`` on BOTH engines — Spark ``div`` truncates
toward zero while DuckDB ``//`` floors, and the sign-abs form makes
them agree without relying on either default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.text import hash64
from bikes_data_warehouse_etl_spark.plans.extensions import _sql_hash64
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Weighted priority sampling: deterministic bottom-k by hash/weight
# ---------------------------------------------------------------------------
_PS_K = 100

_SQL_PRIORITY_SAMPLE = f"""
    WITH p AS (
        SELECT doc_id, source, CAST(n_chars AS BIGINT) AS w,
               {_sql_hash64("CAST(doc_id AS VARCHAR)")}
                   // CAST(n_chars AS BIGINT) AS pkey
        FROM documents WHERE n_chars > 0)
    SELECT doc_id, source, w, CAST(pkey AS BIGINT) AS pkey
    FROM p ORDER BY pkey, doc_id LIMIT {_PS_K}
    """


@_q("priority_sample_weighted", _SQL_PRIORITY_SAMPLE)
def q_priority_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PRIORITY SAMPLE (Duffield-Lund-Thorup bottom-k): every
    document draws a priority key ``hash64(doc_id) // weight`` — the
    60-bit content hash plays the uniform variate, so an item's chance
    of landing in the global bottom-k is ~proportional to its weight
    (here n_chars: char-weighted sampling approximates token-budget-
    proportional corpus subsampling). Fully DETERMINISTIC: the same
    corpus yields the same sample on every run and engine (no RNG
    state), new documents only perturb the boundary — the property
    that makes the sample auditable and the sketch mergeable.

    Scale: the priority key is row-local; global bottom-k is
    TakeOrderedAndProject (per-partition heaps, k-row driver merge) —
    the same mergeable-sketch shape as every top-k here. Per-stratum
    variants partition the heap by the stratum key; weighted
    INCLUSION-PROBABILITY estimators (Horvitz-Thompson) divide by the
    (k+1)-th priority, which is known at merge time.
    """
    # hash is non-negative (60-bit) and weight > 0, so truncating div
    # equals floor — Spark `div` and DuckDB `//` agree without the
    # sign-abs guard the signed queries below need
    p = (
        _t(spark, sf_dir, "documents")
        .where(F.col("n_chars") > 0)
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("w"),
            hash64(F.col("doc_id").cast("string")).alias("h"),
        )
        .select(
            "doc_id",
            "source",
            "w",
            F.expr("h div w").cast("long").alias("pkey"),
        )
    )
    return p.orderBy("pkey", "doc_id").limit(_PS_K)


# ---------------------------------------------------------------------------
# Skip-gram pairs: (target, context) census from event sequences
# ---------------------------------------------------------------------------
_SG_WINDOW = 2

_SQL_SKIPGRAM = f"""
    WITH r AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events)
    SELECT a.event_type AS target, b.event_type AS context,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM r a JOIN r b
      ON a.user_id = b.user_id
     AND abs(a.rn - b.rn) BETWEEN 1 AND {_SG_WINDOW}
    GROUP BY 1, 2
    """


@_q("skipgram_pairs", _SQL_SKIPGRAM)
def q_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKIP-GRAM training-pair generation: every event emits a
    directional (target, context) pair for each neighbor within ±2
    positions of its user's (ts, event_id)-ordered sequence — the
    word2vec data-prep step applied to behavioral sequences (the
    resulting counts feed `negative_samples`' frequency table and an
    embedding trainer). The (ts, event_id) order is the repo-wide
    sub-second tie contract (`events_sessionize`), so both engines
    walk identical sequences.

    Scale: the oracle spells the rank self-join; the Spark twin is the
    BASKET pattern — one collect_list shuffle per user, pairs generated
    ROW-LOCALLY from each bounded sequence (TPC-H-ish per-user event
    counts; a power-user cap or per-day sequence split bounds the
    basket at web scale, exactly like `copurchase_pairs`' basket
    bound), then a map-side-combined census whose key domain is
    |event_types|² — 25 cells here, vocabulary² in general, always
    ≪ the pair stream.
    """
    seq = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("s")
        )
    )
    pairs = seq.select(
        F.explode(
            F.expr(
                f"""flatten(transform(s, (x, i) ->
                    filter(
                      transform(sequence(greatest(0, i - {_SG_WINDOW}),
                                         least(size(s) - 1, i + {_SG_WINDOW})),
                        j -> IF(j <> i,
                                struct(x.event_type AS target,
                                       s[j].event_type AS context),
                                CAST(NULL AS
                                  struct<target: string, context: string>))),
                      p -> p IS NOT NULL)))"""
            )
        ).alias("p")
    ).select("p.target", "p.context")
    return pairs.groupBy("target", "context").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )


# ---------------------------------------------------------------------------
# PCA: one power iteration in integer micro/milli fixed point
# ---------------------------------------------------------------------------
# v0 alternates ±1000 milli by dim parity (a constant v0 of all-ones
# would cancel against near-symmetric embeddings); one iteration maps
# v -> X^T (X v), L∞-normalized back to milli.
_SQL_PCA_POWER = """
    WITH ex AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
               CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                   AS BIGINT) AS micro
        FROM embeddings),
    dots AS (
        SELECT vec_id,
               CAST(SUM(CASE WHEN dim % 2 = 0 THEN micro ELSE -micro END)
                    * 1000 AS BIGINT) AS dot_milli
        FROM ex GROUP BY 1),
    dk AS (
        SELECT vec_id,
               CASE WHEN dot_milli < 0 THEN -((-dot_milli) // 1000)
                    ELSE dot_milli // 1000 END AS dot_k
        FROM dots),
    c AS (
        SELECT ex.dim,
               CAST(SUM(ex.micro * dk.dot_k) AS BIGINT) AS c_raw
        FROM ex JOIN dk ON ex.vec_id = dk.vec_id
        GROUP BY 1),
    m AS (SELECT GREATEST(MAX(ABS(c_raw)) // 1000, 1) AS mm FROM c)
    SELECT dim,
           CAST(CASE WHEN c_raw < 0 THEN -((-c_raw) // mm)
                     ELSE c_raw // mm END AS BIGINT) AS v_milli
    FROM c, m
    """


@_q("pca_power_iter", _SQL_PCA_POWER)
def q_pca_power_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One PCA POWER ITERATION over the embedding table: v1 = X^T(Xv0)
    with v0 = ±1000 milli alternating by dimension parity, re-scaled to
    milli by the L∞ norm — the covariance matrix is NEVER materialized
    (X^T X is dims², X^T(Xv) is two streamed passes), which is the only
    PCA formulation that survives 100 TB. The iterate is the
    convergence primitive: looped with localCheckpoint (the CC /
    `kmeans_lloyd_step` driver pattern) it yields the top principal
    component for `embedding_dim_profile`'s whitening step. All
    arithmetic is fixed-point integer (micro elements, milli vector),
    truncation spelled sign-abs so both engines agree on negatives;
    int64 bounds: |Xv| ≤ 64·6e5·1000 ≈ 4e10, per-row product ≤
    6e5·4e7 = 2.4e13, summed safe to ~4e5 rows per shard — re-scale
    dot_k by another 10³ for corpus-scale shards.

    Scale: two bounded-key shuffles ((vec_id) for dots, (dim) for the
    re-projection — 64 keys); the dot table joins back SHUFFLE-side on
    vec_id (same key as its grouping: one exchange reused), the L∞
    norm is a 1-row broadcast. Nothing is quadratic in dims or rows.
    """
    ex = (
        _t(spark, sf_dir, "embeddings")
        .select("vec_id", F.posexplode("embedding").alias("dim", "v"))
        .select(
            "vec_id",
            "dim",
            F.floor(F.col("v").cast("double") * 1000000)
            .cast("long")
            .alias("micro"),
        )
    )
    dots = ex.groupBy("vec_id").agg(
        (
            F.sum(
                F.when(F.col("dim") % 2 == 0, F.col("micro")).otherwise(
                    -F.col("micro")
                )
            )
            * 1000
        )
        .cast("long")
        .alias("dot_milli")
    )
    dk = dots.select(
        "vec_id",
        F.expr(
            "CASE WHEN dot_milli < 0 THEN -((-dot_milli) div 1000)"
            " ELSE dot_milli div 1000 END"
        ).alias("dot_k"),
    )
    c = (
        ex.join(dk, "vec_id")
        .groupBy("dim")
        .agg(F.sum(F.col("micro") * F.col("dot_k")).cast("long").alias("c_raw"))
    )
    m = c.agg(
        F.greatest(F.expr("max(abs(c_raw)) div 1000"), F.lit(1).cast("long")).alias(
            "mm"
        )
    )
    return c.crossJoin(F.broadcast(m)).select(
        "dim",
        F.expr(
            "CAST(CASE WHEN c_raw < 0 THEN -((-c_raw) div mm)"
            " ELSE c_raw div mm END AS LONG)"
        ).alias("v_milli"),
    )
