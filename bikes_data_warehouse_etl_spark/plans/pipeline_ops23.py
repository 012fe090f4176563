"""Round-4 batch 23: embedding outlier QA (centroid-distance fence)
and time-weighted averages over irregular event streams.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Embedding outliers: squared distance to the label centroid, 4x fence
# ---------------------------------------------------------------------------
_SQL_EMB_OUTLIERS = """
    WITH ex AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) - 1 AS dim,
               CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                    AS BIGINT) AS micro
        FROM embeddings),
    cent AS (
        SELECT label, dim,
               CAST(FLOOR(CAST(SUM(micro) AS DOUBLE) / COUNT(*)) AS BIGINT)
                   AS c_micro
        FROM ex GROUP BY 1, 2),
    dist AS (
        SELECT ex.vec_id, ex.label,
               CAST(SUM((ex.micro - cent.c_micro) * (ex.micro - cent.c_micro))
                   AS BIGINT) AS dist_sq
        FROM ex JOIN cent ON ex.label = cent.label AND ex.dim = cent.dim
        GROUP BY 1, 2),
    per AS (
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST(SUM(dist_sq) // COUNT(*) AS BIGINT) AS mean_dist_sq
        FROM dist GROUP BY 1)
    SELECT per.label, per.n_vecs, per.mean_dist_sq,
           CAST(SUM(CASE WHEN dist.dist_sq > 4 * per.mean_dist_sq
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(SUM(CASE WHEN dist.dist_sq > 4 * per.mean_dist_sq
                         THEN 1 ELSE 0 END) * 10000 // per.n_vecs AS BIGINT)
               AS outlier_bp
    FROM dist JOIN per ON dist.label = per.label
    GROUP BY 1, 2, 3
    """


@_q("embedding_outliers", _SQL_EMB_OUTLIERS)
def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier census: vectors whose squared euclidean
    distance to their LABEL CENTROID exceeds 4x the label's mean
    squared distance (2x in distance terms) — mislabeled or corrupted
    vectors before they poison `label_centroids`-derived prototypes or
    `ivf_topk` training. All arithmetic in integer micro-units
    (`label_centroids` fixes elements to micros BEFORE aggregation, the
    same trick here): dist_sq <= 64 dims x (2e6)^2 ~ 2.6e14 — int64
    headroom to ~2,000 dims. The mean fence (not MAD) is deliberate:
    one aggregate, no distance histogram, integer-exact — and a mean
    fence over SQUARED distances already discounts the inliers' bulk;
    `mad_price_outliers` documents when the histogram-median upgrade
    is worth its cost.

    Scale: the dimension-exploded stream shuffles twice on bounded keys
    ((label, dim) for centroids, (vec_id, label) for distances —
    vec-count-bounded, 3 longs wide); the centroid table
    (|labels| x |dims|) broadcasts into the distance join. Nothing
    global-sorts.
    """
    ex = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("dim", "val"),
    ).select(
        "vec_id",
        "label",
        "dim",
        F.floor(F.col("val").cast("double") * 1000000).cast("long").alias("micro"),
    )
    cent = ex.groupBy("label", "dim").agg(
        F.floor(F.sum("micro").cast("double") / F.count(F.lit(1)))
        .cast("long")
        .alias("c_micro")
    )
    d = F.col("micro") - F.col("c_micro")
    dist = (
        ex.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(F.sum(d * d).cast("long").alias("dist_sq"))
    )
    per = dist.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.expr("sum(dist_sq) div count(*)").cast("long").alias("mean_dist_sq"),
    )
    flagged = (F.col("dist_sq") > 4 * F.col("mean_dist_sq")).cast("long")
    return (
        dist.join(F.broadcast(per), "label")
        .groupBy("label", "n_vecs", "mean_dist_sq")
        .agg(F.sum(flagged).cast("long").alias("n_outliers"))
        .select(
            "label",
            "n_vecs",
            "mean_dist_sq",
            "n_outliers",
            F.expr("n_outliers * 10000 div n_vecs")
            .cast("long")
            .alias("outlier_bp"),
        )
    )


# ---------------------------------------------------------------------------
# Time-weighted average event value per user (irregular sampling)
# ---------------------------------------------------------------------------
_SQL_TWA = """
    WITH e AS (
        SELECT user_id, event_id,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
               epoch_us(ts) AS es
        FROM events),
    seg AS (
        SELECT user_id, cents,
               (LEAD(es) OVER (PARTITION BY user_id ORDER BY es, event_id)
                   - es) // 1000000 AS dur_s
        FROM e),
    held AS (SELECT * FROM seg WHERE dur_s IS NOT NULL AND dur_s > 0)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(dur_s) AS BIGINT) AS total_dur_s,
           CAST(SUM(cents * dur_s) * 1000 // SUM(dur_s)
               AS BIGINT) AS twa_cents_milli
    FROM held GROUP BY user_id
    """


@_q("time_weighted_value", _SQL_TWA)
def q_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of the event `value` per user: each
    reading is held until the user's NEXT event (last-observation-
    carried-forward over irregular sampling), so a value held for an
    hour weighs 3600x one held a second — the correct average for
    sensor-style telemetry, where the naive row mean over-weights
    chatty periods. Weights are whole seconds (second-granularity
    contract; sub-second slivers are dropped with the zero-duration
    segments), products stay ~1e12 per segment — int64-safe through
    the per-user sums — and the milli-cents result is one integer
    division.

    Scale: one user_id shuffle for the LEAD window — the SAME
    partitioning the sessionizer family uses — then a per-user
    aggregate on that exchange's output. At 100 TB the only change is
    windowing per (user, day) with day-boundary segments so state
    stays bounded per key; `gap_fill_daily` holds the densification
    twin of that contract.
    """
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        F.unix_micros("ts").alias("es"),
    )
    seg = e.select(
        "user_id",
        "cents",
        F.expr("(lead(es) over (partition by user_id order by es, event_id)"
               " - es) div 1000000").alias("dur_s"),
    )
    held = seg.filter(F.col("dur_s").isNotNull() & (F.col("dur_s") > 0))
    return held.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum("dur_s").cast("long").alias("total_dur_s"),
        F.expr("sum(cents * dur_s) * 1000 div sum(dur_s)")
        .cast("long")
        .alias("twa_cents_milli"),
    )
