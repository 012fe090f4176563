"""Training-data pipeline operators, round 2 batch 3: interval-sweep
concurrency, sequence transition modelling, PII redaction, keep-best
dedup, and class-prototype similarity.

Same contract as `pipeline_ops.py` / `pipeline_ops2.py`: every query is
a (Spark plan, DuckDB oracle) pair expected to hash-match bit-for-bit,
so cross-engine arithmetic stays integer-exact (ppm / bp / micro
units), and the few deliberate float steps are single IEEE expressions
evaluated in a pinned order in both engines.

Scale notes per docstring; shared theme: reduce to a bounded key space
*before* any windowed/quadratic step, so the expensive stage's input is
independent of raw row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.text import fingerprint
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Interval sweep: concurrently-active orders per day
# ---------------------------------------------------------------------------
@_q(
    "active_orders_daily",
    """
    WITH life AS (
        SELECT o.o_orderkey,
               CAST(o.o_orderdate AS DATE) AS s,
               CAST(MAX(l.l_shipdate) AS DATE) + 1 AS e
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)),
    deltas AS (
        SELECT s AS day, 1 AS d FROM life
        UNION ALL
        SELECT e AS day, -1 AS d FROM life),
    daily AS (
        SELECT day,
               CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_started,
               CAST(SUM(CASE WHEN d = -1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_ended,
               CAST(SUM(d) AS BIGINT) AS delta
        FROM deltas GROUP BY day)
    SELECT day, n_started, n_ended,
           CAST(SUM(delta) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS active_orders
    FROM daily
    """,
)
def q_active_orders_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many orders are in flight each day (order date → last
    lineitem ship date) — the classic interval-overlap count.

    Scale: the naive plan explodes each order into one row per active
    day (O(orders × duration)).  This plan is an event sweep instead:
    each order contributes exactly two delta rows (+1 at start, −1 the
    day after last ship), which aggregate by day BEFORE the running
    sum.  The only ordered window runs over |distinct days| rows —
    thousands, independent of order count — so the single-partition
    window is bounded by the calendar, not the data.  Upstream, the
    max-shipdate reduction is one map-side-combined shuffle on
    l_orderkey.
    """
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    last_ship = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("last_ship")
    )
    life = o.join(last_ship, o.o_orderkey == last_ship.l_orderkey).select(
        F.to_date("o_orderdate").alias("s"),
        F.date_add(F.to_date("last_ship"), 1).alias("e"),
    )
    deltas = life.select(F.col("s").alias("day"), F.lit(1).alias("d")).unionAll(
        life.select(F.col("e").alias("day"), F.lit(-1).alias("d"))
    )
    daily = deltas.groupBy("day").agg(
        F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).cast("long").alias(
            "n_started"
        ),
        F.sum(F.when(F.col("d") == -1, 1).otherwise(0)).cast("long").alias(
            "n_ended"
        ),
        F.sum("d").cast("long").alias("delta"),
    )
    w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "day",
        "n_started",
        "n_ended",
        F.sum("delta").over(w).cast("long").alias("active_orders"),
    )


# ---------------------------------------------------------------------------
# Sequence modelling: per-user event-type transition matrix
# ---------------------------------------------------------------------------
@_q(
    "event_transition_matrix",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS prev_type
        FROM events),
    trans AS (
        SELECT prev_type, event_type AS next_type, COUNT(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type)
    SELECT prev_type, next_type,
           CAST(n AS BIGINT) AS n_trans,
           CAST((n * 1000000) // SUM(n) OVER (PARTITION BY prev_type)
               AS BIGINT) AS p_ppm
    FROM trans
    """,
)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences — the shape behind next-action models, funnel-dropoff
    diagnostics, and session-level LM-style counting.

    Scale: one shuffle on user_id for the LAG window (ordered by
    (ts, event_id) — event_id breaks timestamp ties so the sequence is
    deterministic), then a groupBy on (prev, next) whose output is
    |event_types|² rows.  The per-prev normalisation window runs over
    that tiny matrix, not the events.  Probability is integer ppm with
    floor division so both engines agree bit-for-bit.
    """
    ev = _t(spark, sf_dir, "events")
    seq = ev.select(
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    trans = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wp = Window.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "next_type",
        F.col("n").cast("long").alias("n_trans"),
        F.expr("(n * 1000000) div sum(n) over (partition by prev_type)")
        .cast("long")
        .alias("p_ppm"),
    )


# ---------------------------------------------------------------------------
# PII-style redaction: mask digit runs, count redactions
# ---------------------------------------------------------------------------
@_q(
    "pii_scrub_stats",
    """
    SELECT event_id,
           event_type,
           regexp_replace(props, '[0-9]+', '#', 'g') AS masked_props,
           CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT)
               AS n_redactions,
           CAST(NULLIF(regexp_extract(props, '"k": ([0-9]+)', 1), '')
               AS BIGINT) AS k_val
    FROM events
    """,
)
def q_pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex redaction over a semi-structured payload column: mask
    every digit run, count how many were masked, and lift the one
    whitelisted field out before masking — the scrub/audit pair every
    training-data pipeline runs before text leaves the trust boundary.

    Scale: pure row-local codegen'd expressions (regexp_replace /
    regexp_count / regexp_extract are JVM intrinsics) — zero shuffles,
    zero Python.  The regexes avoid lookaround so Java (Spark) and RE2
    (DuckDB) agree on every match.
    """
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.regexp_replace("props", "[0-9]+", "#").alias("masked_props"),
        F.regexp_count(F.col("props"), F.lit("[0-9]+"))
        .cast("long")
        .alias("n_redactions"),
        F.nullif(F.regexp_extract("props", '"k": ([0-9]+)', 1), F.lit(""))
        .cast("long")
        .alias("k_val"),
    )


# ---------------------------------------------------------------------------
# Keep-best dedup: canonical doc per fingerprint cluster
# ---------------------------------------------------------------------------
@_q(
    "dedup_keep_best",
    """
    WITH fp AS (
        SELECT doc_id, n_chars,
               CAST(('0x' || substr(md5(array_to_string(list_sort(
                   list_distinct(string_split_regex(trim(regexp_replace(
                   lower(text), '[^a-z0-9]+', ' ', 'g')), '\\s+'))), ' ')),
                   1, 15)) AS BIGINT) AS fp
        FROM documents),
    ranked AS (
        SELECT fp, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY fp
                   ORDER BY n_chars DESC, doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY fp) AS dup_cnt
        FROM fp)
    SELECT fp, doc_id AS keep_doc_id,
           CAST(n_chars AS BIGINT) AS keep_n_chars,
           CAST(dup_cnt AS BIGINT) AS dup_cnt
    FROM ranked WHERE rn = 1
    """,
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup: within each token-set fingerprint cluster
    keep the *best* representative (longest text, doc_id as the
    deterministic tiebreak) instead of the arbitrary first — what a
    curation pipeline actually ships after near-dup clustering.

    Scale: the fingerprint is row-local (one md5 over the sorted
    distinct token set), so the only shuffle carries (fp int64, id,
    n_chars) — never the text.  row_number and the cluster-size count
    share one window spec, so Spark computes both in a single Window
    over a single Exchange on fp.
    """
    d = _t(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id", "n_chars", fingerprint("text").alias("fp")
    )
    w = Window.partitionBy("fp").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    ranked = fp.select(
        "fp",
        "doc_id",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("fp"))
        .alias("dup_cnt"),
    )
    return ranked.where(F.col("rn") == 1).select(
        "fp",
        F.col("doc_id").alias("keep_doc_id"),
        F.col("n_chars").cast("long").alias("keep_n_chars"),
        F.col("dup_cnt").cast("long").alias("dup_cnt"),
    )


# ---------------------------------------------------------------------------
# Class-prototype similarity: pairwise cosine between label centroids
# ---------------------------------------------------------------------------
@_q(
    "label_centroid_sim",
    """
    WITH ex AS (
        SELECT label,
               generate_subscripts(embedding, 1) - 1 AS dim,
               CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                    AS BIGINT) AS micro
        FROM embeddings),
    cent AS (
        SELECT label, dim,
               CAST(FLOOR(CAST(SUM(micro) AS DOUBLE) / COUNT(*))
                   AS BIGINT) AS c
        FROM ex GROUP BY label, dim),
    norms AS (
        SELECT label, CAST(SUM(c * c) AS BIGINT) AS n2
        FROM cent GROUP BY label)
    SELECT a.label AS label_a, b.label AS label_b,
           CAST(SUM(ca.c * cb.c) AS BIGINT) AS dot_micro2,
           CAST(FLOOR(CAST(SUM(ca.c * cb.c) AS DOUBLE)
               / SQRT(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE))
               * 10000) AS BIGINT) AS cos_bp
    FROM (SELECT DISTINCT label FROM cent) a
    JOIN (SELECT DISTINCT label FROM cent) b ON a.label < b.label
    JOIN cent ca ON ca.label = a.label
    JOIN cent cb ON cb.label = b.label AND cb.dim = ca.dim
    JOIN norms na ON na.label = a.label
    JOIN norms nb ON nb.label = b.label
    GROUP BY a.label, b.label, na.n2, nb.n2
    """,
)
def q_label_centroid_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between per-label embedding
    centroids — the confusion-structure / class-overlap diagnostic run
    after any labelling or clustering pass.

    Scale: the raw embeddings reduce to |labels|·|dims| integer-micro
    centroids first (one map-side-combined shuffle, same shape as
    `label_centroids`); every quadratic step after that runs on the
    reduced prototype table, so the pair join is |labels|²·dims rows
    regardless of corpus size.  The dot product is exact BIGINT
    arithmetic; only the final cosine normalisation touches doubles,
    as one pinned IEEE expression (cast → multiply → sqrt → divide →
    floor) evaluated identically by both engines.
    """
    e = _t(spark, sf_dir, "embeddings")
    ex = e.select(
        "label", F.posexplode("embedding").alias("dim", "val")
    ).select(
        "label",
        "dim",
        F.floor(F.col("val").cast("double") * 1000000).cast("long").alias(
            "micro"
        ),
    )
    cent = ex.groupBy("label", "dim").agg(
        F.floor(F.sum("micro").cast("double") / F.count(F.lit(1)))
        .cast("long")
        .alias("c")
    )
    norms = cent.groupBy("label").agg(
        F.sum(F.col("c") * F.col("c")).cast("long").alias("n2")
    )
    ca = cent.select(
        F.col("label").alias("label_a"),
        F.col("dim").alias("dim_a"),
        F.col("c").alias("ca"),
    )
    cb = cent.select(
        F.col("label").alias("label_b"),
        F.col("dim").alias("dim_b"),
        F.col("c").alias("cb"),
    )
    dots = (
        ca.join(
            cb,
            (F.col("label_a") < F.col("label_b"))
            & (F.col("dim_a") == F.col("dim_b")),
        )
        .groupBy("label_a", "label_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("long").alias("dot_micro2"))
    )
    na = norms.select(
        F.col("label").alias("label_a"), F.col("n2").alias("na2")
    )
    nb = norms.select(
        F.col("label").alias("label_b"), F.col("n2").alias("nb2")
    )
    return (
        dots.join(F.broadcast(na), "label_a")
        .join(F.broadcast(nb), "label_b")
        .select(
            "label_a",
            "label_b",
            "dot_micro2",
            F.floor(
                F.col("dot_micro2").cast("double")
                / F.sqrt(
                    F.col("na2").cast("double") * F.col("nb2").cast("double")
                )
                * 10000
            )
            .cast("long")
            .alias("cos_bp"),
        )
    )
