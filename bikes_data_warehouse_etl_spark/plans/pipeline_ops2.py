"""Training-data pipeline operators, round 2 batch 2: repetition
filtering, benchmark decontamination, embedding centroids, global
quantile gates, numeric profiling, and anomaly flagging.

Same contract as `pipeline_ops.py`: every query is a (Spark plan,
DuckDB oracle) pair expected to hash-match bit-for-bit, so all
cross-engine arithmetic is integer-exact (cents / ppm / micro-units,
``div``/``//`` only where both engines agree on sign handling, floor
of an exact double division where they don't).

Scale notes are per-query docstrings; the shared theme again: fixed
width shuffle keys, map-side partial aggregation, broadcasts only for
provably-small sides (a benchmark n-gram set, a 1-row threshold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.text import (
    token_count,
    tokens,
    word_shingles_from_tokens,
)
from bikes_data_warehouse_etl_spark.plans.extensions import (
    _SQL_NTOK,
    _SQL_SHINGLES,
    _SQL_TOKENS,
)
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t

# k=2 word shingles (bigrams), mirroring _SQL_SHINGLES with one fewer
# shifted slice
_SQL_BIGRAMS = (
    f"list_transform(generate_series(1, len({_SQL_TOKENS}) - 1), "
    f"i -> array_to_string(({_SQL_TOKENS})[i:i+1], ' '))"
)


# ---------------------------------------------------------------------------
# Repetition scoring (Gopher-style quality rule)
# ---------------------------------------------------------------------------
@_q(
    "repetition_score",
    f"""
    WITH bg AS (
        SELECT doc_id, unnest({_SQL_BIGRAMS}) AS b FROM documents),
    per AS (
        SELECT doc_id, b, COUNT(*) AS n FROM bg GROUP BY doc_id, b)
    SELECT doc_id,
           CAST(SUM(n) AS BIGINT) AS n_bigrams,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(((SUM(n) - COUNT(*)) * 1000000) // SUM(n) AS BIGINT)
               AS dup_ppm,
           CAST(MAX(n) AS BIGINT) AS top_n
    FROM per GROUP BY doc_id
    """,
)
def q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram repetition profile — the "duplicated n-gram
    fraction" quality rule (Gopher / C4 style): documents whose text is
    dominated by a few repeated word pairs are boilerplate or spam.
    ``dup_ppm`` is the repeated-bigram fraction in integer ppm;
    ``top_n`` the count of the single most repeated bigram.

    Scale: bigram *strings* never shuffle — the per-(doc, bigram)
    count groups on (doc_id, xxhash64(bigram)), a 16-byte key, with
    map-side combine; the doc roll-up then groups on doc_id alone.
    Distinct-counting via the hash is exact modulo 64-bit collisions
    (the same standing assumption as the minhash/LSH family). Both
    stages hash-partition on high-cardinality keys, so the plan is
    skew-safe at any corpus size.
    """
    d = _t(spark, sf_dir, "documents")
    tokd = d.select("doc_id", tokens(F.col("text")).alias("__toks__"))
    bg = tokd.select(
        "doc_id",
        F.explode(word_shingles_from_tokens(F.col("__toks__"), 2)).alias("b"),
    )
    per = bg.groupBy("doc_id", F.xxhash64("b").alias("bh")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return per.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_bigrams"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.expr("((sum(n) - count(*)) * 1000000) div sum(n)").alias("dup_ppm"),
        F.max("n").cast("long").alias("top_n"),
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap against a held-out set)
# ---------------------------------------------------------------------------
@_q(
    "decontam_overlap",
    f"""
    WITH sh AS (
        SELECT doc_id, source, unnest(list_distinct({_SQL_SHINGLES})) AS s
        FROM documents),
    bench AS (SELECT DISTINCT s FROM sh WHERE source = 'src0')
    SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM sh JOIN bench USING (s)
    WHERE sh.source <> 'src0'
    GROUP BY sh.doc_id
    """,
)
def q_decontam_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination: flag corpus documents sharing any
    3-word shingle with the benchmark partition (``source = 'src0'``
    stands in for the held-out eval set), with the shared-shingle count
    as the contamination strength. Docs with no overlap don't appear —
    the output is the *removal list* a pretraining pipeline feeds to an
    anti-join.

    Scale: the benchmark side is distinct-reduced then **broadcast by
    construction** — eval sets are fixed-size (thousands of docs, not
    fact-scaled), which is precisely when a forced broadcast is right;
    the corpus side streams map-side against the broadcast hash set,
    so the only shuffle is the final per-doc count on doc_id. Shingles
    travel as xxhash64 longs, never strings (64-bit-collision
    assumption as elsewhere).
    """
    d = _t(spark, sf_dir, "documents")
    tokd = d.select(
        "doc_id", "source", tokens(F.col("text")).alias("__toks__")
    )
    sh = tokd.select(
        "doc_id",
        "source",
        F.explode(
            F.array_distinct(word_shingles_from_tokens(F.col("__toks__"), 3))
        ).alias("s"),
    ).select("doc_id", "source", F.xxhash64("s").alias("sh"))
    bench = sh.filter(F.col("source") == "src0").select("sh").distinct()
    return (
        sh.filter(F.col("source") != "src0")
        .join(F.broadcast(bench), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )


# ---------------------------------------------------------------------------
# Per-label embedding centroids (vector aggregation)
# ---------------------------------------------------------------------------
@_q(
    "label_centroids",
    """
    WITH ex AS (
        SELECT label,
               generate_subscripts(embedding, 1) - 1 AS dim,
               CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                    AS BIGINT) AS micro
        FROM embeddings)
    SELECT label, dim,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(micro) AS BIGINT) AS sum_micro,
           CAST(FLOOR(CAST(SUM(micro) AS DOUBLE) / COUNT(*)) AS BIGINT)
               AS centroid_micro
    FROM ex GROUP BY label, dim
    """,
)
def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class embedding centroids, dimension-wise — the reduction
    behind k-means/IVF training, class prototypes, and drift monitors.
    Elements are fixed to integer micro-units *before* aggregation
    (floor(double(x)·1e6) — float→double widening and floor are
    IEEE-identical in both engines), so the sums are exact integers and
    independent of summation order; the mean is floor(sum/n) on an
    exact double (|sum| ≪ 2^53), avoiding the Spark-``div``-truncates /
    DuckDB-``//``-floors sign mismatch on negative sums.

    Scale: posexplode → groupBy(label, dim) is one shuffle carrying
    (int, int, long) rows with map-side partial sums; output
    cardinality is |labels|·|dims|, independent of row count. This is
    the scalable shape — per-partition vector pre-summing via
    ``F.aggregate`` over arrays would also work but loses map-side
    combine granularity under skewed labels.
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
    return ex.groupBy("label", "dim").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum("micro").cast("long").alias("sum_micro"),
        F.floor(
            F.sum("micro").cast("double") / F.count(F.lit(1))
        ).cast("long").alias("centroid_micro"),
    )


# ---------------------------------------------------------------------------
# Global quantile gate (bottom-decile filter without a global sort)
# ---------------------------------------------------------------------------
@_q(
    "token_len_decile_gate",
    f"""
    WITH tc AS (SELECT doc_id, {_SQL_NTOK} AS tok_cnt FROM documents),
    c AS (SELECT tok_cnt, COUNT(*) AS n FROM tc GROUP BY tok_cnt),
    cum AS (SELECT tok_cnt, SUM(n) OVER (ORDER BY tok_cnt) AS cum FROM c),
    thr AS (SELECT MIN(tok_cnt) AS p10 FROM cum,
                 (SELECT COUNT(*) AS t FROM tc)
            WHERE cum * 10 >= t)
    SELECT tc.doc_id, tc.tok_cnt, thr.p10
    FROM tc, thr WHERE tc.tok_cnt >= thr.p10
    """,
)
def q_token_len_decile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop the shortest decile of documents by token count — a global
    percentile *gate*, computed without ever globally sorting the data:
    the exact p10 threshold comes from the cumulative histogram of the
    bounded-cardinality length distribution (token counts, a few
    hundred distinct values regardless of corpus size), then broadcasts
    back as a 1-row filter.

    Scale: one groupBy(tok_cnt) shuffle (map-side combined, output
    ≤ |distinct lengths| rows), an unpartitioned window that is safe by
    construction on that bounded series, and a broadcast join for the
    threshold — the full corpus is touched exactly twice, never sorted.
    The same shape generalizes to any discretized score (quality ppm,
    perplexity buckets).
    """
    d = _t(spark, sf_dir, "documents")
    tc = d.select("doc_id", token_count(F.col("text")).alias("tok_cnt"))
    counts = tc.groupBy("tok_cnt").agg(F.count(F.lit(1)).alias("n"))
    cum = counts.select(
        "tok_cnt",
        F.sum("n")
        .over(
            Window.orderBy("tok_cnt").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("cum"),
    )
    total = tc.agg(F.count(F.lit(1)).alias("t"))
    thr = (
        cum.join(F.broadcast(total))
        .filter(F.col("cum") * 10 >= F.col("t"))
        .agg(F.min("tok_cnt").alias("p10"))
    )
    return tc.join(F.broadcast(thr)).filter(
        F.col("tok_cnt") >= F.col("p10")
    ).select("doc_id", "tok_cnt", "p10")


# ---------------------------------------------------------------------------
# Fixed-width numeric histogram (events.value)
# ---------------------------------------------------------------------------
@_q(
    "value_histogram",
    """
    WITH c AS (
        SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS cents FROM events)
    SELECT CAST(cents // 500 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(cents) AS BIGINT) AS min_cents,
           CAST(MAX(cents) AS BIGINT) AS max_cents,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM c GROUP BY bucket
    """,
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width ($5) histogram over event values with per-bucket
    min/max/sum — the numeric-profiling pass behind range pruning,
    outlier triage, and bucketing decisions. Values are integer cents
    (the column is 2-decimal by contract; ROUND(·,0) parity is already
    pinned by the revenue queries); buckets are non-negative so
    Spark's truncating ``div`` and DuckDB's flooring ``//`` agree.

    Scale: a single row-local projection plus one groupBy on an
    8-byte bucket id with map-side combine — output cardinality is
    range/width, independent of row count. The same plan serves as the
    equi-width stats collector for AQE-style range estimation.
    """
    e = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return (
        e.select(cents.alias("cents"))
        .select(F.expr("cents div 500").alias("bucket"), "cents")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("cents").cast("long").alias("min_cents"),
            F.max("cents").cast("long").alias("max_cents"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Per-user anomaly flags (integer-exact 2-sigma, no sqrt)
# ---------------------------------------------------------------------------
@_q(
    "user_value_outliers",
    """
    WITH c AS (
        SELECT event_id, user_id,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        FROM events),
    s AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s,
               CAST(SUM(cents * cents) AS BIGINT) AS ssq
        FROM c GROUP BY user_id)
    SELECT c.event_id, c.user_id, c.cents
    FROM c JOIN s USING (user_id)
    WHERE s.n >= 30
      AND (s.n * c.cents - s.s) * (s.n * c.cents - s.s)
          > 4 * (s.n * s.ssq - s.s * s.s)
    """,
)
def q_user_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 2-sigma outlier events, computed entirely in integer
    arithmetic: the test |v − mean| > 2·stddev is squared and scaled by
    n² so no division, sqrt, or float ever happens —
    (n·v − Σv)² > 4·(n·Σv² − (Σv)²) is exact in BIGINT for cent-valued
    data (worst term ≈ n·Σv² ≪ 2^63 at any per-user volume that fits an
    executor). Users with fewer than 30 events are skipped (no stable
    variance).

    Scale: one groupBy(user_id) with map-side partial sums, then an
    equi-join of the stats back to the events on the same key — AQE
    broadcasts the stats side when |users| is small, and both sides
    are already hash-partitioned on user_id otherwise, so the join
    reuses the aggregation's exchange. No window over event sequences.
    """
    e = _t(spark, sf_dir, "events")
    c = e.select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    s = c.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).cast("long").alias("ssq"),
    )
    dev = F.col("n") * F.col("cents") - F.col("s")
    return (
        c.join(s, "user_id")
        .filter(
            (F.col("n") >= 30)
            & (dev * dev > 4 * (F.col("n") * F.col("ssq") - F.col("s") * F.col("s")))
        )
        .select("event_id", "user_id", "cents")
    )


# ---------------------------------------------------------------------------
# Multimodal: aspect-preserving resize geometry (decode → resize plan)
# ---------------------------------------------------------------------------
@_q(
    "multimodal_resize",
    """
    WITH d AS (
        SELECT doc_id AS media_id,
               64 + ('0x' || substr(md5(text), 1, 2))::INT % 192 AS width,
               64 + ('0x' || substr(md5(text), 3, 2))::INT % 192 AS height
        FROM documents)
    SELECT media_id, width, height,
           CAST(width * 224 // greatest(width, height) AS INT) AS rs_width,
           CAST(height * 224 // greatest(width, height) AS INT) AS rs_height
    FROM d
    """,
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → fit-in-224-box resize geometry, the second stage of the
    image pipeline: the Arrow-batched decode stub yields (width,
    height); the aspect-preserving output dims are integer ``div``
    arithmetic computed JVM-side (``operators/multimodal.py
    resize_dims``) — only pixel work belongs in the Python worker, the
    geometry stays in codegen where the planner can prune it.

    Scale: decode is mapInPandas (one Arrow batch resident per task);
    the resize projection adds zero shuffles and zero Python calls.
    Positive operands, so Spark ``div`` and DuckDB ``//`` agree.
    """
    from bikes_data_warehouse_etl_spark.operators.multimodal import (
        decode_media,
        documents_as_media,
        resize_dims,
    )

    media = documents_as_media(_t(spark, sf_dir, "documents"))
    decoded = decode_media(media)
    return resize_dims(decoded, target=224).select(
        "media_id", "width", "height", "rs_width", "rs_height"
    )


# ---------------------------------------------------------------------------
# Multimodal: frame sampling (video-style payload splitting)
# ---------------------------------------------------------------------------
@_q(
    "frame_sample_stats",
    """
    WITH m AS (
        SELECT doc_id AS media_id, text, strlen(text) AS len
        FROM documents),
    f AS (
        SELECT media_id,
               unnest(generate_series(0, 3)) AS frame_idx,
               text,
               greatest(len // 4, 1) AS step
        FROM m)
    SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(step AS BIGINT) AS n_frame_bytes,
           md5(substr(text, frame_idx * step + 1, step)) AS frame_md5
    FROM f
    """,
)
def q_frame_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Video' frame sampling through the Arrow iterator path: each
    payload splits into 4 equal byte-range frames (one output row per
    frame, the shape a real frame sampler produces), then per-frame
    size + content digest. The corpus is pure ASCII so the oracle's
    char-slicing md5 equals the byte-slicing md5 of the binary frames.

    Scale: mapInPandas explodes rows 4× inside the Arrow batch — no
    shuffle at all; frame payloads never leave the task that sampled
    them. Digesting in the same pass is the standard trick to avoid
    persisting raw frames.
    """
    from bikes_data_warehouse_etl_spark.operators.multimodal import (
        documents_as_media,
        frame_sample,
    )

    media = documents_as_media(_t(spark, sf_dir, "documents"))
    frames = frame_sample(media, n_frames=4)
    return frames.select(
        "media_id",
        "frame_idx",
        F.length("frame_bytes").cast("long").alias("n_frame_bytes"),
        F.md5("frame_bytes").alias("frame_md5"),
    )


# ---------------------------------------------------------------------------
# Context-window chunking (row-local document splitting)
# ---------------------------------------------------------------------------
@_q(
    "doc_chunks",
    f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
    c AS (
        SELECT doc_id,
               unnest(generate_series(0, (len(toks) - 1) // 16)) AS chunk_idx,
               toks
        FROM t)
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(len(toks[chunk_idx * 16 + 1 : chunk_idx * 16 + 16])
                AS BIGINT) AS n_chunk_tokens,
           array_to_string(toks[chunk_idx * 16 + 1 : chunk_idx * 16 + 16], ' ')
               AS chunk_text
    FROM c
    """,
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split every document into 16-token
    chunks (last chunk ragged) — the pre-tokenization step that turns a
    corpus into training sequences.

    Scale: entirely row-local — tokenize once, slice ``k`` windows with
    a top-level ``transform``, posexplode. ZERO shuffles at any corpus
    size; chunk rows inherit the input partitioning, so a downstream
    shuffle (e.g. packing by length) starts from even partitions. The
    slice-based construction keeps tokenization O(tokens), not
    O(tokens·chunks) (same CollapseProject trap as the shingle builder).
    """
    d = _t(spark, sf_dir, "documents")
    tokd = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    chunks = tokd.select(
        "doc_id",
        F.posexplode(
            # size >= 1 always (split('') yields ['']), so truncating div
            # and flooring // agree on (size-1) div 16
            F.expr(
                "transform(sequence(0, int((size(toks) - 1) div 16)), "
                "i -> slice(toks, i * 16 + 1, 16))"
            )
        ).alias("chunk_idx", "chunk"),
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size("chunk").cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", "chunk").alias("chunk_text"),
    )


# ---------------------------------------------------------------------------
# Cross-source duplication matrix
# ---------------------------------------------------------------------------
@_q(
    "source_overlap_matrix",
    f"""
    WITH sh AS (
        SELECT DISTINCT source, unnest(list_distinct({_SQL_SHINGLES})) AS s
        FROM documents)
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
    GROUP BY a.source, b.source
    """,
)
def q_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-overlap matrix: for every source pair, how many
    distinct 3-gram shingles they share — the provenance diagnostic
    that finds mirrored / scraped-twice feeds before dedup wastes a
    full LSH pass on them.

    Scale: distinct (source, shingle-hash) first — the per-shingle
    fan-out is bounded by |sources| (not row count), so the self-join
    emits at most |sources|²/2 pairs per shingle and the output is a
    tiny matrix regardless of corpus size. The join key is the 8-byte
    shingle hash; at test scale AQE broadcasts one side of the
    self-join, and past the broadcast threshold it becomes a sort-merge
    join whose two sides hash-partition the same distinct-reduced
    child — either way no raw text moves.
    """
    d = _t(spark, sf_dir, "documents")
    tokd = d.select("source", tokens(F.col("text")).alias("__toks__"))
    sh = (
        tokd.select(
            "source",
            F.explode(
                F.array_distinct(
                    word_shingles_from_tokens(F.col("__toks__"), 3)
                )
            ).alias("s"),
        )
        .select("source", F.xxhash64("s").alias("sh"))
        .distinct()
    )
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )


# ---------------------------------------------------------------------------
# Sequence packing (documents → fixed-token-budget training sequences)
# ---------------------------------------------------------------------------
_SQL_HASH_PACK = (
    "CAST(('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 15)) "
    "AS BIGINT)"
)


@_q(
    "sequence_packing",
    f"""
    WITH tc AS (
        SELECT doc_id, {_SQL_NTOK} AS tok_cnt,
               {_SQL_HASH_PACK} % 8 AS bucket
        FROM documents),
    packed AS (
        SELECT doc_id, bucket, tok_cnt,
               COALESCE(SUM(tok_cnt) OVER (
                   PARTITION BY bucket ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
        FROM tc)
    SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
           CAST(tok_cnt AS BIGINT) AS tok_cnt,
           CAST(cum_before // 1024 AS BIGINT) AS seq_id
    FROM packed
    """,
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document → training-sequence packing: assign every document to a
    fixed-budget (1024-token) sequence, streaming-fill style — the step
    that turns a curated corpus into pretraining batches. Documents
    spread over 8 salted hash buckets (at scale: one bucket ≈ one
    writer task); within a bucket the exclusive running token total
    places each doc in sequence ``cum_before div 1024``.

    Scale: ONE shuffle (hash bucket), then an in-partition window —
    bucket count scales with the cluster, so no single task sees more
    than corpus/n_buckets tokens, and assignment is deterministic
    (hash + doc_id order), reproducible across engines and reruns.
    Greedy first-fit packs ~tighter but is inherently sequential; the
    streaming-fill shape is what distributed packers actually ship.
    Non-negative operands, so truncating ``div`` equals flooring
    ``//``.
    """
    from bikes_data_warehouse_etl_spark.functions.text import hash64

    d = _t(spark, sf_dir, "documents")
    tc = d.select(
        "doc_id",
        token_count(F.col("text")).alias("tok_cnt"),
        (
            hash64(F.concat(F.lit("pack:"), F.col("doc_id").cast("string")))
            % 8
        ).alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        tc.withColumn(
            "cum_before", F.coalesce(F.sum("tok_cnt").over(w), F.lit(0))
        )
        .select(
            "doc_id",
            F.col("bucket").cast("long").alias("bucket"),
            F.col("tok_cnt").cast("long").alias("tok_cnt"),
            F.expr("cum_before div 1024").alias("seq_id"),
        )
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms per document (integer-exact scoring)
# ---------------------------------------------------------------------------
@_q(
    "tfidf_top_terms",
    f"""
    WITH tok AS (
        SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM tok
        WHERE term <> '' GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               tf.tf * ((n.n_docs * 1000) // df.df) AS score_milli,
               ROW_NUMBER() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY tf.tf * ((n.n_docs * 1000) // df.df) DESC,
                            tf.term) AS rnk
        FROM tf JOIN df USING (term) CROSS JOIN n)
    SELECT doc_id, term, CAST(score_milli AS BIGINT) AS score_milli,
           CAST(rnk AS INT) AS rnk
    FROM scored WHERE rnk <= 3
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most characteristic terms per document by TF-IDF, with a
    fully integer score (tf · (N·1000 div df)) so both engines rank and
    hash identically — completing the TF-IDF pair started by
    ``doc_rarity_score`` (the IDF half). Ties break on the term.

    Scale: tf groups on (doc_id, term) — term strings must survive to
    the output, so this is the one text-keyed shuffle in the family;
    df reduces the term dictionary (broadcast candidate after
    reduction, AQE's call), the corpus count joins as a broadcast
    1-row aggregate, and the per-doc top-3 compiles to WindowGroupLimit
    (per-partition rank heap, never a full per-doc sort materialized).
    """
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .join(F.broadcast(n))
        .withColumn(
            "score_milli", F.expr("tf * ((n_docs * 1000) div df)")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_milli").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "doc_id",
            "term",
            F.col("score_milli").cast("long").alias("score_milli"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


# ---------------------------------------------------------------------------
# DAU / MAU stickiness (behavioral analytics)
# ---------------------------------------------------------------------------
@_q(
    "dau_mau_stickiness",
    """
    WITH dau AS (
        SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
               CAST(ts AS DATE) AS day, COUNT(DISTINCT user_id) AS dau
        FROM events GROUP BY 1, 2),
    mau AS (
        SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
               COUNT(DISTINCT user_id) AS mau
        FROM events GROUP BY 1)
    SELECT d.month,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(d.dau) // COUNT(*) AS BIGINT) AS avg_dau_floor,
           CAST(m.mau AS BIGINT) AS mau,
           CAST((SUM(d.dau) * 1000000) // (COUNT(*) * m.mau) AS BIGINT)
               AS stickiness_ppm
    FROM dau d JOIN mau m USING (month)
    GROUP BY d.month, m.mau
    """,
)
def q_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly stickiness (avg DAU / MAU, integer ppm) — the engagement
    ratio behind "how often do actives return". Distinct users roll up
    per day and per month, then combine on the bounded month key.

    Scale: two distinct-aggregations over (day|month, user) — both
    hash-partitioned with partial dedup map-side — joined on the
    ~constant-cardinality month key (broadcast, AQE's call). The ppm
    division happens post-aggregation on bounded rows. COUNT(DISTINCT)
    at 100 TB: swap ``approx_count_distinct`` and drop to rows-only, or
    pre-bucket users (the documented HLL path in
    ``approx_distinct_parts``).
    """
    e = _t(spark, sf_dir, "events")
    month = F.date_trunc("month", F.col("ts")).cast("date").alias("month")
    dau = e.groupBy(month, F.col("ts").cast("date").alias("day")).agg(
        F.count_distinct("user_id").alias("dau")
    )
    mau = e.groupBy(month).agg(F.count_distinct("user_id").alias("mau"))
    return (
        dau.join(mau, "month")
        .groupBy("month", "mau")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.expr("sum(dau) div count(*)").alias("avg_dau_floor"),
            F.expr("(sum(dau) * 1000000) div (count(*) * mau)").alias(
                "stickiness_ppm"
            ),
        )
        .select(
            "month",
            "n_days",
            "avg_dau_floor",
            F.col("mau").cast("long").alias("mau"),
            "stickiness_ppm",
        )
    )


# ---------------------------------------------------------------------------
# Feed reconciliation (FULL OUTER join of two daily aggregates)
# ---------------------------------------------------------------------------
@_q(
    "feed_reconcile_daily",
    """
    WITH o AS (
        SELECT o_orderdate AS day, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders WHERE o_orderdate >= DATE '1998-07-25'
        GROUP BY 1),
    r AS (
        SELECT l_shipdate AS day, CAST(COUNT(*) AS BIGINT) AS n_shipments
        FROM lineitem WHERE l_shipdate >= DATE '1998-07-28'
        GROUP BY 1)
    SELECT COALESCE(o.day, r.day) AS day,
           COALESCE(o.n_orders, 0) AS n_orders,
           COALESCE(r.n_shipments, 0) AS n_shipments,
           CASE WHEN o.day IS NULL THEN 'shipments_only'
                WHEN r.day IS NULL THEN 'orders_only'
                ELSE 'both' END AS presence
    FROM o FULL OUTER JOIN r ON o.day = r.day
    """,
)
def q_feed_reconcile_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily feed reconciliation: FULL OUTER join of two independently
    aggregated sources (order counts vs lineitem shipment counts per
    day), flagging days present in only one feed — the completeness
    check run before trusting any multi-source pipeline. The two
    windows are offset (orders from 07-25, shipments from 07-28;
    shipments run months past the last order) so all three presence
    states occur.

    Scale: each side reduces to ≤ one row per day BEFORE the join —
    the full-outer join runs on two bounded daily series, never on raw
    facts (a raw-grain full-outer of two fact tables is the classic
    reconciliation anti-pattern: it shuffles both tables to produce
    what two partial aggregations already knew).
    """
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1998-07-25").cast("date"))
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )
    r = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") >= F.lit("1998-07-28").cast("date"))
        .groupBy(F.col("l_shipdate").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_shipments"))
    )
    oo = o.alias("o")
    rr = r.alias("r")
    return (
        oo.join(rr, F.col("o.day") == F.col("r.day"), "full_outer")
        .select(
            F.coalesce(F.col("o.day"), F.col("r.day")).alias("day"),
            F.coalesce(F.col("o.n_orders"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("r.n_shipments"), F.lit(0)).alias("n_shipments"),
            F.when(F.col("o.day").isNull(), "shipments_only")
            .when(F.col("r.day").isNull(), "orders_only")
            .otherwise("both")
            .alias("presence"),
        )
    )
