"""Training-data pipeline operators, round 2 batch 5: skew-tool
equivalence proofs, sketch-accuracy auditing, vocabulary coverage,
boilerplate detection, and inter-arrival profiling.

The two skew queries are deliberately *oracle-backed equivalence
proofs*: the Spark side routes through the explicit skew-mitigation
operators (``salted_join`` / ``two_phase_agg``), while the oracle is
the plain join / plain GROUP BY — a hash match certifies that the
mitigation is semantics-preserving, through the external gate rather
than only pytest.

Everything else follows the standing contract: integer cross-engine
arithmetic (ppm / bp / cents), bounded key spaces before any joined or
windowed step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.text import (
    tokens,
    word_shingles_from_tokens,
)
from bikes_data_warehouse_etl_spark.operators.dedup import (
    MINHASH_P,
    minhash_candidates,
    minhash_mins,
    ngram_jaccard_pairs,
)
from bikes_data_warehouse_etl_spark.operators.skew import (
    salted_join,
    two_phase_agg,
)
from bikes_data_warehouse_etl_spark.plans.extensions import (
    _SQL_SHINGLES,
    _SQL_TOKENS,
    _sql_hash64,
    _sql_minhash,
)
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Skew tool equivalence proofs (oracle = the plain formulation)
# ---------------------------------------------------------------------------
@_q(
    "salted_join_revenue",
    """
    SELECT o.o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT))
               AS BIGINT) AS revenue_cents
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by priority, computed through :func:`salted_join` — the
    oracle is the PLAIN join, so the hash match is an external proof
    that salting is semantics-preserving (the pytest equivalence test's
    twin, enforced by the driver's gate).

    Scale: the fact side gets a salt in [0,8); the joined dim slice is
    replicated 8×, so one pathological hot order key spreads over 8
    reducers instead of stalling one.  The aggregation collapses the
    salt, so the result is salt-invariant by construction.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
    )
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.col("o_orderpriority").alias("priority"),
    )
    joined = salted_join(li, o, ["l_orderkey"], salt=8, how="inner")
    return joined.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )


@_q(
    "two_phase_agg_supplier",
    """
    SELECT l_suppkey,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
               AS BIGINT) AS sum_cents,
           CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT)
               AS sum_qty,
           CAST(SUM(1) AS BIGINT) AS n_items
    FROM lineitem GROUP BY l_suppkey
    """,
)
def q_two_phase_agg_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier sums routed through :func:`two_phase_agg` (partial
    by (key, salt), final by key) with the plain GROUP BY as the
    oracle — certifying the hot-key aggregation rewrite through the
    external gate.

    Scale: a supplier owning 30% of the fact no longer lands on one
    reducer; phase one spreads it over 8 salted partitions, phase two
    merges 8 partial rows per key.  Counts ride as SUM(1) so every
    statistic is decomposable across the two phases.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
        F.round(F.col("l_quantity"), 0).cast("long").alias("qty"),
        F.lit(1).alias("ones"),
    )
    out = two_phase_agg(li, ["l_suppkey"], ["cents", "qty", "ones"], salt=8)
    return out.select(
        "l_suppkey",
        F.col("sum_cents").cast("long").alias("sum_cents"),
        F.col("sum_qty").cast("long").alias("sum_qty"),
        F.col("sum_ones").cast("long").alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Sketch accuracy audit: MinHash estimate vs exact Jaccard
# ---------------------------------------------------------------------------
def _sql_minhash_accuracy() -> str:
    sig_cols = ",\n             ".join(
        f"{_sql_minhash(j)} AS mh{j}" for j in range(8)
    )
    union_bands = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, mh{2 * b} * {MINHASH_P} + mh{2 * b + 1}"
        f" AS bucket FROM sig"
        for b in range(4)
    )
    est = " + ".join(
        f"CASE WHEN sa.mh{j} = sb.mh{j} THEN 1 ELSE 0 END" for j in range(8)
    )
    return f"""
    WITH
    -- MATERIALIZED throughout (the r7/r8 sf10 lesson): DuckDB 1.0
    -- inlines plain CTEs per reference — sig alone is referenced six
    -- times (4 bands + 2 final joins), so the full 8-minhash shingle
    -- derivation re-ran six times and the oracle timed out its 1800 s
    -- sf10 budget. Materialized, each derivation runs once.
    shingled AS MATERIALIZED (
      SELECT doc_id, {_SQL_SHINGLES} AS sh FROM documents),
    sig AS MATERIALIZED (
      SELECT doc_id, {sig_cols}
      FROM shingled WHERE len(sh) > 0),
    banded AS MATERIALIZED ({union_bands}),
    sized AS MATERIALIZED (
      SELECT * FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY band, bucket) AS bucket_n
        FROM banded) WHERE bucket_n <= 50),
    cand AS MATERIALIZED (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(COUNT(*) AS BIGINT) AS band_matches
      FROM sized a JOIN sized b ON a.band = b.band AND a.bucket = b.bucket
           AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    sh_str AS (
      SELECT doc_id AS id, unnest(list_distinct({_SQL_SHINGLES})) AS s
      FROM documents),
    sh AS MATERIALIZED (SELECT id, {_sql_hash64('s')} AS s FROM sh_str),
    sizes AS MATERIALIZED (
      SELECT id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY id),
    pairs AS MATERIALIZED (
      SELECT a.id AS id_a, b.id AS id_b, CAST(COUNT(*) AS BIGINT) AS common
      FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
      GROUP BY a.id, b.id),
    exact AS MATERIALIZED (
      SELECT id_a, id_b,
             CAST(FLOOR(common * 10000 / (sa.n_sh + sb.n_sh - common))
                 AS BIGINT) AS exact_bp
      FROM pairs
      JOIN sizes sa ON sa.id = id_a
      JOIN sizes sb ON sb.id = id_b)
    SELECT c.id_a, c.id_b, c.band_matches,
           CAST(({est}) * 1250 AS BIGINT) AS est_bp,
           e.exact_bp,
           CAST(ABS(({est}) * 1250 - e.exact_bp) AS BIGINT) AS err_bp
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.id_a
    JOIN sig sb ON sb.doc_id = c.id_b
    JOIN exact e ON e.id_a = c.id_a AND e.id_b = c.id_b
    """


@_q("minhash_accuracy", _sql_minhash_accuracy())
def q_minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy audit: for every LSH candidate pair, the
    MinHash-estimated Jaccard (matching signature components / 8, in
    basis points) side-by-side with the exact shingle-set Jaccard and
    the absolute error — the measurement that justifies (or indicts) a
    sketch configuration before a 100 TB dedup run commits to it.

    Scale: candidates bound the quadratic stage (banded buckets,
    50-doc skew cap) AND every stage after it: the candidate set is
    built once (lazy localCheckpoint — the LSH pipeline is the one
    unavoidable full-corpus tokenize pass), its doc ids come back as a
    broadcast semi-join ON THE DOCUMENTS SCAN, and both the signature
    re-derivation and the exact shingle verification then tokenize
    only candidate docs. MinHash signatures and shingle sets are
    per-doc quantities, so restricting the input rows cannot change
    any emitted value — the hash gate still proves the full
    formulation. The previous shape verified exact Jaccard over the
    WHOLE corpus's shared-shingle self-join and inner-joined the
    candidates afterwards (Catalyst cannot push a join below the pair
    aggregate); at sf10 that unrestricted stage was ~70% of a 45 s
    wall. Pairs produced purely by affine-hash collision share no
    shingle, get no exact row, and are dropped by the inner join — at
    60-bit hash width a ~n²/2⁶¹ event.
    """
    d = _t(spark, sf_dir, "documents")
    cand = minhash_candidates(d).localCheckpoint(eager=False)
    cand_ids = cand.select(
        F.explode(F.array("id_a", "id_b")).alias("doc_id")
    ).distinct()
    dr = d.join(F.broadcast(cand_ids), "doc_id", "left_semi")
    sig = minhash_mins(dr)
    est_matches = sum(
        F.when(F.col(f"a_mh{j}") == F.col(f"b_mh{j}"), 1).otherwise(0)
        for j in range(8)
    )
    sa = sig.select(
        F.col("id").alias("id_a"),
        *[F.col(f"mh{j}").alias(f"a_mh{j}") for j in range(8)],
    )
    sb = sig.select(
        F.col("id").alias("id_b"),
        *[F.col(f"mh{j}").alias(f"b_mh{j}") for j in range(8)],
    )
    exact = ngram_jaccard_pairs(
        dr, threshold=0.0, candidates=cand, candidates_materialized=True
    ).select("id_a", "id_b", "jaccard_bp")
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .join(exact, ["id_a", "id_b"])
        .select(
            "id_a",
            "id_b",
            "band_matches",
            (est_matches * 1250).cast("long").alias("est_bp"),
            F.col("jaccard_bp").alias("exact_bp"),
            F.abs(est_matches * 1250 - F.col("jaccard_bp"))
            .cast("long")
            .alias("err_bp"),
        )
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage: per-document OOV rate vs the corpus top-1000
# ---------------------------------------------------------------------------
@_q(
    "oov_rate",
    f"""
    WITH tok AS (
        SELECT doc_id, unnest({_SQL_TOKENS}) AS w FROM documents),
    ucnt AS (
        SELECT w, COUNT(*) AS n FROM tok GROUP BY w),
    vocab AS (
        SELECT w FROM ucnt ORDER BY n DESC, w LIMIT 1000)
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tok,
           CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
           CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) * 1000000
               // COUNT(*) AS BIGINT) AS oov_ppm
    FROM tok t LEFT JOIN vocab v ON t.w = v.w
    GROUP BY t.doc_id
    """,
)
def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus top-1000
    token vocabulary — the tokenizer-coverage check run before freezing
    a vocab (docs with high OOV either get excluded or force a vocab
    rebuild).

    Scale: the corpus is TOKENIZED ONCE into (doc_id, token, cnt)
    instance counts — one map-side-combined shuffle — and that compact
    table (≤ distinct (doc, token) pairs, lazily localCheckpointed
    because it feeds two consumers) derives BOTH the vocabulary census
    (re-aggregate on the token: no second tokenize pass) AND the
    per-doc tally (broadcast hash probe of the 1000-token vocab,
    instance counts summed — instances are never re-exploded). The
    round-5 ladder measured the old double-tokenize instance-tagging
    form at exp 1.20; this shape A/B'd 3.9-4.4 s → 2.2-2.5 s warm at
    sf10 (same JVM) with sf1→sf10 exp ≈ 0.65. The vocabulary is a
    TakeOrderedAndProject over the census with a deterministic
    (count desc, token) tiebreak.
    """
    d = _t(spark, sf_dir, "documents")
    dw = (
        d.select("doc_id", F.explode(tokens("text")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    ucnt = dw.groupBy("w").agg(F.sum("cnt").alias("n"))
    vocab = (
        ucnt.orderBy(F.desc("n"), "w")
        .limit(1000)
        .select("w", F.lit(1).alias("in_vocab"))
    )
    tagged = dw.join(F.broadcast(vocab), "w", "left")
    oov_cnt = F.sum(
        F.when(F.col("in_vocab").isNull(), F.col("cnt")).otherwise(F.lit(0))
    )
    return (
        tagged.groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_tok"),
            oov_cnt.cast("long").alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tok",
            "n_oov",
            F.expr("n_oov * 1000000 div n_tok").cast("long").alias("oov_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Boilerplate detection: high-document-frequency shingles
# ---------------------------------------------------------------------------
@_q(
    "boilerplate_shingles",
    f"""
    WITH sh AS (
        SELECT DISTINCT doc_id, unnest(list_distinct({_SQL_SHINGLES})) AS s
        FROM documents),
    df AS (
        SELECT s, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY s),
    tot AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT s AS shingle, df,
           CAST(df * 1000000 // t.n_docs AS BIGINT) AS df_ppm
    FROM df CROSS JOIN tot t
    WHERE df >= 5
    ORDER BY df DESC, shingle LIMIT 100
    """,
)
def q_boilerplate_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate candidates: 3-word shingles appearing in ≥ 5
    distinct documents, with document frequency in ppm — the
    C4/CCNet-style pass that finds navigation chrome, license headers,
    and template text to strip before training.

    Scale: per-doc distinct shingles explode linearly and aggregate
    map-side to a document-frequency table keyed by the shingle (hash
    it to 64 bits at 100 TB); the corpus total is a 1-row broadcast;
    top-100 is TakeOrderedAndProject with a deterministic (df, shingle)
    order — no global sort, no pair-wise comparison anywhere.
    """
    d = _t(spark, sf_dir, "documents")
    # tokens materialized once per row; shingles via the shifted-slice
    # zip_with form (top-level slices — never slice-inside-lambda,
    # which re-evaluates the tokenize pipeline per shingle)
    sh = (
        d.select("doc_id", tokens("text").alias("__toks__"))
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    word_shingles_from_tokens(F.col("__toks__"), 3)
                )
            ).alias("s"),
        )
        .distinct()
    )
    df = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    tot = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        df.where(F.col("df") >= 5)
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("s").alias("shingle"),
            F.col("df").cast("long").alias("df"),
            F.expr("df * 1000000 div n_docs").cast("long").alias("df_ppm"),
        )
        .orderBy(F.desc("df"), "shingle")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Inter-arrival profiling: gap histogram over per-user event sequences
# ---------------------------------------------------------------------------
_SQL_GAP_BUCKET = """
    CASE WHEN gap_s < 1 THEN 'a_lt_1s'
         WHEN gap_s < 10 THEN 'b_1_10s'
         WHEN gap_s < 60 THEN 'c_10_60s'
         WHEN gap_s < 600 THEN 'd_1_10m'
         WHEN gap_s < 3600 THEN 'e_10_60m'
         ELSE 'f_ge_1h' END
"""


@_q(
    "interarrival_hist",
    f"""
    WITH seq AS (
        SELECT user_id,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS es,
               LAG(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_es
        FROM events),
    gaps AS (
        SELECT es - prev_es AS gap_s FROM seq WHERE prev_es IS NOT NULL),
    hist AS (
        SELECT {_SQL_GAP_BUCKET} AS bucket, CAST(COUNT(*) AS BIGINT) AS n
        FROM gaps GROUP BY 1)
    SELECT bucket, n,
           CAST(n * 1000000 // SUM(n) OVER () AS BIGINT) AS share_ppm
    FROM hist
    """,
)
def q_interarrival_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of inter-arrival gaps between consecutive events per
    user, in fixed log-spaced buckets — the cadence profile that
    separates human sessions from bot bursts and informs the
    sessionization gap threshold.

    Scale: one shuffle on user_id for the LAG window (ties broken by
    event_id for a deterministic sequence); bucketing is row-local on
    the integer-second gap (no float log, so both engines agree
    exactly); the share window runs over the 6-row histogram.
    """
    ev = _t(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    seq = ev.select(
        es.alias("es"),
        F.lag(es)
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_es"),
    ).where(F.col("prev_es").isNotNull())
    gaps = seq.select((F.col("es") - F.col("prev_es")).alias("gap_s"))
    hist = gaps.select(
        F.expr(_SQL_GAP_BUCKET).alias("bucket")
    ).groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("n"))
    return hist.select(
        "bucket",
        "n",
        F.expr("n * 1000000 div sum(n) over ()").cast("long").alias(
            "share_ppm"
        ),
    )
