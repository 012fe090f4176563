"""Round-4 batch 15: telemetry debounce, shard-balance accounting,
and the decile-lift report — three more operator families with
differential oracles.

Standing contract: integer cross-engine arithmetic (cents / bp /
ppm), identical column aliases on both sides, bounded key spaces
before any joined or windowed step, scale notes inline per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Event debounce: collapse same-user same-type bursts within 5 seconds
# ---------------------------------------------------------------------------
_SQL_DEBOUNCE = """
    WITH e AS (
        SELECT event_id, user_id, event_type,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS es,
               LAG(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT), event_id)
                   AS prev_es
        FROM events)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN prev_es IS NOT NULL AND es - prev_es <= 5
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_debounced,
           CAST(COUNT(*) - SUM(CASE WHEN prev_es IS NOT NULL
                                    AND es - prev_es <= 5
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM e
    """


@_q("event_debounce", _SQL_DEBOUNCE)
def q_event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry debounce audit: events arriving within 5 s of the
    previous SAME (user, type) event are duplicates-in-spirit (double
    clicks, retry storms) and would be dropped by a debounce pass;
    this reports total / debounced / kept counts — the sizing run
    before committing the filter. Deterministic tiebreak: equal-second
    events order by event_id, so the first of a burst is kept
    regardless of arrival order.

    Scale: one shuffle on (user_id, event_type) for the lag window —
    the same partitioning the sessionizer uses (an engine running both
    reuses the exchange); per-row state dies at the aggregate, whose
    output is ONE row. The streaming twin of this predicate is
    `dropDuplicatesWithinWatermark` with a composite key
    (streaming/pipeline.py streaming_dedup shows the id form).
    """
    w = Window.partitionBy("user_id", "event_type").orderBy("es", "event_id")
    e = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_timestamp("ts").cast("long").alias("es"),
    ).withColumn("prev_es", F.lag("es").over(w))
    deb = (
        F.col("prev_es").isNotNull() & (F.col("es") - F.col("prev_es") <= 5)
    ).cast("long")
    return e.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(deb).cast("long").alias("n_debounced"),
        (F.count(F.lit(1)) - F.sum(deb)).cast("long").alias("n_kept"),
    )


# ---------------------------------------------------------------------------
# Shard-balance accounting: hash-sharded corpus with imbalance metric
# ---------------------------------------------------------------------------
_N_SHARDS = 32

_SQL_SHARD_PLAN = f"""
    WITH s AS (
        SELECT CAST(doc_id % {_N_SHARDS} AS BIGINT) AS shard,
               n_chars
        FROM documents),
    per AS (
        SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM s GROUP BY shard),
    tot AS (SELECT SUM(n_chars) AS t FROM per)
    SELECT shard, n_docs, n_chars,
           CAST(n_chars * {_N_SHARDS} * 10000 // (SELECT t FROM tot)
               AS BIGINT) AS load_bp
    FROM per
    """


@_q("shard_plan", _SQL_SHARD_PLAN)
def q_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-balance accounting for a corpus export: docs assigned to
    32 shards by key hash (deterministic, ingestion-order free), with
    each shard's doc count, char volume, and load in basis points of
    the ideal (10000 bp = perfectly even). The pre-flight check before
    writing training shards — a shard at 14000 bp means one reader
    finishes 40% late, and the fix (different key, or the
    `range_split_planner` boundaries for size-aware splits) is chosen
    from THIS table, not discovered mid-training.

    Scale: one map-side-combined aggregate to 32 rows; the scalar
    total joins back by broadcast. The modulo stands in for the
    production xxhash64-based assignment (`train_split_assign` shows
    that form) so the oracle is integer-exact.
    """
    s = _t(spark, sf_dir, "documents").select(
        (F.col("doc_id") % _N_SHARDS).cast("long").alias("shard"), "n_chars"
    )
    per = s.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )
    tot = per.agg(F.sum("n_chars").alias("t"))
    return per.join(F.broadcast(tot)).select(
        "shard",
        "n_docs",
        "n_chars",
        F.expr(f"n_chars * {_N_SHARDS} * 10000 div t").cast("long").alias(
            "load_bp"
        ),
    )


# ---------------------------------------------------------------------------
# Decile lift: customer-value concentration report
# ---------------------------------------------------------------------------
_SQL_DECILE_LIFT = """
    WITH spend AS (
        SELECT o_custkey AS ck,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey),
    ranked AS (
        SELECT ck, cents,
               NTILE(10) OVER (ORDER BY cents DESC, ck) AS decile
        FROM spend),
    per AS (
        SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_cust,
               CAST(SUM(cents) AS BIGINT) AS cents
        FROM ranked GROUP BY decile),
    tot AS (SELECT SUM(cents) AS t FROM per)
    SELECT CAST(decile AS BIGINT) AS decile, n_cust, cents,
           CAST(cents * 10000 // (SELECT t FROM tot) AS BIGINT) AS share_bp
    FROM per
    """


@_q("decile_lift", _SQL_DECILE_LIFT)
def q_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-value decile report: customers ranked by lifetime
    spend into NTILE(10) bands, each band's headcount, revenue, and
    share in basis points — the "top decile drives X% of revenue"
    concentration table every retention analysis starts from.
    Deterministic band edges: ties broken by custkey.

    Scale: the NTILE window is the one global-ordering step, but it
    runs over the PRE-AGGREGATED per-customer rollup (|customers|
    rows, not |orders|) — at 100 TB swap the exact NTILE for bands
    derived from `range_split_planner`'s histogram boundaries and the
    plan loses its single-partition stage; the rollup and shares are
    integer-exact either way. The scalar total broadcasts back.
    """
    spend = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c"),
    ).groupBy("ck").agg(F.sum("c").cast("long").alias("cents"))
    ranked = spend.withColumn(
        "decile",
        F.ntile(10).over(Window.orderBy(F.col("cents").desc(), F.col("ck"))),
    )
    per = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.sum("cents").cast("long").alias("cents"),
        # 10-row band census, TWO consumers (the scalar total and the
        # share join) — lazy localCheckpoint runs the |customers|
        # rollup + NTILE sort once instead of twice (sf10 measured 2×)
    ).localCheckpoint(eager=False)
    tot = per.agg(F.sum("cents").alias("t"))
    return per.join(F.broadcast(tot)).select(
        F.col("decile").cast("long").alias("decile"),
        "n_cust",
        "cents",
        F.expr("cents * 10000 div t").cast("long").alias("share_bp"),
    )


# ---------------------------------------------------------------------------
# Unpivot (melt): wide per-flag revenue components → long form
# ---------------------------------------------------------------------------
_SQL_UNPIVOT = """
    WITH w AS (
        SELECT l_returnflag AS flag,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS gross_cents,
               CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 100, 0)
                   AS BIGINT)) AS BIGINT) AS discount_cents,
               CAST(SUM(CAST(ROUND(l_extendedprice * l_tax * 100, 0)
                   AS BIGINT)) AS BIGINT) AS tax_cents
        FROM lineitem GROUP BY l_returnflag)
    SELECT flag, 'gross_cents' AS component, gross_cents AS cents FROM w
    UNION ALL
    SELECT flag, 'discount_cents' AS component, discount_cents AS cents FROM w
    UNION ALL
    SELECT flag, 'tax_cents' AS component, tax_cents AS cents FROM w
    """


@_q("unpivot_revenue_components", _SQL_UNPIVOT)
def q_unpivot_revenue_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): the wide per-returnflag revenue-component rollup
    reshaped to long (flag, component, cents) rows — the inverse of
    `pivot_events`, and the shape every metrics store / chart layer
    ingests. Spark side uses the NATIVE ``unpivot`` operator (an
    Expand node — map-side row multiplication, no shuffle, no UNION
    re-scan); the oracle spells the same reshape as a 3-way UNION ALL,
    so the hash match proves the operator equivalence.

    Scale: the unpivot runs on the POST-aggregate rollup (|flags|
    rows), so its 3x row multiplication is trivial; the general
    lesson pinned here is that melt is Expand — ONE pass over the
    input — where the naive UNION-of-selects formulation scans the
    input once per component column.
    """
    w = _t(spark, sf_dir, "lineitem").groupBy(
        F.col("l_returnflag").alias("flag")
    ).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("gross_cents"),
        F.sum(
            F.round(F.col("l_extendedprice") * F.col("l_discount") * 100, 0)
            .cast("long")
        )
        .cast("long")
        .alias("discount_cents"),
        F.sum(
            F.round(F.col("l_extendedprice") * F.col("l_tax") * 100, 0)
            .cast("long")
        )
        .cast("long")
        .alias("tax_cents"),
    )
    return w.unpivot(
        ids=["flag"],
        values=["gross_cents", "discount_cents", "tax_cents"],
        variableColumnName="component",
        valueColumnName="cents",
    )


# ---------------------------------------------------------------------------
# Gap-fill / densification: zero-filled daily series per segment
# ---------------------------------------------------------------------------
_SQL_PRETOKENS = r"""
    WITH pt AS (
        SELECT doc_id,
               unnest(regexp_extract_all(text,
                   '[A-Za-z]+|[0-9]+|[^A-Za-z0-9[:space:]]')) AS tok
        FROM documents)
    SELECT CASE WHEN tok ~ '^[A-Za-z]+$' THEN 'alpha'
                WHEN tok ~ '^[0-9]+$' THEN 'digits'
                ELSE 'punct' END AS tok_class,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_types,
           CAST(SUM(len(tok)) AS BIGINT) AS n_chars
    FROM pt GROUP BY 1
    """


@_q("pretoken_stats", _SQL_PRETOKENS)
def q_pretoken_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pretokenization census: text split by the
    GPT-2-family pretokenizer classes (letter runs, digit runs,
    single punctuation marks) rather than whitespace, with per-class
    token / type / char counts — the corpus profile that sizes a
    tokenizer vocabulary (alpha types ≈ word vocabulary, digit runs ≈
    number-splitting pressure, punct volume ≈ symbol table). The
    regex sticks to POSIX classes so Spark (Java regex) and DuckDB
    (RE2) tokenize byte-identically; `token_count` keeps the
    whitespace form, `bpe_merge_candidates` consumes compatible runs.

    Scale: regexp_extract_all is row-local (one Generate); the
    aggregate key domain is THREE classes, so the count shuffle is
    map-side-combined to nothing — but the distinct-type count keys on
    the token string, so that branch shuffles the type vocabulary
    (bounded by vocabulary, not corpus, size; at 100 TB hash tokens to
    8-byte longs first, `oov_rate` shows the pattern).
    """
    toks = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(
            F.expr(
                r"regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)"
            )
        ).alias("tok"),
    )
    classed = toks.withColumn(
        "tok_class",
        F.when(F.col("tok").rlike("^[A-Za-z]+$"), "alpha")
        .when(F.col("tok").rlike("^[0-9]+$"), "digits")
        .otherwise("punct"),
    )
    return classed.groupBy("tok_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.count_distinct("tok").cast("long").alias("n_types"),
        F.sum(F.length("tok")).cast("long").alias("n_chars"),
    )


_SQL_GAP_FILL = """
    WITH daily AS (
        SELECT c_mktsegment AS seg,
               CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
                   AS BIGINT) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
    spine AS (
        SELECT s.seg, g.day
        FROM (SELECT DISTINCT seg FROM daily) s
        CROSS JOIN (
            SELECT unnest(generate_series(
                (SELECT lo FROM bounds), (SELECT hi FROM bounds))) AS day) g)
    SELECT spine.seg, spine.day,
           CAST(COALESCE(daily.cents, 0) AS BIGINT) AS cents,
           CAST(CASE WHEN daily.cents IS NULL THEN 1 ELSE 0 END AS BIGINT)
               AS is_gap
    FROM spine LEFT JOIN daily
      ON spine.seg = daily.seg AND spine.day = daily.day
    """


@_q("gap_fill_daily", _SQL_GAP_FILL)
def q_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal densification: the per-segment daily revenue series
    zero-filled against a COMPLETE day spine (every segment × every
    day between corpus min and max), flagging generated gap rows —
    without this, downstream rolling windows and charts silently skip
    empty days (`rolling_7d_revenue` documents the RANGE-frame
    workaround; this materializes the honest series instead).

    Scale: the spine is generated, not scanned — `sequence()` +
    explode over the (lo, hi) day bounds, crossed with the ~5-row
    distinct segment list; its size is |segments| × |days| regardless
    of fact volume, and the LEFT join back to the daily rollup
    broadcasts the spine when small or shuffles two bounded rollups
    otherwise. Min/max bounds are one scalar aggregate broadcast back
    (same pattern as the decile total).
    """
    daily = (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
            .cast("long")
            .alias("day"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c"),
        )
        .join(
            _t(spark, sf_dir, "customer").select(
                    "c_custkey", F.col("c_mktsegment").alias("seg")
                ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("seg", "day")
        .agg(F.sum("c").cast("long").alias("cents"))
        # |segments| × |days| census, THREE consumers (bounds, segs,
        # the spine join) — lazy localCheckpoint runs the orders ⋈
        # customer build once instead of three times (the
        # `pagerank_suppliers` edge-set pattern; sf10 measured 3×).
        .localCheckpoint(eager=False)
    )
    bounds = daily.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    segs = daily.select("seg").distinct()
    spine = (
        segs.join(F.broadcast(bounds))
        .select("seg", F.explode(F.expr("sequence(lo, hi)")).alias("day"))
    )
    d = daily.select(
        F.col("seg").alias("d_seg"), F.col("day").alias("d_day"), "cents"
    )
    return (
        spine.join(
            d,
            (F.col("seg") == F.col("d_seg")) & (F.col("day") == F.col("d_day")),
            "left",
        )
        .select(
            "seg",
            "day",
            F.coalesce("cents", F.lit(0)).cast("long").alias("cents"),
            F.col("cents").isNull().cast("long").alias("is_gap"),
        )
    )
