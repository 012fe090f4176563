"""Round-4 batch 25: boilerplate prefix detection and integer rank
correlation.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.text import hash64, tokens
from bikes_data_warehouse_etl_spark.plans.extensions import _SQL_TOKENS, _sql_hash64
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Boilerplate prefix rate: docs sharing their opening tokens
# ---------------------------------------------------------------------------
_PREFIX_K = 8
_PREFIX_MIN_GROUP = 10

_SQL_PREFIX_RATE = f"""
    WITH p AS (
        SELECT doc_id, source,
               {_sql_hash64(f"array_to_string(list_slice({_SQL_TOKENS}, 1, {_PREFIX_K}), ' ')")}
                   AS pfx
        FROM documents),
    g AS (
        SELECT pfx, CAST(COUNT(*) AS BIGINT) AS grp FROM p GROUP BY 1)
    SELECT p.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN g.grp >= {_PREFIX_MIN_GROUP} THEN 1 ELSE 0 END)
               AS BIGINT) AS n_boiler,
           CAST(SUM(CASE WHEN g.grp >= {_PREFIX_MIN_GROUP} THEN 1 ELSE 0 END)
               * 10000 // COUNT(*) AS BIGINT) AS boiler_bp
    FROM p JOIN g ON p.pfx = g.pfx
    GROUP BY 1
    """


@_q("boilerplate_prefix_rate", _SQL_PREFIX_RATE)
def q_boilerplate_prefix_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate OPENING detection: the share of each source's docs
    whose first 8 tokens are shared with >= 10 other docs — scraped
    corpora open with cookie banners / nav headers that shingle-level
    stats (`boilerplate_shingles`) dilute across whole documents; the
    prefix hash isolates the template-opening signature specifically,
    and a high boiler_bp source routes to a header-strip pass before
    tokenization. The prefix is one md5 of the joined first-k tokens —
    portable across engines like every content hash here.

    Scale: one hash per document (not per token), one vocabulary-of-
    prefixes aggregate, one hash-keyed join back — all keys 8-byte
    longs; the group table is bounded by distinct prefixes and usually
    broadcastable. The per-source rollup is map-side combined.
    """
    p = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        hash64(
            F.array_join(F.slice(tokens(F.col("text")), 1, _PREFIX_K), " ")
        ).alias("pfx"),
    )
    g = p.groupBy("pfx").agg(F.count(F.lit(1)).cast("long").alias("grp"))
    boiler = (F.col("grp") >= _PREFIX_MIN_GROUP).cast("long")
    return (
        p.join(g, "pfx")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(boiler).cast("long").alias("n_boiler"),
        )
        .select(
            "source",
            "n_docs",
            "n_boiler",
            F.expr("n_boiler * 10000 div n_docs").cast("long").alias("boiler_bp"),
        )
    )


# ---------------------------------------------------------------------------
# Integer Spearman: length rank vs lexical-richness rank
# ---------------------------------------------------------------------------
_SQL_RANK_CORR = f"""
    WITH m AS (
        SELECT doc_id, CAST(n_chars AS BIGINT) AS len_v,
               CAST(len(list_distinct(list_filter({_SQL_TOKENS},
                   t -> t <> ''))) AS BIGINT) AS types_v
        FROM documents),
    r AS (
        SELECT doc_id,
               CAST(RANK() OVER (ORDER BY len_v, doc_id) AS BIGINT) AS r_len,
               CAST(RANK() OVER (ORDER BY types_v, doc_id) AS BIGINT)
                   AS r_types
        FROM m)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM((r_len - r_types) * (r_len - r_types)) AS BIGINT)
               AS sum_d_sq,
           CAST(10000 - 60000 * SUM((r_len - r_types) * (r_len - r_types))
               // (COUNT(*) * (COUNT(*) * COUNT(*) - 1)) AS BIGINT)
               AS spearman_bp
    FROM r
    """


@_q("rank_corr_len_richness", _SQL_RANK_CORR)
def q_rank_corr_len_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer Spearman rank correlation between document LENGTH and
    lexical RICHNESS (distinct token types): rho = 1 - 6*sum(d^2) /
    (n(n^2-1)), emitted in basis points with every term integer — rank
    ties broken by doc_id so both engines rank identically, and no
    float covariance ever exists on the parity path. Long docs being
    reliably richer (rho near 10000) is the healthy corpus shape; rho
    collapsing means padded/repetitive long docs — the cross-check on
    `length_outlier_gate`'s assumption that length is a quality proxy.

    Scale: the per-doc measures are row-local (token distinct inside
    one doc's array); the two global rank windows over |docs| rows are
    the shape to replace at 100 TB with histogram ranks
    (`length_outlier_gate` documents the same upgrade); the d^2 sum is
    one map-side-combined aggregate. Overflow policy (the sf10 run
    caught `60000 * sum_d_sq` blowing int64 at 5e5 docs — max sum_d_sq
    is n(n^2-1)/3 so the product crosses 2^63 near n=7e4): the rho
    numerator/denominator are computed in decimal(38,0) (exact to
    1e38, i.e. n ~ 2e12 docs per slice) and only the bounded quotient
    (|rho_bp| <= 10000) is cast back to long. DuckDB needs no change —
    its SUM(BIGINT) is already HUGEINT. The raw `sum_d_sq` diagnostic
    column stays int64 (exact to ~3e6 docs per slice; shard by
    lang/source beyond that — correlations are per-slice diagnostics
    anyway).
    """
    m = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("long").alias("len_v"),
        F.size(
            F.array_distinct(
                F.filter(tokens(F.col("text")), lambda t: t != "")
            )
        )
        .cast("long")
        .alias("types_v"),
    )
    r = m.select(
        F.rank().over(Window.orderBy("len_v", "doc_id")).cast("long").alias("r_len"),
        F.rank()
        .over(Window.orderBy("types_v", "doc_id"))
        .cast("long")
        .alias("r_types"),
    )
    return spearman_bp_from_ranks(r)


def spearman_bp_from_ranks(r: DataFrame) -> DataFrame:
    """Exact integer Spearman (basis points) from a frame of rank pairs
    ``(r_len, r_types)``: rho_bp = 10000 - 60000*S div n(n^2-1), with
    the product and divisor formed in decimal(38,0) so the path is
    exact far past the n≈7e4 point where ``60000*S`` leaves int64
    (pinned by ``tests/test_identities3.py``)."""
    d2 = (F.col("r_len") - F.col("r_types")) * (F.col("r_len") - F.col("r_types"))
    dec_sum = (
        "sum(cast((r_len - r_types) * (r_len - r_types) as decimal(38,0)))"
    )
    dec_n = "cast(count(*) as decimal(38,0))"
    return r.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(d2.cast("decimal(38,0)")).cast("long").alias("sum_d_sq"),
        F.expr(
            f"cast(10000 - cast(60000 as decimal(38,0)) * {dec_sum}"
            f" div ({dec_n} * ({dec_n} * {dec_n} - 1)) as long)"
        ).alias("spearman_bp"),
    )
