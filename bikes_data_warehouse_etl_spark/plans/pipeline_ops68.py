"""Round-6 batch 68: split-leakage audit, inter-rater agreement for
quality filters, and the dup-cluster size census.

Three audits a curation pipeline runs before anyone trains on its
output: do near-duplicates straddle the train/val/test boundary (the
leak `train_split_assign`'s fingerprint keying prevents for exact and
reordered dups but NOT for edited near-dups)? do two independent
quality heuristics actually agree (Cohen's kappa — high-accuracy raters
with near-zero kappa means the "quality" signal is majority-class
noise)? and does the exact-dup cluster-size distribution look like the
usual power law or like a generator artifact?

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.text import (
    STOPWORDS,
    stopword_count,
    token_count,
    tokens,
)
from bikes_data_warehouse_etl_spark.plans.extensions import (
    _SQL_NTOK,
    _SQL_TOKENS,
    _sql_stop,
)
from bikes_data_warehouse_etl_spark.plans.pipeline_ops29 import (
    _sdiv_expr,
    _sdiv_sql,
)
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Near-dup leakage across a naive id-keyed train/val/test split
# ---------------------------------------------------------------------------
_LEAK_MIN_BP = 2500  # near-dup = exact n-gram Jaccard >= 0.25


def _sql_split_leakage() -> str:
    from bikes_data_warehouse_etl_spark.plans.pipeline_ops5 import (
        _sql_minhash_accuracy,
    )

    return f"""
    WITH acc AS ({_sql_minhash_accuracy()}),
    sp AS (
        SELECT doc_id,
               CASE WHEN doc_id % 100 < 80 THEN 'train'
                    WHEN doc_id % 100 < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents),
    pairs AS (
        SELECT LEAST(sa.split, sb.split) AS split_lo,
               GREATEST(sa.split, sb.split) AS split_hi,
               acc.exact_bp
        FROM acc
        JOIN sp sa ON sa.doc_id = acc.id_a
        JOIN sp sb ON sb.doc_id = acc.id_b
        WHERE acc.exact_bp >= {_LEAK_MIN_BP})
    SELECT split_lo, split_hi,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN split_lo <> split_hi THEN 1 ELSE 0 END)
               AS BIGINT) AS n_leaking,
           CAST(FLOOR(CAST(SUM(exact_bp) AS DOUBLE) / COUNT(*)) AS BIGINT)
               AS mean_jaccard_bp
    FROM pairs GROUP BY split_lo, split_hi
    """


@_q("split_leakage_pairs", _sql_split_leakage())
def q_split_leakage_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate leakage audit for a NAIVE id-keyed 80/10/10
    split: every LSH-candidate pair with exact n-gram Jaccard ≥ 0.25
    is tagged with its endpoints' splits; a (train, test) or
    (train, val) row with nonzero ``n_leaking`` is test-set
    contamination that id-keyed splitting cannot see. This is the
    measurement that justifies `train_split_assign`'s
    fingerprint-keyed rule — and, run before a split ships, the gate
    that catches edited near-dups the fingerprint ALSO misses (they
    differ by tokens, so they fingerprint apart but still leak).

    Scale: the pair set is the candidate-bounded `minhash_accuracy`
    pipeline (its scale note applies — one full-corpus tokenize, all
    later stages candidate-restricted); the split tags join on doc_id
    against the candidate-pair side, which is candidate-count-sized,
    so AQE broadcasts the pairs, not the corpus. Output is ≤ 6 rows
    (split-pair combinations).
    """
    from bikes_data_warehouse_etl_spark.plans.pipeline_ops5 import (
        q_minhash_accuracy,
    )

    acc = q_minhash_accuracy(spark, sf_dir).filter(
        F.col("exact_bp") >= _LEAK_MIN_BP
    )
    sp = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 100 < 80, "train")
        .when(F.col("doc_id") % 100 < 90, "val")
        .otherwise("test")
        .alias("split"),
    )
    pairs = (
        acc.join(sp.withColumnsRenamed({"doc_id": "id_a", "split": "sa"}), "id_a")
        .join(sp.withColumnsRenamed({"doc_id": "id_b", "split": "sb"}), "id_b")
        .select(
            F.least("sa", "sb").alias("split_lo"),
            F.greatest("sa", "sb").alias("split_hi"),
            "exact_bp",
        )
    )
    return pairs.groupBy("split_lo", "split_hi").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("split_lo") != F.col("split_hi"), 1).otherwise(0))
        .cast("long")
        .alias("n_leaking"),
        F.floor(F.sum("exact_bp").cast("double") / F.count(F.lit(1)))
        .cast("long")
        .alias("mean_jaccard_bp"),
    )


# ---------------------------------------------------------------------------
# Cohen's kappa between two independent quality heuristics
# ---------------------------------------------------------------------------
_SQL_KAPPA = f"""
    WITH r AS (
        SELECT CASE WHEN {_sql_stop(STOPWORDS['en'])} * 4 >= {_SQL_NTOK}
                    THEN 1 ELSE 0 END AS ra,
               CASE WHEN n_chars BETWEEN 100 AND 2000
                         AND {_SQL_NTOK} >= 20
                    THEN 1 ELSE 0 END AS rb
        FROM documents),
    cm AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN ra = 0 AND rb = 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n00,
               CAST(SUM(CASE WHEN ra = 0 AND rb = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n01,
               CAST(SUM(CASE WHEN ra = 1 AND rb = 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n10,
               CAST(SUM(CASE WHEN ra = 1 AND rb = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n11
        FROM r)
    SELECT n AS n_docs, n00, n01, n10, n11,
           CAST({_sdiv_sql(
               "(n * (n00 + n11)"
               " - ((n00 + n01) * (n00 + n10) + (n10 + n11) * (n01 + n11)))"
               " * 1000",
               "n * n"
               " - ((n00 + n01) * (n00 + n10) + (n10 + n11) * (n01 + n11))",
           )} AS BIGINT) AS kappa_milli
    FROM cm
    """


@_q("quality_rater_kappa", _SQL_KAPPA)
def q_quality_rater_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa (in milli) between two independent quality
    heuristics — rater A: English stopword mass ≥ 25% of tokens
    (fluency proxy); rater B: 100-2000 chars AND ≥ 20 tokens (length
    sanity). Raw agreement over-credits raters that both mostly say
    "pass"; kappa subtracts the chance-agreement floor, and a
    curation pipeline promotes a heuristic to a FILTER only when its
    kappa against an independent signal clears a bar. Confusion-matrix
    counts ship alongside so the readout is auditable.

    Scale: both raters are row-local integer predicates over one
    tokenize pass; the confusion matrix is a single 5-long partial
    aggregate (no keys, no shuffle beyond the 1-row combine). Kappa =
    (N·agree − Σ marginal products) / (N² − Σ marginal products) in
    exact int64 (N ≤ ~2.5M per shard keeps N² < 2⁶³; at larger N the
    division inputs move to decimal like the second-moment family) —
    truncation-toward-zero via the shared sign-abs form because kappa
    is legitimately negative for systematically-disagreeing raters.
    """
    d = _t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    r = d.select(
        F.when(
            stopword_count("text", "en", toks=toks) * 4
            >= token_count("text", toks=toks),
            1,
        )
        .otherwise(0)
        .alias("ra"),
        F.when(
            F.col("n_chars").between(100, 2000)
            & (token_count("text", toks=toks) >= 20),
            1,
        )
        .otherwise(0)
        .alias("rb"),
    )
    cm = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[
            F.sum(
                F.when((F.col("ra") == a) & (F.col("rb") == b), 1).otherwise(0)
            )
            .cast("long")
            .alias(f"n{a}{b}")
            for a in (0, 1)
            for b in (0, 1)
        ],
    )
    pe_prod = (
        "((n00 + n01) * (n00 + n10) + (n10 + n11) * (n01 + n11))"
    )
    return cm.select(
        F.col("n").alias("n_docs"),
        "n00",
        "n01",
        "n10",
        "n11",
        F.expr(
            "CAST("
            + _sdiv_expr(
                f"(n * (n00 + n11) - {pe_prod}) * 1000",
                f"n * n - {pe_prod}",
            )
            + " AS LONG)"
        ).alias("kappa_milli"),
    )


# ---------------------------------------------------------------------------
# Exact-dup cluster-size census
# ---------------------------------------------------------------------------
_SQL_DUP_HIST = f"""
    WITH g AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS cluster_size
        FROM documents
        GROUP BY array_to_string(list_sort(list_distinct({_SQL_TOKENS})), ' '))
    SELECT cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs,
           CAST((cluster_size - 1) * COUNT(*) AS BIGINT) AS n_removable
    FROM g GROUP BY cluster_size
    """


@_q("dup_cluster_histogram", _SQL_DUP_HIST)
def q_dup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate cluster-size census over the token-SET fingerprint
    (the `dedup_fingerprint` / `train_split_assign` key — catches
    byte-exact AND token-reordered duplicates): for each cluster size,
    how many content clusters have it, how many documents they hold,
    and how many a fingerprint-dedup pass would remove. Real web
    corpora show a power-law tail here; a spike at one size is a
    generator or boilerplate artifact — `dedup_savings` gives the
    one-number summary, this gives the distribution that explains it.

    Scale: two chained aggregates on 8-byte keys — (fingerprint) →
    cluster sizes, (cluster_size) → histogram; text never shuffles
    (the oracle groups by the raw sorted-token string, exact
    semantics, so the gate re-certifies the 64-bit-hash assumption).
    Output is max-cluster-size rows.
    """
    from bikes_data_warehouse_etl_spark.functions.text import fingerprint

    d = _t(spark, sf_dir, "documents")
    g = d.groupBy(fingerprint("text").alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return g.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1)))
        .cast("long")
        .alias("n_docs"),
        ((F.col("cluster_size") - 1) * F.count(F.lit(1)))
        .cast("long")
        .alias("n_removable"),
    )
