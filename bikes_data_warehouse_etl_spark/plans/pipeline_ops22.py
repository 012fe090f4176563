"""Round-4 batch 22: lexical statistics for corpus curation —
integer surprisal scoring, hapax-legomena rates, and term burstiness.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline. Tokenization is the shared whitespace-normalized form
(`functions/text.py tokens` == extensions._SQL_TOKENS).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.text import tokens
from bikes_data_warehouse_etl_spark.plans.extensions import _SQL_TOKENS
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Integer surprisal proxy: bit-length arithmetic instead of log()
# ---------------------------------------------------------------------------
_SQL_SURPRISAL = f"""
    WITH tok AS (
        SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents),
    tok2 AS (SELECT doc_id, term FROM tok WHERE term <> ''),
    cf AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM tok2 GROUP BY 1),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM cf),
    scored AS (
        SELECT tok2.doc_id,
               CAST(LENGTH(BIN((SELECT t FROM tot)))
                   - LENGTH(BIN(cf.n)) AS BIGINT) AS bits
        FROM tok2 JOIN cf ON tok2.term = cf.term)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(bits) AS BIGINT) AS surprisal_bits,
           CAST(SUM(bits) * 1000 // COUNT(*) AS BIGINT)
               AS bits_per_token_milli
    FROM scored GROUP BY doc_id
    """


@_q("doc_surprisal_proxy", _SQL_SURPRISAL)
def q_doc_surprisal_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document surprisal scoring WITHOUT a float log: each token
    contributes ``bitlen(total) - bitlen(count)`` bits — an integer
    proxy for -log2 p(term) accurate to <1 bit, summed per doc and
    normalized to milli-bits/token. Rare-token-heavy docs score high
    (dense technical text), near-zero docs are boilerplate — the cheap
    stand-in for model-perplexity quality filters, and being INTEGER it
    is hashable cross-engine where a float log2 never safely would be
    (both engines' log implementations are off the parity table; the
    bit length is exact). bin()'s string length gives floor(log2)+1
    identically in Spark and DuckDB.

    Scale: the term-frequency table is vocabulary-sized and joins back
    to the token stream on the term key — the same shuffle
    `tfidf_top_terms` pays; at 100 TB hash terms to 8-byte longs first
    (`oov_rate` pattern) and broadcast the CF table when the
    vocabulary fits (it usually does: vocabularies grow ~ corpus^0.5,
    Heaps' law — `vocab_coverage_curve` measures exactly that). The
    scalar total rides the CF table as a broadcast.
    """
    tok = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .filter(F.col("term") != "")
    )
    cf = tok.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = cf.agg(F.sum("n").cast("long").alias("t"))
    scored = (
        tok.join(F.broadcast(cf), "term")
        .join(F.broadcast(tot))
        .select(
            "doc_id",
            (
                F.length(F.bin(F.col("t"))) - F.length(F.bin(F.col("n")))
            )
            .cast("long")
            .alias("bits"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("bits").cast("long").alias("surprisal_bits"),
        F.expr("sum(bits) * 1000 div count(*)")
        .cast("long")
        .alias("bits_per_token_milli"),
    )


# ---------------------------------------------------------------------------
# Hapax legomena rate per source
# ---------------------------------------------------------------------------
_SQL_HAPAX = f"""
    WITH tok AS (
        SELECT source, unnest({_SQL_TOKENS}) AS term FROM documents),
    tf AS (
        SELECT source, term, CAST(COUNT(*) AS BIGINT) AS n
        FROM tok WHERE term <> '' GROUP BY 1, 2)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 10000 // COUNT(*)
               AS BIGINT) AS hapax_bp
    FROM tf GROUP BY source
    """


@_q("hapax_by_source", _SQL_HAPAX)
def q_hapax_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax-legomena rate per source: the share of term TYPES that
    occur exactly once — natural text runs ~40-60% hapax (Zipf);
    template/generated corpora collapse toward zero, OCR noise inflates
    toward 100% — so this single bp number is a fast naturalness gate
    per ingest source (the lexical sibling of `repetition_score`, which
    looks within documents; this looks across the source's vocabulary).

    Scale: one (source, term) aggregate — the shuffle carries the
    per-source vocabulary, bounded by Heaps' law, not token volume
    (map-side combine collapses the token stream first); the source
    rollup is a second tiny aggregate on the same exchange's output.
    """
    tf = (
        _t(spark, sf_dir, "documents")
        .select("source", F.explode(tokens(F.col("text"))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    hap = (F.col("n") == 1).cast("long")
    return tf.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(hap).cast("long").alias("n_hapax"),
        F.expr(
            "sum(case when n = 1 then 1 else 0 end) * 10000 div count(*)"
        )
        .cast("long")
        .alias("hapax_bp"),
    )


# ---------------------------------------------------------------------------
# Term burstiness: collection frequency vs document frequency
# ---------------------------------------------------------------------------
_SQL_BURSTINESS = f"""
    WITH tok AS (
        SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents),
    stats AS (
        SELECT term,
               CAST(COUNT(*) AS BIGINT) AS cf,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM tok WHERE term <> '' GROUP BY 1)
    SELECT term, cf, df,
           CAST(cf * 1000 // df AS BIGINT) AS burst_milli
    FROM stats
    WHERE df >= 10
    ORDER BY burst_milli DESC, term
    LIMIT 25
    """


@_q("term_burstiness", _SQL_BURSTINESS)
def q_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness: collection frequency over document frequency
    (milli-occurrences per containing doc) for terms in >= 10 docs,
    top-25. Uniform function words sit near 1000 (once per doc);
    bursty topical terms cluster their occurrences (Church & Gale) —
    and in training-data work a SUDDENLY bursty term is the signature
    of template spam flooding a source. Integer milli-ratio, ties
    broken on the term for a deterministic cut.

    Scale: one (term) aggregate with a distinct-doc count — the
    two-key distinct shuffles (term, doc_id) pairs, vocabulary x
    containing-docs bounded, then collapses; top-25 via
    TakeOrderedAndProject, never a global sort of the vocabulary.
    """
    tok = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .filter(F.col("term") != "")
    )
    stats = tok.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("cf"),
        F.count_distinct("doc_id").cast("long").alias("df"),
    )
    return (
        stats.filter(F.col("df") >= 10)
        .select(
            "term",
            "cf",
            "df",
            F.expr("cf * 1000 div df").cast("long").alias("burst_milli"),
        )
        .orderBy(F.col("burst_milli").desc(), "term")
        .limit(25)
    )
