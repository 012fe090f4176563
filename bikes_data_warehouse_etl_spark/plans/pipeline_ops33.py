"""Round-4 batch 33: cross-domain language statistics and multi-probe
near-dup search — a source×source cross-surprisal matrix, Hamming-≤2
SimHash candidate pairs via neighbor probing, and the effective
post-dedup token budget.

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.text import hash64, tokens
from bikes_data_warehouse_etl_spark.operators.dedup import simhash_per_doc
from bikes_data_warehouse_etl_spark.plans.extensions import (
    _SQL_TOKENS,
    _sql_hash64,
)
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t


# ---------------------------------------------------------------------------
# Cross-source surprisal matrix: train-on-A, evaluate-on-B
# ---------------------------------------------------------------------------
_SQL_XSURPRISAL = f"""
    WITH tok AS (
        SELECT doc_id, source, unnest({_SQL_TOKENS}) AS term
        FROM documents),
    tok2 AS (SELECT source, term FROM tok WHERE term <> ''),
    cf AS (
        SELECT source AS tsrc, term, CAST(COUNT(*) AS BIGINT) AS n
        FROM tok2 GROUP BY 1, 2),
    tot AS (
        SELECT tsrc, CAST(SUM(n) AS BIGINT) AS t,
               CAST(LENGTH(BIN(SUM(n))) AS BIGINT) AS tbits
        FROM cf GROUP BY 1),
    ev AS (
        SELECT source AS esrc, term, CAST(COUNT(*) AS BIGINT) AS n_ev
        FROM tok2 GROUP BY 1, 2),
    scored AS (
        SELECT tot.tsrc, ev.esrc, ev.n_ev,
               ev.n_ev * (tot.tbits
                          - COALESCE(CAST(LENGTH(BIN(cf.n)) AS BIGINT),
                                     CAST(-1 AS BIGINT))) AS bits
        FROM ev CROSS JOIN tot
        LEFT JOIN cf ON cf.tsrc = tot.tsrc AND cf.term = ev.term)
    SELECT tsrc, esrc,
           CAST(SUM(n_ev) AS BIGINT) AS n_tokens,
           CAST(SUM(bits) AS BIGINT) AS xent_bits,
           CAST(SUM(bits) * 1000 // SUM(n_ev) AS BIGINT)
               AS bits_per_token_milli
    FROM scored GROUP BY 1, 2
    """


@_q("cross_source_surprisal", _SQL_XSURPRISAL)
def q_cross_source_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-DOMAIN surprisal matrix: score every source's tokens
    under every OTHER source's unigram frequencies using the
    bit-length surprisal proxy (`doc_surprisal_proxy`'s log-free
    trick; an OOV term costs bitlen(total)+1 bits — one bit past the
    rarest-possible in-vocab term). The diagonal approximates each
    source's own entropy; a row whose off-diagonal cost explodes is a
    DOMAIN ISLAND — exactly the signal `mixture_weights` needs when
    deciding whether a source can be down-weighted without losing
    unique coverage (cross-perplexity is how data-mixture papers
    measure redundancy between corpora).

    Scale: token censuses shuffle on (source, term) — vocabulary ×
    sources bounded after map-side combine; the matrix join is
    eval-census × |sources| (the CROSS JOIN is with the |sources|-row
    totals table, broadcast); output is |sources|². Nothing touches
    raw token streams after the first aggregate.
    """
    tok2 = (
        _t(spark, sf_dir, "documents")
        .select("source", F.explode(tokens(F.col("text"))).alias("term"))
        .where(F.col("term") != "")
    )
    cf = tok2.groupBy(
        F.col("source").alias("tsrc"), "term"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = cf.groupBy("tsrc").agg(
        F.sum("n").cast("long").alias("t"),
        F.length(F.bin(F.sum("n"))).cast("long").alias("tbits"),
    )
    ev = tok2.groupBy(
        F.col("source").alias("esrc"), "term"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_ev"))
    cfa = cf.select(
        F.col("tsrc").alias("c_tsrc"),
        F.col("term").alias("c_term"),
        F.col("n").alias("c_n"),
    )
    scored = (
        ev.crossJoin(F.broadcast(tot))
        .join(
            cfa,
            (F.col("c_tsrc") == F.col("tsrc"))
            & (F.col("c_term") == F.col("term")),
            "left",
        )
        .select(
            "tsrc",
            "esrc",
            "n_ev",
            (
                F.col("n_ev")
                * (
                    F.col("tbits")
                    - F.coalesce(
                        F.length(F.bin(F.col("c_n"))).cast("long"),
                        F.lit(-1).cast("long"),
                    )
                )
            ).alias("bits"),
        )
    )
    return scored.groupBy("tsrc", "esrc").agg(
        F.sum("n_ev").cast("long").alias("n_tokens"),
        F.sum("bits").cast("long").alias("xent_bits"),
        F.expr("sum(bits) * 1000 div sum(n_ev)")
        .cast("long")
        .alias("bits_per_token_milli"),
    )


# ---------------------------------------------------------------------------
# SimHash multi-probe: Hamming-distance-≤2 candidate pairs
# ---------------------------------------------------------------------------
_MP_BITS = 16

_SQL_SIMHASH_SIG = f"""
    hs AS (
      SELECT doc_id, list_transform({_SQL_TOKENS}, t -> {_sql_hash64('t')}) AS h
      FROM documents
    ),
    sig AS (
      SELECT doc_id, {' + '.join(
          f"(CASE WHEN list_sum(list_transform(h, x -> CASE WHEN (x >> {b}) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN {2**b} ELSE 0 END)"
          for b in range(_MP_BITS)
      )} AS simhash
      FROM hs
    )"""

_SQL_MULTIPROBE = f"""
    WITH {_SQL_SIMHASH_SIG},
    sigc AS (
        SELECT CAST(simhash AS BIGINT) AS sh, CAST(COUNT(*) AS BIGINT) AS n
        FROM sig GROUP BY 1),
    probes AS (
        SELECT sh, n,
               unnest(list_append(list_transform(generate_series(0, {_MP_BITS - 1}),
                      b -> CAST(xor(sh, 1 << b) AS BIGINT)),
                      sh)) AS probe
        FROM sigc),
    spairs AS (
        SELECT DISTINCT a.sh AS sh_a, b.sh AS sh_b, a.n AS n_a, b.n AS n_b,
               CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
        FROM probes a JOIN probes b
          ON a.probe = b.probe AND a.sh < b.sh),
    census AS (
        SELECT hamming, CAST(SUM(n_a * n_b) AS BIGINT) AS n_pairs
        FROM spairs WHERE hamming <= 2 GROUP BY 1
        UNION ALL
        SELECT CAST(0 AS BIGINT), s FROM (
            SELECT CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS s
            FROM sigc WHERE n >= 2)
        WHERE s IS NOT NULL)
    SELECT hamming, CAST(SUM(n_pairs) AS BIGINT) AS n_pairs
    FROM census GROUP BY 1
    """


@_q("simhash_multiprobe", _SQL_MULTIPROBE)
def q_simhash_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-PROBE SimHash: near-dup candidate pairs within Hamming
    distance ≤ 2 of the 16-bit signature — `simhash_groups` only finds
    EXACT signature collisions, which misses a near-dup whose one
    noisy token flips one bit; probing each signature's 1-bit
    neighborhood ({h} ∪ {h⊕2^b}) makes two signatures collide iff
    their distance is ≤ 2 (d=1 → one side's flip lands on the other;
    d=2 → both flip toward the middle), the classic multi-probe LSH
    recall/cost trade. Output is the Hamming census of the verified
    pair set (the popcount filter re-checks distance exactly — probe
    collisions at d>2 cannot happen, but the guard keeps the contract
    explicit).

    Scale: the probe join runs on DISTINCT SIGNATURES with
    multiplicities, never on documents — a template cluster of 471
    identical signatures is ONE probe row and its internal pairs are
    the combinatorial C(n,2), while the doc-level join squared such
    clusters (measured 18 s → ~1 s at sf1). 17 probes per unique
    signature (bits+1, row-local explode of longs), one equi-join on
    the probe key bounded by the ≤2^16 signature space; DISTINCT
    dedupes the ≤2 collisions a d≤2 signature pair can produce;
    cross-signature pair counts multiply multiplicities. Probing to
    d≤4 squares the probe count, not the data.
    """
    sig = simhash_per_doc(_t(spark, sf_dir, "documents"), bits=_MP_BITS)
    sigc = sig.groupBy(F.col("simhash").cast("long").alias("sh")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    probes = sigc.select(
        "sh",
        "n",
        F.explode(
            F.array_union(
                F.array(
                    *[
                        F.col("sh").bitwiseXOR(F.lit(1 << b)).cast("long")
                        for b in range(_MP_BITS)
                    ]
                ),
                F.array(F.col("sh")),
            )
        ).alias("probe"),
    )
    a = probes.select(F.col("sh").alias("sh_a"), F.col("n").alias("n_a"), "probe")
    b = probes.select(F.col("sh").alias("sh_b"), F.col("n").alias("n_b"), "probe")
    spairs = (
        a.join(b, "probe")
        .where(F.col("sh_a") < F.col("sh_b"))
        .select(
            "sh_a",
            "sh_b",
            "n_a",
            "n_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
            .cast("long")
            .alias("hamming"),
        )
        .distinct()
    )
    cross = (
        spairs.where(F.col("hamming") <= 2)
        .groupBy("hamming")
        .agg(F.sum(F.col("n_a") * F.col("n_b")).cast("long").alias("n_pairs"))
    )
    within = (
        sigc.where(F.col("n") >= 2)
        .agg(F.sum(F.expr("n * (n - 1) div 2")).cast("long").alias("n_pairs"))
        .where(F.col("n_pairs").isNotNull())
        .select(F.lit(0).cast("long").alias("hamming"), "n_pairs")
    )
    return (
        cross.unionAll(within)
        .groupBy("hamming")
        .agg(F.sum("n_pairs").cast("long").alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# Effective token budget after exact dedup, per source
# ---------------------------------------------------------------------------
_SQL_TOKEN_BUDGET = f"""
    WITH d AS (
        SELECT doc_id, source,
               CAST(len(list_filter({_SQL_TOKENS}, t -> t <> '')) AS BIGINT)
                   AS n_tok,
               {_sql_hash64(f"array_to_string({_SQL_TOKENS}, ' ')")} AS fp
        FROM documents),
    keep AS (
        SELECT fp, CAST(MIN(doc_id) AS BIGINT) AS keep_id FROM d GROUP BY 1)
    SELECT d.source,
           CAST(SUM(d.n_tok) AS BIGINT) AS raw_tokens,
           CAST(SUM(CASE WHEN d.doc_id = keep.keep_id THEN d.n_tok ELSE 0 END)
               AS BIGINT) AS kept_tokens,
           CAST((SUM(d.n_tok) - SUM(CASE WHEN d.doc_id = keep.keep_id
                THEN d.n_tok ELSE 0 END)) * 10000 // SUM(d.n_tok) AS BIGINT)
               AS dup_tax_bp
    FROM d JOIN keep ON d.fp = keep.fp
    GROUP BY 1
    """


@_q("effective_token_budget", _SQL_TOKEN_BUDGET)
def q_effective_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EFFECTIVE TOKEN BUDGET: per source, raw token count vs tokens
    surviving exact content dedup (keep-smallest-id per normalized
    fingerprint) and the duplication tax in bp — `dedup_savings`
    counts documents and characters; TRAINING budgets are set in
    TOKENS, and a source whose dup_tax_bp is high contributes far
    fewer effective tokens than its raw size suggests (the number
    `mixture_weights` should divide by). Fingerprint = one md5 of the
    normalized token stream per doc; token counts are row-local.

    Scale: one hash + one count per document (no per-token state past
    the tokenizer), a fingerprint-keyed group for keepers (text never
    shuffles — the `dedup_exact` argument), one hash-keyed join back,
    and a |sources|-domain rollup. Swapping exact for near-dup
    (`neardup_components` labels) changes only the keep table.
    """
    toks = tokens(F.col("text"))
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.filter(toks, lambda t: t != "")).cast("long").alias("n_tok"),
        hash64(F.array_join(toks, " ")).alias("fp"),
    )
    keep = d.groupBy("fp").agg(F.min("doc_id").cast("long").alias("keep_id"))
    kept_tok = F.when(F.col("doc_id") == F.col("keep_id"), F.col("n_tok")).otherwise(
        F.lit(0)
    )
    return (
        d.join(keep, "fp")
        .groupBy("source")
        .agg(
            F.sum("n_tok").cast("long").alias("raw_tokens"),
            F.sum(kept_tok).cast("long").alias("kept_tokens"),
        )
        .select(
            "source",
            "raw_tokens",
            "kept_tokens",
            F.expr("(raw_tokens - kept_tokens) * 10000 div raw_tokens")
            .cast("long")
            .alias("dup_tax_bp"),
        )
    )
