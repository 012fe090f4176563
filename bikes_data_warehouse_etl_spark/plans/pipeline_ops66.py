"""Round-6 batch 66: Bloom-prefiltered benchmark decontamination.

``decontam_overlap`` (pipeline_ops2.py) broadcasts the benchmark's
exact shingle-hash set — right whenever the eval set is dim-sized. At
100 TB the *union of many benchmarks* can exceed any sane broadcast
budget, and the classic fix is the one Spark's own runtime filters use
(`bloom_filter_agg` / `might_contain`, not registered for SQL use in
this build — verified UNRESOLVED_ROUTINE on 4.1): condense the
benchmark side into an m-bit Bloom bitmap, broadcast the *bitmap*
(fixed 128 KiB here regardless of benchmark cardinality), prune the
corpus map-side, and run the exact verification join only on the
survivors. No false negatives means the final answer is bit-identical
to the plain anti-join the oracle runs; false positives only cost a
few extra rows through the verify join.

The whole filter is pure DataFrame ops — no UDF, no driver-side filter
object (``df.stat.bloomFilter`` collects to the driver and re-ships a
pickled object through a Python UDF; building the bitmap as an
aggregate keeps every byte JVM-side and the probe a broadcast hash
join).

Standing contract (synthetic.py module docstring): integer cross-engine
arithmetic, identical aliases both sides, bounded key domains, scale
notes inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.functions.text import (
    tokens,
    word_shingles_from_tokens,
)
from bikes_data_warehouse_etl_spark.plans.extensions import _SQL_SHINGLES
from bikes_data_warehouse_etl_spark.plans.synthetic import _q, _t

# 2^20-bit filter (16384 packed longs = 128 KiB broadcast) with k=2
# probes. At the sf0.01 benchmark volume (~60k distinct shingles) the
# expected false-positive rate is (1 - e^(-2*60e3/1048576))^2 ≈ 1.2% —
# the verify join sees ~1% of non-matching shingles instead of 100%.
# At production scale m is sized from the measured benchmark
# cardinality (m ≈ 1.44 * k * n for ~15% bits set); the plan shape is
# unchanged because m only changes a literal.
_BLOOM_M_BITS = 1 << 20
_BLOOM_K = 2


def _bloom_pos(sh: F.Column, probe: int) -> F.Column:
    """Probe ``probe``'s bit position for shingle-hash ``sh``.

    Independent probes come from re-hashing (shingle-hash, probe-id)
    through xxhash64 — no Kirsch-Mitzenmacher h1+i*h2 arithmetic, which
    could overflow under ANSI mode. pmod keeps the position in [0, m).
    """
    return F.pmod(F.xxhash64(sh, F.lit(probe)), F.lit(_BLOOM_M_BITS))


@_q(
    "bloom_decontam_keep",
    f"""
    WITH sh AS (
        SELECT doc_id, source, unnest(list_distinct({_SQL_SHINGLES})) AS s
        FROM documents),
    bench AS (SELECT DISTINCT s FROM sh WHERE source = 'src0'),
    contaminated AS (
        SELECT DISTINCT sh.doc_id
        FROM sh JOIN bench USING (s)
        WHERE sh.source <> 'src0')
    SELECT d.doc_id, d.source
    FROM documents d
    WHERE d.source <> 'src0'
      AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
    """,
)
def q_bloom_decontam_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KEPT corpus after benchmark decontamination — the anti-join
    twin of ``decontam_overlap``'s removal list — computed through a
    Bloom-bitmap prefilter so the exact verification join only ever
    sees shingles the bitmap could not rule out.

    Plan: (1) benchmark shingle hashes → k=2 probe positions → packed
    into ≤16384 (word, bits) longs via bit_or — one small aggregation,
    output size fixed at 128 KiB whatever the benchmark cardinality;
    (2) corpus shingle probes broadcast-join the bitmap words and a
    shingle survives only if BOTH probed bits are set; (3) surviving
    shingles alone flow into the exact (shuffle) join against the
    benchmark set — at 100 TB the benchmark union may be too big to
    broadcast, and this join's *corpus* side has already been cut to
    true matches + ~1% false positives, so the shuffle is candidate-
    sized, not corpus-sized; (4) distinct contaminated doc_ids
    left-anti the corpus. Bloom filters have no false negatives, so
    the result is exactly the oracle's NOT IN — the bitmap is invisible
    in the output, visible only in the bytes shuffled.

    Scale: corpus shingle strings never leave the map side (hashed to
    longs immediately); the only fact-scale exchanges are the distinct
    per-doc shingle explode feeding the probe (map-local) and the
    candidate-sized verify join; the final anti-join keys on doc_id.
    The 128 KiB bitmap broadcast replaces ``decontam_overlap``'s
    O(|bench|) exact-set broadcast.
    """
    d = _t(spark, sf_dir, "documents")
    sh = (
        d.select(
            "doc_id",
            "source",
            F.explode(
                F.array_distinct(
                    word_shingles_from_tokens(tokens(F.col("text")), 3)
                )
            ).alias("s"),
        )
        .select("doc_id", "source", F.xxhash64("s").alias("sh"))
    )
    bench = sh.filter(F.col("source") == "src0").select("sh").distinct()
    corpus = sh.filter(F.col("source") != "src0")

    # (1) build the bitmap: every probe position of every benchmark
    # shingle, packed 64 positions per word
    probes = bench.select(
        F.explode(
            F.array(*[_bloom_pos(F.col("sh"), i) for i in range(_BLOOM_K)])
        ).alias("pos")
    )
    bitmap = (
        probes.select(
            (F.col("pos") / 64).cast("long").alias("word"),
            (F.col("pos") % 64).cast("int").alias("bitpos"),
        )
        # python-side F.shiftleft only takes a literal shift; the SQL
        # form accepts a column amount
        .groupBy("word")
        .agg(F.bit_or(F.expr("shiftleft(1L, bitpos)")).alias("bits"))
    )

    # (2) probe: a corpus shingle passes iff all k probed bits are set
    cprobe = corpus.select(
        "doc_id",
        "sh",
        F.posexplode(
            F.array(*[_bloom_pos(F.col("sh"), i) for i in range(_BLOOM_K)])
        ).alias("probe", "pos"),
    ).select(
        "doc_id",
        "sh",
        (F.col("pos") / 64).cast("long").alias("word"),
        (F.col("pos").cast("int") % 64).alias("bitpos"),
    )
    hit = (
        cprobe.join(F.broadcast(bitmap), "word", "left")
        .withColumn(
            "set",
            F.coalesce(
                F.expr("(shiftright(bits, bitpos) & 1L) = 1L"), F.lit(False)
            ),
        )
        .groupBy("doc_id", "sh")
        .agg(F.min("set").alias("all_set"))
        .filter(F.col("all_set"))
    )

    # (3) exact verify on the candidate-sized survivor set — no hint on
    # purpose: Catalyst broadcasts while the bench fits the threshold
    # (it does at test sfs) and falls back to a sort-merge join on the
    # candidate-sized corpus side when a 100 TB benchmark union doesn't
    contaminated = (
        hit.join(bench, "sh").select("doc_id").distinct()
    )

    # (4) the kept corpus
    return (
        d.filter(F.col("source") != "src0")
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "source")
    )
