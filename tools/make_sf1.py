"""Synthesize an sf1-scale dataset (~6M lineitem) by replicating
/root/testdata/sf0.1 10x with DISJOINT keys, for the PERF.md scale
proof. Output: /tmp/sf1 (override with $SPARK_GRAFT_SF1_DIR).

Replication rules — chosen so every query's work grows ~linearly, the
way real sf1 data would, instead of degenerately:

* Join keys are offset per replica (custkey, orderkey, partkey,
  suppkey, event/user ids, doc/vec ids) so join fan-outs and group
  cardinalities scale 10x, not collide 10-deep.
* ``region``/``nation`` stay fixed — dimensions don't scale in TPC-H
  either; dim joins stay broadcast-sized, which is the realistic shape.
* ``documents.text`` gets a per-replica Caesar rotation of the letters
  (JVM-side ``translate``): identical text replicated 10x would give
  every doc 9 exact clones — exact-dedup output collapses and every
  near-dup/LSH query goes quadratic in replica count, which sf1-real
  data would NOT do. Rotation keeps token structure and lengths but
  makes shingle sets disjoint across replicas, so dedup cluster sizes
  and pair counts stay sf0.1-like per replica. Replica 0 is the
  identity rotation (byte-identical to sf0.1).
* ``embeddings.embedding`` vectors are kept as-is (distances repeat
  across replicas; top-k work still scales with row count).

Usage: python tools/make_sf1.py [out_dir] [--replicas N]

``--replicas 100`` produces an sf10-scale set (~60M lineitem) with the
same disjoint-key discipline; text transforms stay UNIQUE per replica
(rotations for i < 26, seeded alphabet permutations beyond — see
``_rot``), so near-dup pair counts scale linearly at any replica count
and sf10 exponents measure the engine, not a generator collision.
"""

from __future__ import annotations

import os
import string
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from bikes_data_warehouse_etl_spark.session import get_spark
from bikes_data_warehouse_etl_spark.sources.parquet import read_table

SRC = "/root/testdata/sf0.1"
N_REPLICAS = 10
# key offsets safely above each table's sf0.1 max key
OFF = {
    "custkey": 1_000_000,
    "orderkey": 10_000_000,
    "partkey": 1_000_000,
    "suppkey": 100_000,
    "event": 100_000_000,
    "user": 1_000_000,
    "doc": 1_000_000,
    "vec": 1_000_000,
}


def _rot(i: int) -> tuple[str, str]:
    """Per-replica letter permutation for documents.text.

    Replicas 0-25 keep the original Caesar rotation — /tmp/sf1 (10
    replicas) and its checked-in 302/303 oracle matrix stay
    byte-identical. Replicas >= 26 get a seeded Fisher-Yates
    permutation of the alphabet instead of a cycled rotation: with
    cycling, replicas i and i+26 shared a rotation, so their texts
    were exact duplicates under different doc_ids and every near-dup
    query's OUTPUT grew quadratically in replica count at sf10 — a
    generator artifact, not an engine behavior (measured: exp 1.9 on
    neardup_jaccard_fast at 100 replicas). Distinct permutations keep
    shingle sets disjoint across all replicas (vocabulary words are
    3-7 letters; two different permutations map a word to the same
    image only on a measure-zero coincidence), so pair counts stay
    sf0.1-like per replica at any replica count.
    """
    lower = string.ascii_lowercase
    upper = string.ascii_uppercase
    if i < 26:
        return (
            lower + upper,
            lower[i:] + lower[:i] + upper[i:] + upper[:i],
        )
    import random

    perm = list(lower)
    random.Random(i).shuffle(perm)
    p = "".join(perm)
    return (lower + upper, p + p.upper())


def replicate(df, i: int, offsets: dict[str, int], text_cols=()):
    out = df
    for col, off in offsets.items():
        out = out.withColumn(col, F.col(col) + F.lit(i * off))
    for col in text_cols:
        src, dst = _rot(i)
        out = out.withColumn(col, F.translate(F.col(col), src, dst))
    return out


def main() -> None:
    global N_REPLICAS
    args = sys.argv[1:]
    if "--replicas" in args:
        i = args.index("--replicas")
        N_REPLICAS = int(args[i + 1])
        del args[i : i + 2]
    # The SCD1 synthetic-insert offset (custkey + 100_000_000 in
    # plans/synthetic.py) is only disjoint from replicated custkeys
    # while the LARGEST replica offset, (N_REPLICAS - 1) * stride,
    # plus the source's max custkey (< one stride) stays below it —
    # i.e. N_REPLICAS * stride <= 100_000_000. Beyond that "inserts"
    # silently collide with real keys and become updates, breaking
    # the SCD1 differential. Replica indices are 0-based: N replicas
    # use offsets 0..(N-1) * stride, so N = 100 (sf10) is the exact
    # safe maximum, not the first colliding value.
    if N_REPLICAS * OFF["custkey"] > 100_000_000:
        raise SystemExit(
            f"make_sf1: --replicas {N_REPLICAS} collides with the SCD1 "
            f"insert-key offset (max {100_000_000 // OFF['custkey']})"
        )
    out_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF1_DIR", "/tmp/sf1"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("make-sf1")

    plans = {
        "region": {},
        "nation": {},
        "customer": {"c_custkey": OFF["custkey"]},
        "supplier": {"s_suppkey": OFF["suppkey"]},
        "part": {"p_partkey": OFF["partkey"]},
        "orders": {
            "o_orderkey": OFF["orderkey"],
            "o_custkey": OFF["custkey"],
        },
        "lineitem": {
            "l_orderkey": OFF["orderkey"],
            "l_partkey": OFF["partkey"],
            "l_suppkey": OFF["suppkey"],
        },
        "events": {"event_id": OFF["event"], "user_id": OFF["user"]},
        "documents": {"doc_id": OFF["doc"]},
        "embeddings": {"vec_id": OFF["vec"]},
    }
    text_cols = {"documents": ("text",)}

    for name, offsets in plans.items():
        base = read_table(spark, SRC, name)
        if not offsets:  # fixed dimensions: copy once
            out = base
        else:
            parts = [
                replicate(base, i, offsets, text_cols.get(name, ()))
                for i in range(N_REPLICAS)
            ]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        dest = os.path.join(out_dir, f"{name}.parquet")
        # single-file layout to mirror the testdata dirs (read_table
        # expects {dir}/{name}.parquet); write dir-as-file is fine for
        # spark.read.parquet but keep row-group parallelism inside
        out.write.mode("overwrite").parquet(dest)
        n = spark.read.parquet(dest).count()
        print(f"{name}: {n} rows -> {dest}")


if __name__ == "__main__":
    main()
