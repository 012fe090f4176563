"""Interleaved same-session A/B at a scale dir: host-level noise on
this box swamps cross-run comparisons (the same query measured 92 s,
188 s and 224 s in three separate sweeps), so config and code A/Bs are
only meaningful ABBA-interleaved inside ONE JVM.

Arm 1 — AQE pre-coalesce width: initialPartitionNum is a runtime SQL
conf, toggled per run between the core count (session.py's committed
default — wider-than-cores LOST the earlier ABBA in single-JVM local
mode) and an explicit 8x value computed here, so the comparison stays
base-vs-8x even though the session default equals base.

Arm 2 — banded vs unbounded Levenshtein on the fuzzy block join
(both plans built inline; blocking identical).

Usage: python tools/ab_sf10.py [sf_dir] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from bikes_data_warehouse_etl_spark.plans import QUERIES  # noqa: E402
from bikes_data_warehouse_etl_spark.session import get_spark  # noqa: E402

INIT_CONF = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"


def run(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 1)


def fuzzy_pairs_variant(spark, sf_dir: str, banded: bool):
    from bikes_data_warehouse_etl_spark.plans.coverage import (
        fuzzy_blocked_names,
    )

    names = fuzzy_blocked_names(spark, sf_dir)
    a = names.select(
        F.col("c_custkey").alias("id_a"),
        F.col("c_name").alias("name_a"),
        F.col("c_nationkey").alias("nk"),
        "blk",
    )
    b = names.select(
        F.col("c_custkey").alias("id_b"),
        F.col("c_name").alias("name_b"),
        F.col("c_nationkey").alias("nk"),
        "blk",
    )
    j = a.join(b, ["nk", "blk"]).filter(F.col("id_a") < F.col("id_b"))
    if banded:
        j = j.withColumn(
            "edit_dist", F.levenshtein("name_a", "name_b", 3).cast("long")
        ).filter(F.col("edit_dist") >= 0)
    else:
        j = j.withColumn(
            "edit_dist", F.levenshtein("name_a", "name_b").cast("long")
        ).filter(F.col("edit_dist") <= 3)
    return j.select("id_a", "id_b", "edit_dist")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = get_spark("ab_sf10")
    base = spark.conf.get("spark.sql.shuffle.partitions")
    # session.py defaults INIT_CONF to shuffle_partitions, so reading it
    # back would silently measure base-vs-base; compute the wide arm
    # explicitly and fail fast if the two arms ever coincide.
    hi = os.environ.get("SPARK_GRAFT_AB_INITIAL", str(8 * int(base)))
    if hi == base:
        raise SystemExit("ab_sf10: hi arm equals base — nothing to A/B")
    out: list = []

    # JVM warmup outside any timed cell
    run(QUERIES["order_streaks"].spark(spark, sf_dir))

    part_qs = [
        "neardup_jaccard_fast",
        "pagerank_suppliers",
        "assoc_rules_topk",
        "triangle_census",
    ]
    for name in part_qs:
        for _ in range(rounds):
            for conf in (base, hi, hi, base):  # ABBA
                spark.conf.set(INIT_CONF, conf)
                t = run(QUERIES[name].spark(spark, sf_dir))
                rec = {"q": name, "init": conf, "s": t}
                out.append(rec)
                print(json.dumps(rec), file=sys.stderr, flush=True)

    spark.conf.set(INIT_CONF, base)  # isolate the lev arm at old width
    for _ in range(rounds):
        for banded in (False, True, True, False):
            t = run(fuzzy_pairs_variant(spark, sf_dir, banded))
            rec = {"q": "fuzzy_name_pairs", "banded": banded, "s": t}
            out.append(rec)
            print(json.dumps(rec), file=sys.stderr, flush=True)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
