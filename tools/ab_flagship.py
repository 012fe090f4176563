"""Quiet-host ABBA for the flagship queries (VERDICT r7 task #2).

BENCH_r07 showed `prdct_sm_fct` 1.25→2.43 s and `scd1_merge`
0.45→1.20 s raw vs round 6 while the pure-CPU calibration cell moved
0.81→1.174 (host ~45% slower). Both queries' code is byte-identical
between the rounds (verified: `git diff f2e6af5..HEAD` on
plans/synthetic.py and operators/merge.py is empty, and bench.py runs
them through a noop sink with no write path), so the only open
question is whether the raw deltas are host drift or something
structural that calibration hides.

Protocol (same as GRAPH_SNAPSHOT_BENCH): one JVM, N interleaved
rounds, each round = calibration cell then each query (ABBA order
alternates per round so JVM-state drift cancels). Reports per-arm
mins and the calibration-normalized value (query_min / cal_min),
comparable across rounds of any host speed.

Usage: python tools/ab_flagship.py [sf_dir] [rounds]
Writes ABBA_FLAGSHIP.json at the repo root.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bikes_data_warehouse_etl_spark.plans import QUERIES  # noqa: E402
from bikes_data_warehouse_etl_spark.session import (  # noqa: E402
    get_spark,
    unpersist_all,
)

ARMS = ["prdct_sm_fct", "scd1_merge"]


def _run(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab_flagship")

    from bench import run_calibration

    times: dict[str, list[float]] = {a: [] for a in ARMS}
    cals: list[float] = []
    # warm pass (JVM/codegen warmup lands here, not in round 1)
    for a in ARMS:
        _run(QUERIES[a].spark(spark, sf_dir))
    unpersist_all(spark)

    for r in range(rounds):
        cals.append(run_calibration(spark))
        order = ARMS if r % 2 == 0 else ARMS[::-1]
        for a in order:
            times[a].append(_run(QUERIES[a].spark(spark, sf_dir)))
            unpersist_all(spark)
        print(
            f"round {r + 1}/{rounds}: cal={cals[-1]:.3f} "
            + " ".join(f"{a}={times[a][-1]:.3f}" for a in order),
            file=sys.stderr,
        )

    cal_min = min(cals)
    out = {
        "sf_dir": sf_dir,
        "rounds": rounds,
        "calibration_s": {"min": round(cal_min, 3), "all": [round(c, 3) for c in cals]},
        "queries": {
            a: {
                "min_s": round(min(v), 3),
                "median_s": round(statistics.median(v), 3),
                "all": [round(x, 3) for x in v],
                "calibrated_min": round(min(v) / cal_min, 3),
            }
            for a, v in times.items()
        },
        # r6/r7 BENCH records for the same queries, for the comparison
        # this tool exists to make (raw s, and cal-normalized)
        "reference": {
            "r6": {"calibration_s": 0.81, "prdct_sm_fct": 1.25, "scd1_merge": 0.45},
            "r7": {"calibration_s": 1.174, "prdct_sm_fct": 2.43, "scd1_merge": 1.20},
        },
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "ABBA_FLAGSHIP.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
