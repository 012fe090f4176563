"""Fault-tolerant full-suite sweep: run every declared query once at a
given sf_dir with per-query try/except, so a single failure (e.g. an
int64 overflow that only manifests at scale) cannot hide the failures
behind it the way ``bench.py``'s fail-fast loop does.

Usage: python tools/run_suite.py [sf_dir] [out_json] [query ...]

With query names, only those run (out_json may be '-' to skip the
artifact) — for A/B-ing a slow subset under different configs, e.g.
SPARK_GRAFT_SHUFFLE_PARTITIONS=128.

Writes one JSON doc: {"sf_dir": ..., "total_s": ..., "n_ok": ...,
"n_fail": ..., "queries": {name: {"s": sec}|{"error": msg}}} and
streams a progress line per query to stderr so a long scale run can be
tailed. Exit 1 if any query failed.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bikes_data_warehouse_etl_spark.session import (  # noqa: E402
    get_spark,
    unpersist_all,
)
from bikes_data_warehouse_etl_spark.plans import QUERIES  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else None
    if out == "-":
        out = None
    only = set(sys.argv[3:])
    spark = get_spark("run_suite")

    items = [
        (n, s) for n, s in QUERIES.items() if not only or n in only
    ]
    results: dict[str, dict] = {}
    t_suite = time.perf_counter()
    for i, (name, spec) in enumerate(items, 1):
        t0 = time.perf_counter()
        try:
            spec.spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.perf_counter() - t0, 3)
            results[name] = {"s": dt}
            print(f"[{i}/{len(items)}] {name}: {dt}s", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — the point is to keep going
            msg = str(e).splitlines()[0][:300]
            results[name] = {"error": msg, "s": round(time.perf_counter() - t0, 3)}
            print(f"[{i}/{len(items)}] {name}: FAIL {msg}", file=sys.stderr)
        # release localCheckpoint blocks between queries: suite memory
        # must stay flat in query count (see session.unpersist_all)
        unpersist_all(spark)
        sys.stderr.flush()

    n_fail = sum(1 for r in results.values() if "error" in r)
    doc = {
        "sf_dir": sf_dir,
        "total_s": round(time.perf_counter() - t_suite, 1),
        "n_ok": len(results) - n_fail,
        "n_fail": n_fail,
        "queries": results,
    }
    line = json.dumps(doc)
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")
    print(line)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
