"""Snapshot-arm measurement for the graph family (SCALING.md's second
table): one-time ``build_edges_snapshot`` cost + per-query wall with
``SPARK_GRAFT_EDGE_SNAPSHOT=1`` (min over N passes, same JVM).

The inline-arm numbers live in the main SCALING ladder (the default
self-contained build the oracle gate exercises); this artifact records
the build-graph-once, query-many shape a real 100x user runs. The r7
GRAPH_SNAPSHOT_BENCH measured the same arms ABBA under heavy load (the
ratio was the point); this tool is the quiet-host absolute companion.

Usage: python tools/bench_graph_snapshot.py [sf_dir] [passes] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAMILY = [
    "triangle_census",
    "pagerank_suppliers",
    "kcore_peel",
    "link_prediction_cn",
    "adamic_adar_topk",
    "graph_modularity",
    "degree_assortativity",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    out = (
        sys.argv[3]
        if len(sys.argv) > 3
        else f"scaling_runs/graph_snap_r8_{os.path.basename(sf_dir.rstrip('/'))}.json"
    )

    from bikes_data_warehouse_etl_spark.plans import QUERIES
    from bikes_data_warehouse_etl_spark.plans.pipeline_ops16 import (
        build_edges_snapshot,
    )
    from bikes_data_warehouse_etl_spark.session import get_spark, unpersist_all

    spark = get_spark("bench_graph_snapshot")
    t0 = time.perf_counter()
    tbl = build_edges_snapshot(spark, sf_dir)
    build_s = round(time.perf_counter() - t0, 1)

    prior = os.environ.get("SPARK_GRAFT_EDGE_SNAPSHOT")
    os.environ["SPARK_GRAFT_EDGE_SNAPSHOT"] = "1"
    try:
        times: dict[str, list[float]] = {q: [] for q in FAMILY}
        for _ in range(passes):
            for q in FAMILY:
                t0 = time.perf_counter()
                QUERIES[q].spark(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                times[q].append(time.perf_counter() - t0)
                unpersist_all(spark)
                print(f"{q}: {times[q][-1]:.2f}s", file=sys.stderr)
    finally:
        if prior is None:
            del os.environ["SPARK_GRAFT_EDGE_SNAPSHOT"]
        else:
            os.environ["SPARK_GRAFT_EDGE_SNAPSHOT"] = prior

    doc = {
        "sf_dir": sf_dir,
        "snapshot_table": tbl,
        "build_snapshot_s": build_s,
        "passes": passes,
        "queries": {q: {"s": round(min(v), 3)} for q, v in times.items()},
        "family_total_s": round(sum(min(v) for v in times.values()), 1),
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
