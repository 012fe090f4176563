"""Headline benchmark: run every declared query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is forced with the noop sink (full compute, no driver-side
collect cost). A warmup pass on sf0.001-sized metadata is skipped —
the first query absorbs JVM/codegen warmup, which is honest for a
batch engine.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bikes_data_warehouse_etl_spark.session import get_spark  # noqa: E402
from bikes_data_warehouse_etl_spark.plans import QUERIES  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("bench")

    timings: dict[str, float] = {}
    total = 0.0
    for name, spec in QUERIES.items():
        t0 = time.perf_counter()
        df = spec.spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt

    print(
        json.dumps(
            {
                "metric": "synthetic_query_suite_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )


if __name__ == "__main__":
    main()
