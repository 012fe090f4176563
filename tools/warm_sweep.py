"""Warm mini-sweep for a few queries: one JVM, a burn-in pass, then N
measured passes, each written as a ``run_suite``-shaped artifact.

Usage:
    python tools/warm_sweep.py SF_DIR OUT_PREFIX N_PASSES QUERY [QUERY ...]

Writes ``OUT_PREFIX`` + ``a.json``, ``b.json``, ... (one artifact per
measured pass) so ``scaling_report.py`` can min over them exactly like
full-sweep artifacts.

Why this exists: the full-ladder sweeps (tools/run_suite.py over all
queries) measure any given query in a WARM JVM — it runs mid-registry,
after hundreds of queries amortized codegen/classloading. A mini-sweep
of 2-3 rewritten queries in a fresh process puts the entire JVM warmup
(~5-8 s) on the first query and overstates it relative to its
full-sweep row. The burn-in pass here restores the full-sweep measuring
condition; artifacts record warm passes only.
"""

from __future__ import annotations

import json
import os
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bikes_data_warehouse_etl_spark.session import (  # noqa: E402
    get_spark,
    unpersist_all,
)
from bikes_data_warehouse_etl_spark.plans import QUERIES  # noqa: E402


def main() -> int:
    if len(sys.argv) < 5:
        print(__doc__)
        return 2
    sf_dir, prefix, n_passes = sys.argv[1], sys.argv[2], int(sys.argv[3])
    names = sys.argv[4:]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2
    spark = get_spark("warm_sweep")

    def one_pass() -> dict[str, dict]:
        out: dict[str, dict] = {}
        for name in names:
            t0 = time.perf_counter()
            QUERIES[name].spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            out[name] = {"s": round(time.perf_counter() - t0, 3)}
            unpersist_all(spark)
        return out

    burn = one_pass()  # JVM/codegen warmup — not recorded
    print(f"burn-in: {burn}", file=sys.stderr)
    for i in range(n_passes):
        qs = one_pass()
        path = f"{prefix}{string.ascii_lowercase[i]}.json"
        with open(path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "warm_pass": i + 1,
                    "total_s": round(sum(v["s"] for v in qs.values()), 1),
                    "n_ok": len(qs),
                    "n_fail": 0,
                    "queries": qs,
                },
                f,
            )
        print(f"pass {i + 1}: {qs} -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
