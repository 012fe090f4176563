"""Registry-wide physical-plan audit: compile EVERY declared query's
plan (no execution — Catalyst only) and record the properties the
scale design promises, so "no cartesian anywhere", "no row-at-a-time
Python UDF anywhere", "filters reach the scans" are checked-in numbers
over the whole surface instead of per-query pins on a sample.

Per query: exchange count (shuffles are the scale currency), broadcast
exchange count, scan count + how many scans carry PushedFilters,
WholeStageCodegen span count, and the two global red flags
(CartesianProduct, BatchEvalPython — the row-UDF marker; Arrow-batched
pandas evaluation shows as ArrowEvalPython / FlatMapGroupsInPandas /
MapInArrow and is the sanctioned vectorized path).

Writes ``PLAN_AUDIT.json`` at the repo root. A handful of plan builds
execute bounded driver collects by design (1-row query vectors,
centroid seeds) — that is why this runs against sf0.001.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bikes_data_warehouse_etl_spark.plans import QUERIES  # noqa: E402
from bikes_data_warehouse_etl_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def audit_plan(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"Exchange (?:hash|range|SinglePartition)", plan)),
        "broadcasts": plan.count("BroadcastExchange"),
        "scans": plan.count("Scan parquet"),
        "scans_with_pushdown": len(
            re.findall(r"PushedFilters: \[(?!\])", plan)
        ),
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
        "cartesian": plan.count("CartesianProduct"),
        "row_python_udf": plan.count("BatchEvalPython"),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan_audit")
    per_query: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name, spec in QUERIES.items():
        try:
            plan = (
                spec.spark(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            per_query[name] = audit_plan(plan)
        except Exception as e:  # noqa: BLE001 — audit must cover the rest
            errors[name] = str(e).splitlines()[0][:200]
    bad_cartesian = sorted(
        n for n, a in per_query.items() if a["cartesian"] > 0
    )
    bad_row_udf = sorted(
        n for n, a in per_query.items() if a["row_python_udf"] > 0
    )
    out = {
        "sf_dir": sf_dir,
        "n_queries": len(per_query),
        "n_errors": len(errors),
        "errors": errors,
        "queries_with_cartesian": bad_cartesian,
        "queries_with_row_python_udf": bad_row_udf,
        "total_exchanges": sum(a["exchanges"] for a in per_query.values()),
        "total_broadcasts": sum(a["broadcasts"] for a in per_query.values()),
        "queries": per_query,
    }
    path = os.path.join(REPO, "PLAN_AUDIT.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(
        f"{len(per_query)} plans audited, {len(errors)} errors, "
        f"cartesian: {bad_cartesian}, row-python-udf: {bad_row_udf} "
        f"-> {path}"
    )
    return 0 if not (errors or bad_cartesian or bad_row_udf) else 1


if __name__ == "__main__":
    raise SystemExit(main())
