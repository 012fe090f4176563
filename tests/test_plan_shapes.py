"""Physical-plan regression pins: the scale-critical plan shapes
documented in PERF.md must not silently degrade."""

from __future__ import annotations

import pytest

from bikes_data_warehouse_etl_spark.plans import QUERIES

EXPECTATIONS = {
    # grouped top-k keeps a per-partition heap, no full sort
    "top3_orders_per_cust": ["WindowGroupLimit"],
    # global top-k never materializes a global sort
    "top_revenue": ["TakeOrderedAndProject"],
    "embedding_topk": ["TakeOrderedAndProject"],
    # CDC and EXISTS compile to the dedicated join types
    "ordr_dtl_fct_cdc": ["LeftAnti"],
    "semi_join_urgent_customers": ["LeftSemi"],
    # dims broadcast
    "cust_dim": ["BroadcastHashJoin"],
}

FORBIDDEN = {
    # no cartesian products anywhere in the declared suite
    name: ["CartesianProduct"]
    for name in EXPECTATIONS
}


def _plan(spark, sf_dir, name: str) -> str:
    return (
        QUERIES[name]
        .spark(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


@pytest.mark.parametrize("name", sorted(EXPECTATIONS))
def test_plan_contains_expected_operators(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    for needle in EXPECTATIONS[name]:
        assert needle in plan, f"{name}: expected {needle} in physical plan"
    for needle in FORBIDDEN[name]:
        assert needle not in plan, f"{name}: {needle} must not appear"


def test_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pushdown_scan")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # column pruning: the scan must not read all 11 lineitem columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_returnflag" not in read_schema and "l_tax" not in read_schema
