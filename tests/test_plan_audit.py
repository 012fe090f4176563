"""Registry-wide plan-audit ratchet: the committed PLAN_AUDIT.json
(tools/plan_audit.py — compiles every query's physical plan) must be
clean and must cover the CURRENT registry, so growing the surface
without re-auditing fails here instead of silently shipping an
unaudited plan. The expensive audit itself runs out-of-band; this test
pins its artifact the way BENCH gates pin bench artifacts."""

from __future__ import annotations

import json
import os

from bikes_data_warehouse_etl_spark.plans import QUERIES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _audit() -> dict:
    with open(os.path.join(REPO, "PLAN_AUDIT.json")) as f:
        return json.load(f)


def test_audit_covers_current_registry():
    a = _audit()
    missing = sorted(set(QUERIES) - set(a["queries"]))
    assert missing == [], (
        f"queries missing from PLAN_AUDIT.json (rerun tools/plan_audit.py): "
        f"{missing}"
    )
    assert a["n_errors"] == 0, a["errors"]


def test_no_cartesian_products_anywhere():
    assert _audit()["queries_with_cartesian"] == []


def test_no_row_at_a_time_python_udfs_anywhere():
    """BatchEvalPython (per-row pickled Python UDF) must never appear —
    the only sanctioned Python is Arrow-batched (ArrowEvalPython /
    FlatMapGroupsInPandas / MapInArrow / MapInPandas)."""
    assert _audit()["queries_with_row_python_udf"] == []


def test_audit_totals_are_consistent():
    """The committed totals must equal the per-query sums (guards a
    hand-edited artifact)."""
    a = _audit()
    assert a["total_exchanges"] == sum(
        q["exchanges"] for q in a["queries"].values()
    )
    assert a["total_broadcasts"] == sum(
        q["broadcasts"] for q in a["queries"].values()
    )
