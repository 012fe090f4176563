"""Broadcast-inventory contract gate (VERDICT r4 task #6).

``tools/broadcast_audit.py`` measures every compiled-in broadcast
(AQE off, auto-broadcast threshold -1 → only hints and strategy-forced
nested-loop broadcasts survive in the plan) at sf0.001 and sf0.01 and
records each exchange's ``numOutputRows``. The contract: a broadcast
side must be census/dim-bounded — ≤ ``ABS_SMALL`` rows at the larger
sf, or growing ≤ ``RATIO_MAX`` across the 10x data step. This gate
asserts the checked-in ``BROADCAST_AUDIT.json``:

* covers the EXACT current query registry (adding, removing, or
  renaming a query changes the name set and fails here until the audit
  is re-run — a new data-scale hint cannot land unsampled);
* holds zero failing exchanges and zero collection errors;
* was produced under the same bounds the tool currently declares;

and then re-measures a live sample so a stale-but-well-formed artifact
cannot mask a regression in the audited plans themselves.
"""

from __future__ import annotations

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "BROADCAST_AUDIT.json")


@pytest.fixture(scope="module")
def report() -> dict:
    assert os.path.exists(ARTIFACT), (
        "BROADCAST_AUDIT.json missing — run `python tools/broadcast_audit.py`"
    )
    with open(ARTIFACT) as f:
        return json.load(f)


def test_audit_covers_exact_registry(report):
    from bikes_data_warehouse_etl_spark.plans import QUERIES

    assert report["registry"] == sorted(QUERIES), (
        "query surface changed since the last broadcast audit — re-run "
        "`python tools/broadcast_audit.py` so every compiled-in broadcast "
        "is measured"
    )


def test_audit_bounds_match_tool(report):
    import tools.broadcast_audit as ba

    assert report["abs_small"] == ba.ABS_SMALL
    assert report["ratio_max"] == ba.RATIO_MAX


def test_no_data_scale_broadcasts(report):
    bad = {k: v for k, v in report["hinted"].items() if not v["ok"]}
    assert not bad, f"data-scale broadcast sides: {bad}"
    assert not report["errors"], report["errors"]


def test_exceptions_documented_and_current(report):
    import tools.broadcast_audit as ba

    for name, reason in ba.EXCEPTIONS.items():
        assert name in report["registry"], f"stale exception: {name}"
        assert reason and len(reason) > 20, (
            f"exception {name} needs a real scale justification"
        )


def test_live_sample_matches_artifact(spark, report):
    """Re-measure three audited queries live: the exchange count must
    match the artifact (the compiled plan didn't change shape) and
    every exchange must still satisfy the bounds."""
    import tools.broadcast_audit as ba

    hinted = sorted(report["hinted"])
    if not hinted:
        pytest.skip("no hinted queries in surface")
    sample = [hinted[0], hinted[len(hinted) // 2], hinted[-1]]
    live = ba.audit(spark, sample)
    for name in sample:
        got = live["hinted"].get(name)
        assert got is not None, f"{name} no longer compiles a broadcast"
        assert got["ok"], f"{name} now violates the broadcast contract: {got}"
        assert len(got["exchanges"]) == len(
            report["hinted"][name]["exchanges"]
        ), f"{name}: broadcast count drifted from the audited artifact"
