"""The per-query regression gate in bench.py (verdict r1 #10).

Pure-function tests — the actual timings come from running bench.py at
sf0.1; here we pin the gate's semantics against the checked-in
BENCH_r01.json baseline.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import latest_bench_json, regressions_vs  # noqa: E402

BASELINE = os.path.join(REPO, "BENCH_r01.json")


def _r1_queries() -> dict:
    with open(BASELINE) as f:
        doc = json.load(f)
    return doc.get("parsed", doc)["queries"]


def test_baseline_vs_itself_is_clean():
    assert regressions_vs(_r1_queries(), BASELINE) == []


def test_large_slowdown_flagged():
    assert regressions_vs(
        {"fuzzy_name_pairs": 30.0}, BASELINE
    ) == ["fuzzy_name_pairs"]


def test_subsecond_jitter_not_flagged():
    # 2x a 0.2 s query is warmup-order noise, not a regression
    base = _r1_queries()
    name = min(base, key=base.get)
    assert base[name] < 0.5
    assert regressions_vs({name: base[name] * 2}, BASELINE) == []


def test_new_queries_ignored():
    assert regressions_vs({"brand_new_query": 99.0}, BASELINE) == []


def test_missing_baseline_is_noop():
    assert regressions_vs({"q": 9.9}, "/nonexistent.json") == []


def test_latest_bench_json_is_newest_usable_round():
    """Must skip rounds whose driver capture truncated (parsed: null —
    r03 is one) and land on the newest round that actually carries
    per-query timings."""
    p = latest_bench_json()
    assert p is not None
    with open(p) as f:
        doc = json.load(f)
    assert ((doc.get("parsed") or doc).get("queries")) or {}


def test_none_baseline_is_noop():
    assert regressions_vs({"q": 9.9}, None) == []
