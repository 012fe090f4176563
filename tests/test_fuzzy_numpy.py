"""Differential tests for the vectorized fuzzy-matching numpy helpers
(plans/pipeline_ops8.py): the across-pairs DP and the sharpened
hamming shortcut must agree with a straightforward reference
Levenshtein on randomized inputs — these helpers back both
`fuzzy_entity_clusters` and `fuzzy_match_stats`, whose oracles only
see the aggregated output."""

from __future__ import annotations

import itertools
import random

from bikes_data_warehouse_etl_spark.plans.pipeline_ops8 import (
    _fuzzy_stats_bucket,
    _lev_dist_values,
)


def _ref_lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[lb]


def _ref_values(strs, threshold):
    return sorted(
        d
        for a, b in itertools.combinations(strs, 2)
        if (d := _ref_lev(a, b)) <= threshold
    )


def test_dist_values_match_reference_randomized():
    """300 random small corpora over a 4-letter alphabet (dense in
    near-duplicates, so every gate path — hamming 0/1/2, hamming ≥ 3
    DP, cross-length DP, length skips — is exercised)."""
    rng = random.Random(7)
    for _ in range(300):
        n = rng.randint(2, 12)
        strs = [
            "".join(rng.choice("abcd") for _ in range(rng.randint(1, 10)))
            for _ in range(n)
        ]
        got = sorted(int(x) for x in _lev_dist_values(strs, 3))
        assert got == _ref_values(strs, 3)


def test_dist_values_unicode_fallback():
    """Multi-byte names break the frombuffer fast path; the codepoint
    fallback must produce identical distances."""
    strs = ["café", "cafe", "caffé", "xyz"]
    got = sorted(int(x) for x in _lev_dist_values(strs, 3))
    assert got == _ref_values(strs, 3)


def test_stats_bucket_histogram_and_singletons():
    """The bucket function's histogram equals the reference counts and
    singleton blocks emit an explicit zero-pair row."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "bkt": [0] * 5,
            "nk": [1, 1, 1, 1, 2],
            "blk": ["aa", "aa", "aa", "aa", "zz"],
            "c_name": ["abcd", "abcd", "abce", "wxyz", "solo"],
        }
    )
    out = _fuzzy_stats_bucket(pdf).set_index(["nk", "blk"])
    blk = out.loc[(1, "aa")]
    assert int(blk["n_cand_pairs"]) == 6
    ref = _ref_values(["abcd", "abcd", "abce", "wxyz"], 3)
    assert int(blk["n_matched"]) == len(ref)
    for d in range(4):
        assert int(blk[f"n_d{d}"]) == ref.count(d)
    solo = out.loc[(2, "zz")]
    assert int(solo["n_names"]) == 1
    assert int(solo["n_cand_pairs"]) == 0
    assert int(solo["n_matched"]) == 0
