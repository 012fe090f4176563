"""Third wave of identity property tests: Hamilton largest-remainder
apportionment exactness (`exact_quota_split`), the overflow-free
split-division identity (`ewma_revenue_dyadic`), and the critical-
fractile quantile rule (`newsvendor_stock`).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------------------
# Hamilton largest-remainder: exact global quota, per-stratum fairness
# ---------------------------------------------------------------------------
def _hamilton(counts: list[int], denom: int = 10) -> list[int]:
    base = [n // denom for n in counts]
    rem = [n % denom for n in counts]
    total = sum(counts)
    quota = total // denom
    deficit = quota - sum(base)
    # seats to the largest remainders, ties by index (the stratum-key
    # tie-break in pipeline_ops43)
    order = sorted(range(len(counts)), key=lambda i: (-rem[i], i))
    out = list(base)
    for i in order[:deficit]:
        out[i] += 1
    return out


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=5000), min_size=1,
                max_size=30))
def test_hamilton_quota_exact_and_fair(counts):
    alloc = _hamilton(counts)
    # global exactness: the defining property
    assert sum(alloc) == sum(counts) // 10
    # per-stratum quota never off by more than one seat from n/10
    for n, a in zip(counts, alloc):
        assert n // 10 <= a <= n // 10 + 1
    # monotone fairness: a stratum never receives the extra seat while
    # a strictly larger remainder goes unseated
    rems = [(n % 10, i) for i, n in enumerate(counts)]
    seated = [a - n // 10 for n, a in zip(counts, alloc)]
    for (r1, i1) in rems:
        for (r2, i2) in rems:
            if seated[i1] and not seated[i2]:
                assert (r1, -i1) >= (r2, -i2) or r1 >= r2


# ---------------------------------------------------------------------------
# Split-division identity: (a*k) div d without the a*k intermediate
# ---------------------------------------------------------------------------
@settings(max_examples=500, deadline=None)
@given(
    st.integers(min_value=0, max_value=10**18),
    st.integers(min_value=1, max_value=10**9),
    st.integers(min_value=1, max_value=10**6),
)
def test_split_division_identity(a, d, k):
    # pipeline_ops40's overflow fix: exact for non-negative a
    assert (a // d) * k + ((a % d) * k) // d == (a * k) // d


# ---------------------------------------------------------------------------
# Critical fractile == smallest level whose CDF reaches the target
# ---------------------------------------------------------------------------
def _newsvendor(hist: dict[int, int], frac_bp: int) -> int:
    # pipeline_ops59 rule: min q with cum_weight * 10000 >= total * bp
    total = sum(hist.values())
    cum = 0
    for q in sorted(hist):
        cum += hist[q]
        if cum * 10000 >= total * frac_bp:
            return q
    raise AssertionError("unreachable for frac_bp <= 10000")


@settings(max_examples=300, deadline=None)
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=200),
        st.integers(min_value=1, max_value=50),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=1, max_value=10000),
)
def test_newsvendor_is_exact_quantile(hist, frac_bp):
    stock = _newsvendor(hist, frac_bp)
    total = sum(hist.values())
    served = sum(w for q, w in hist.items() if q <= stock)
    # the chosen level serves >= the target fraction of demand months
    assert served * 10000 >= total * frac_bp
    # ...and is MINIMAL: one level lower would miss the target
    lower = [q for q in hist if q < stock]
    if lower:
        served_below = sum(w for q, w in hist.items() if q <= max(lower))
        assert served_below * 10000 < total * frac_bp


# ---------------------------------------------------------------------------
# Decimal Spearman survives past the int64 product ceiling (sf10 fix)
# ---------------------------------------------------------------------------
def test_spearman_decimal_past_int64_ceiling(spark):
    """Perfectly reversed ranks at n=100k: S = n(n^2-1)/3, so the old
    long-typed ``60000*S`` is ~2e19 > 2^63 and raised ARITHMETIC_OVERFLOW
    under ANSI (exactly how the sf10 run died at 5e5 docs). The
    decimal(38,0) path must return the exact rho = -1 (bp = -10000)."""
    import pyspark.sql.functions as F

    from bikes_data_warehouse_etl_spark.plans.pipeline_ops25 import (
        spearman_bp_from_ranks,
    )

    n = 100_000
    r = spark.range(n).select(
        (F.col("id") + 1).cast("long").alias("r_len"),
        (F.lit(n) - F.col("id")).cast("long").alias("r_types"),
    )
    row = spearman_bp_from_ranks(r).collect()[0]
    assert row.n_docs == n
    assert row.sum_d_sq == n * (n * n - 1) // 3
    assert row.spearman_bp == -10000
