"""Second wave of algorithm-identity property tests (SURVEY §5 model:
every nontrivial algebraic step gets an independent implementation to
disagree with).

Pins for batch 44-49 plans: the interval-merge sliding COUNT DISTINCT
(`rolling_distinct_users`), the Kendall pair census vs the documented
O(n log n) inversion-count upgrade, and the cross-multiplied CDF-area
Wasserstein formula vs an exact Fraction quantile coupling.
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------------------
# Interval-merge sweep == brute-force trailing-window recount
# ---------------------------------------------------------------------------
_W = 7  # window length (counts day t iff active in [t-W+1, t])


def _brute_rolling_distinct(activity: dict[int, set]) -> dict[int, int]:
    days = sorted({d for s in activity.values() for d in s})
    if not days:
        return {}
    lo, hi = min(days), max(days)
    out = {}
    for t in range(lo, hi + 1):
        out[t] = sum(
            1
            for user_days in activity.values()
            if any(t - _W + 1 <= d <= t for d in user_days)
        )
    return out


def _sweep_rolling_distinct(activity: dict[int, set]) -> dict[int, int]:
    # mirror of pipeline_ops45: per-user islands (gap > _W breaks),
    # +1 at island start, -1 after island end+W-1, prefix sum on spine
    days_all = sorted({d for s in activity.values() for d in s})
    if not days_all:
        return {}
    lo, hi = min(days_all), max(days_all)
    deltas: dict[int, int] = {}
    for user_days in activity.values():
        ds = sorted(user_days)
        start = prev = ds[0]
        for d in ds[1:]:
            if d - prev > _W:
                deltas[start] = deltas.get(start, 0) + 1
                end = prev + _W - 1
                deltas[end + 1] = deltas.get(end + 1, 0) - 1
                start = d
            prev = d
        deltas[start] = deltas.get(start, 0) + 1
        end = prev + _W - 1
        deltas[end + 1] = deltas.get(end + 1, 0) - 1
    out, run = {}, 0
    for t in range(lo, hi + 1):
        run += deltas.get(t, 0)
        out[t] = run
    return out


@settings(max_examples=200, deadline=None)
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=8),  # users
        st.sets(
            st.integers(min_value=0, max_value=40), min_size=1, max_size=12
        ),
        min_size=1,
        max_size=8,
    )
)
def test_interval_sweep_equals_brute_recount(activity):
    assert _sweep_rolling_distinct(activity) == _brute_rolling_distinct(
        activity
    )


# ---------------------------------------------------------------------------
# Kendall pair census == merge-sort inversion count (documented upgrade)
# ---------------------------------------------------------------------------
def _kendall_pairs(values: list[int]) -> tuple[int, int, int]:
    conc = disc = ties = 0
    n = len(values)
    for i in range(n):
        for j in range(i + 1, n):
            if values[j] > values[i]:
                conc += 1
            elif values[j] < values[i]:
                disc += 1
            else:
                ties += 1
    return conc, disc, ties


def _kendall_mergesort(values: list[int]) -> tuple[int, int, int]:
    """Discordant = inversions (strict), ties counted directly; the
    O(n log n) path pipeline_ops45's docstring promises."""

    def sort_count(a):
        if len(a) <= 1:
            return a, 0
        mid = len(a) // 2
        left, il = sort_count(a[:mid])
        right, ir = sort_count(a[mid:])
        merged, inv, i, j = [], il + ir, 0, 0
        while i < len(left) and j < len(right):
            if right[j] < left[i]:
                # right[j] is strictly smaller than everything left[i:]
                inv += len(left) - i
                merged.append(right[j])
                j += 1
            else:
                merged.append(left[i])
                i += 1
        merged.extend(left[i:])
        merged.extend(right[j:])
        return merged, inv

    _, disc = sort_count(list(values))
    from collections import Counter

    c = Counter(values)
    ties = sum(k * (k - 1) // 2 for k in c.values())
    n = len(values)
    conc = n * (n - 1) // 2 - disc - ties
    return conc, disc, ties


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-20, max_value=20), max_size=60))
def test_kendall_census_equals_inversion_count(values):
    assert _kendall_pairs(values) == _kendall_mergesort(values)


# ---------------------------------------------------------------------------
# Cross-multiplied CDF-area W1 == exact Fraction quantile coupling
# ---------------------------------------------------------------------------
def _w1_grid(x: list[int], y: list[int]) -> Fraction:
    """pipeline_ops49's formula: sum |cx*ny - cy*nx| * dv / (nx*ny)
    over the merged distinct-value grid."""
    nx, ny = len(x), len(y)
    grid = sorted(set(x) | set(y))
    total = Fraction(0)
    cx = cy = 0
    for v, nxt in zip(grid, grid[1:]):
        cx += x.count(v)
        cy += y.count(v)
        total += Fraction(abs(cx * ny - cy * nx) * (nxt - v), nx * ny)
    return total

def _w1_quantile(x: list[int], y: list[int]) -> Fraction:
    """Independent route: W1 = ∫₀¹ |F⁻¹(q) − G⁻¹(q)| dq via the exact
    common refinement of the two quantile step functions."""
    xs, ys = sorted(x), sorted(y)
    nx, ny = len(xs), len(ys)
    cuts = sorted(
        {Fraction(i, nx) for i in range(nx + 1)}
        | {Fraction(j, ny) for j in range(ny + 1)}
    )
    total = Fraction(0)
    for a, b in zip(cuts, cuts[1:]):
        mid = (a + b) / 2
        xi = xs[min(int(mid * nx), nx - 1)]
        yi = ys[min(int(mid * ny), ny - 1)]
        total += (b - a) * abs(xi - yi)
    return total


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=20),
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=20),
)
def test_wasserstein_grid_equals_quantile_coupling(x, y):
    assert _w1_grid(x, y) == _w1_quantile(x, y)
