"""Property tests for the algebraic identities behind batch-43/46
plans: the Lindley reflection (clamped running balance as a prefix
scan) and the minimax interval formula for isotonic regression.

These pin the MATH the Spark plans rely on, independent of any engine:
`inventory_clamped_balance` trusts that the reflection equals the
sequential recurrence, `isotonic_calibration` that max-min over
intervals equals pool-adjacent-violators. The DuckDB oracle gate
proves engine agreement on the repo's data; these prove the identity
on adversarial inputs hypothesis searches up.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------------------
# Lindley reflection == naive clamped recurrence
# ---------------------------------------------------------------------------
def _naive_clamped(flows: list[int]) -> tuple[int, int]:
    bal, stockouts = 0, 0
    for f in flows:
        nxt = bal + f
        if nxt < 0:
            stockouts += 1
            nxt = 0
        bal = nxt
    return bal, stockouts


def _reflected(flows: list[int]) -> tuple[int, int]:
    # bal_T = S_T - min(0, min_t S_t); stockout at t iff
    # S_t < min(0, min_{j<t} S_j)   (pipeline_ops43 docstring)
    s, runmin, prevmin = 0, None, None
    stockouts = 0
    prefix = []
    for f in flows:
        s += f
        prevmin = runmin
        base = min(0, prevmin) if prevmin is not None else 0
        if s < base:
            stockouts += 1
        runmin = s if runmin is None else min(runmin, s)
        prefix.append(s)
    if not flows:
        return 0, 0
    bal = prefix[-1] - min(0, min(prefix))
    return bal, stockouts


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=-50, max_value=50), max_size=60))
def test_lindley_reflection_equals_naive(flows):
    assert _reflected(flows) == _naive_clamped(flows)


# ---------------------------------------------------------------------------
# Minimax interval formula == sequential weighted PAV
# ---------------------------------------------------------------------------
def _pav(ys: list[int], ws: list[int]) -> list[float]:
    """Classic stack-based pool-adjacent-violators (nondecreasing fit,
    weighted means as exact fractions)."""
    from fractions import Fraction

    sums: list[tuple[int, int]] = []  # (sum w*y, sum w)
    for y, w in zip(ys, ws):
        cur = (y * w, w)
        while sums and Fraction(cur[0], cur[1]) < Fraction(*sums[-1]):
            prev = sums.pop()
            cur = (cur[0] + prev[0], cur[1] + prev[1])
        sums.append(cur)
    # expand blocks back to points
    expanded = []
    idx = 0
    for swy, sw in sums:
        # how many points this block covers: accumulate weights in order
        covered_w = 0
        start = idx
        while covered_w < sw:
            covered_w += ws[idx]
            idx += 1
        expanded.extend([Fraction(swy, sw)] * (idx - start))
    return expanded


def _minimax(ys: list[int], ws: list[int]) -> list:
    from fractions import Fraction

    n = len(ys)
    pre_wy = [0] * (n + 1)
    pre_w = [0] * (n + 1)
    for i in range(n):
        pre_wy[i + 1] = pre_wy[i] + ys[i] * ws[i]
        pre_w[i + 1] = pre_w[i] + ws[i]

    def avg(j, k):  # inclusive
        return Fraction(pre_wy[k + 1] - pre_wy[j], pre_w[k + 1] - pre_w[j])

    out = []
    for i in range(n):
        out.append(
            max(
                min(avg(j, k) for k in range(i, n)) for j in range(i + 1)
            )
        )
    return out


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100),
            st.integers(min_value=1, max_value=20),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_isotonic_minimax_equals_pav(pairs):
    ys = [p[0] for p in pairs]
    ws = [p[1] for p in pairs]
    assert _minimax(ys, ws) == _pav(ys, ws)
