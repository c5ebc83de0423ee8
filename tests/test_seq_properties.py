"""Property tests for the wave-166/170 sequential algorithms on RANDOM
inputs — pure-Python mirrors of the integer recursions both engines run,
so these validate the ALGORITHMS (optimality, invariants), a direction
the fixed-fixture differential cannot cover. No Spark session needed."""

from __future__ import annotations

import math
from functools import lru_cache

from hypothesis import given, settings
from hypothesis import strategies as st

_SETTINGS = dict(max_examples=200, deadline=None)

_series = st.lists(
    st.integers(min_value=0, max_value=10**9), min_size=1, max_size=6
)


def _dtw(a: list[int], b: list[int]) -> int:
    """The engines' DP, mirrored (events.py ts_dtw)."""
    inf = 1 << 60
    prev = [0] + [inf] * len(b)
    for i in range(1, len(a) + 1):
        cur = [inf]
        for j in range(1, len(b) + 1):
            cur.append(
                abs(a[i - 1] - b[j - 1])
                + min(prev[j], prev[j - 1], cur[j - 1])
            )
        prev = cur
    return prev[len(b)]


def _dtw_bruteforce(a: tuple[int, ...], b: tuple[int, ...]) -> int:
    """Exhaustive minimum over all monotone alignment paths."""

    @lru_cache(maxsize=None)
    def rec(i: int, j: int) -> int:
        cost = abs(a[i] - b[j])
        if i == 0 and j == 0:
            return cost
        opts = []
        if i > 0:
            opts.append(rec(i - 1, j))
        if j > 0:
            opts.append(rec(i, j - 1))
        if i > 0 and j > 0:
            opts.append(rec(i - 1, j - 1))
        return cost + min(opts)

    return rec(len(a) - 1, len(b) - 1)


@given(_series, _series)
@settings(**_SETTINGS)
def test_dtw_dp_is_optimal_over_all_alignments(a, b):
    assert _dtw(a, b) == _dtw_bruteforce(tuple(a), tuple(b))


@given(
    st.lists(st.integers(min_value=0, max_value=10**9), min_size=1,
             max_size=6)
)
@settings(**_SETTINGS)
def test_dtw_identity_and_symmetry(a):
    assert _dtw(a, a) == 0
    b = list(reversed(a))
    assert _dtw(a, b) == _dtw(b, a)


@given(_series, _series)
@settings(**_SETTINGS)
def test_dtw_never_exceeds_lockstep(a, b):
    n = min(len(a), len(b))
    a2, b2 = a[:n], b[:n]
    lock = sum(abs(x - y) for x, y in zip(a2, b2))
    assert _dtw(a2, b2) <= lock


def _hw(x: list[int]):
    """The engines' integer Holt-Winters recursion (events.py)."""
    n = len(x)
    lvl = math.floor(sum(x[:7]) / 7.0)
    b = math.floor((sum(x[7:14]) - sum(x[:7])) / 49.0)
    s = [v - lvl for v in x[:7]]
    for i in range(8, n + 1):
        p = (i - 1) % 7
        ln = math.floor((3 * (x[i - 1] - s[p]) + 7 * (lvl + b)) / 10.0)
        bn = math.floor((1 * (ln - lvl) + 19 * b) / 20.0)
        s[p] = math.floor((2 * (x[i - 1] - ln) + 8 * s[p]) / 10.0)
        lvl, b = ln, bn
    return lvl, b, s


@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=7,
             max_size=7),
    st.integers(min_value=3, max_value=12),
)
@settings(max_examples=100, deadline=None)
def test_holt_winters_locks_onto_exact_weekly_pattern(week, reps):
    """On a perfectly periodic zero-trend series the smoother must
    converge: trend → 0 and the h-step forecast → the true periodic
    value (within the integer-floor resolution of the recursion)."""
    x = week * reps
    lvl, b, s = _hw(x)
    n = len(x)
    assert abs(b) <= 2  # cents of drift per day, from floors only
    for h in range(1, 8):
        fc = lvl + h * b + s[(n + h - 1) % 7]
        true = week[(n + h - 1) % 7]
        assert abs(fc - true) <= max(60, 0.001 * max(week) + 60)


@given(
    st.integers(min_value=0, max_value=10**6),
    st.integers(min_value=-1000, max_value=1000),
    st.integers(min_value=15, max_value=40),
)
@settings(max_examples=100, deadline=None)
def test_theta_slope_is_exact_ols_on_linear_series(a0, b0, n):
    """The theta method's θ=0 line is exact OLS: on y = a0 + b0·t the
    fitted slope must be b0 exactly (integer moments, no rounding)."""
    y = [a0 + b0 * (t + 1) + (10**7) for t in range(n)]  # keep positive
    st_ = n * (n + 1) // 2
    stt = n * (n + 1) * (2 * n + 1) // 6
    sy = sum(y)
    sty = sum((i + 1) * v for i, v in enumerate(y))
    b = float(n * sty - st_ * sy) / float(n * stt - st_ * st_)
    assert b == float(b0)
