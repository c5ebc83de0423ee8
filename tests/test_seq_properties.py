"""Property tests for the wave-166/170 sequential algorithms on RANDOM
inputs — these import the SAME recursions the operator kernels run
(``hive_processor_spark.functions.seqrec``), so a drift in the engine
code fails here too (round-7 ADVICE: the previous hand-copied mirrors
could not catch kernel drift). They validate the ALGORITHMS (optimality,
invariants), a direction the fixed-fixture differential cannot cover.
No Spark session needed."""

from __future__ import annotations

from functools import lru_cache

from hypothesis import given, settings
from hypothesis import strategies as st

from hive_processor_spark.functions.seqrec import (
    dtw_cost,
    hw_state,
    ses_int,
    theta_ols,
)

_SETTINGS = dict(max_examples=200, deadline=None)

_series = st.lists(
    st.integers(min_value=0, max_value=10**9), min_size=1, max_size=6
)


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
    assert dtw_cost(a, b) == _dtw_bruteforce(tuple(a), tuple(b))


@given(
    st.lists(st.integers(min_value=0, max_value=10**9), min_size=1,
             max_size=6)
)
@settings(**_SETTINGS)
def test_dtw_identity_and_symmetry(a):
    assert dtw_cost(a, a) == 0
    b = list(reversed(a))
    assert dtw_cost(a, b) == dtw_cost(b, a)


@given(_series, _series)
@settings(**_SETTINGS)
def test_dtw_never_exceeds_lockstep(a, b):
    n = min(len(a), len(b))
    a2, b2 = a[:n], b[:n]
    lock = sum(abs(x - y) for x, y in zip(a2, b2))
    assert dtw_cost(a2, b2) <= lock


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
    lvl, b, s = hw_state(x)
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
    a, b = theta_ols(y)
    assert b == float(b0)
    # and the fitted line reproduces the series: a + b·t == y_t exactly
    assert abs(a + b * 1 - y[0]) < 1e-6 * max(1.0, abs(y[0]))


@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=1,
                max_size=50))
@settings(max_examples=100, deadline=None)
def test_ses_is_bounded_by_series_range(xs):
    """SES output is a convex-ish combination under flooring: it can
    never leave [min−1, max] of its input."""
    lvl = ses_int(xs)
    assert min(xs) - 1 <= lvl <= max(xs)


@given(st.integers(min_value=0, max_value=10**9),
       st.integers(min_value=1, max_value=60))
@settings(max_examples=100, deadline=None)
def test_ses_fixed_point_on_constant_series(v, n):
    """A constant series is a fixed point of the integer SES update."""
    assert ses_int([v] * n) == v
