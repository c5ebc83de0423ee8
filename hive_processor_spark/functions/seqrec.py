"""Pure-integer sequential recursions shared by operators AND tests.

``ts_holt_winters`` / ``ts_dtw`` / ``ts_theta_method`` (operators/events.py)
run these recursions inside Arrow-batched ``applyInPandas`` kernels; their
DuckDB oracles run the identical arithmetic as recursive CTEs. The property
tests (tests/test_seq_properties.py) exercise the SAME functions on random
inputs — previously they validated hand-copied mirrors, so a drift in the
operator kernel could not fail them (round-7 ADVICE). One definition, three
consumers: operator kernel, property test, and (by construction documented
here) the oracle SQL.

Everything is driver/executor-safe pure Python on ints: rational smoothing
weights make each update a floor of an integer expression, so results are
bit-identical at any parallelism and on both engines (state < 2^53 keeps
the float divisions exact).
"""

from __future__ import annotations

import math


def hw_state(x: list[int]) -> tuple[int, int, list[int]]:
    """Additive Holt–Winters integer recursion (α=3/10, β=1/20, γ=2/10,
    weekly period 7), initialized from the first two weeks. Returns the
    final ``(level, trend, season[7])`` state in cents."""
    n = len(x)
    lvl = math.floor(sum(x[:7]) / 7.0)
    b = math.floor((sum(x[7:14]) - sum(x[:7])) / 49.0)
    s = [v - lvl for v in x[:7]]
    for i in range(8, n + 1):
        p = (i - 1) % 7
        xi = x[i - 1]
        ln = math.floor((3 * (xi - s[p]) + 7 * (lvl + b)) / 10.0)
        bn = math.floor((1 * (ln - lvl) + 19 * b) / 20.0)
        s[p] = math.floor((2 * (xi - ln) + 8 * s[p]) / 10.0)
        lvl, b = ln, bn
    return lvl, b, s


def hw_forecast(x: list[int], horizons: range = range(1, 8)) -> list[tuple[int, int, int, int]]:
    """(h, forecast, level, trend) rows for each horizon — the exact rows
    the ``ts_holt_winters`` kernel emits."""
    n = len(x)
    lvl, b, s = hw_state(x)
    return [(h, lvl + h * b + s[(n + h - 1) % 7], lvl, b) for h in horizons]


def dtw_cost(a: list[int], b: list[int]) -> int:
    """O(n·m) dynamic-time-warping DP with |aᵢ−bⱼ| integer cost — two-row
    frontier, exact in int."""
    inf = 1 << 60
    prev = [0] + [inf] * len(b)
    for i in range(1, len(a) + 1):
        cur = [inf]
        for j in range(1, len(b) + 1):
            cur.append(
                abs(a[i - 1] - b[j - 1]) + min(prev[j], prev[j - 1], cur[j - 1])
            )
        prev = cur
    return prev[len(b)]


def theta_ols(y: list[int]) -> tuple[float, float]:
    """Exact OLS intercept/slope of y over t=1..n via integer moments
    (the θ=0 line of the theta method). Returns ``(a, b)``."""
    n = len(y)
    st = n * (n + 1) // 2
    stt = n * (n + 1) * (2 * n + 1) // 6
    sy = sum(y)
    sty = sum((i + 1) * v for i, v in enumerate(y))
    b = float(n * sty - st * sy) / float(n * stt - st * st)
    a = (float(sy) - b * float(st)) / n
    return a, b


def ses_int(xa: list[int]) -> int:
    """Simple exponential smoothing at α=3/10 as the integer recurrence
    l ← ⌊(3x + 7l)/10⌋ — the θ=2-line smoother of ``ts_theta_method``
    (and the same update family as :func:`hw_state`)."""
    lvl = xa[0]
    for i in range(1, len(xa)):
        lvl = math.floor((3.0 * xa[i] + 7.0 * lvl) / 10.0)
    return lvl
