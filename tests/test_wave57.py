"""Semantic invariants for wave-57 operators (histogram quantiles, ECDF,
Fisher exact, Welch t) — independent python/numpy re-implementations on
top of the DuckDB hash gate."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _cents(series):
    return np.floor(series.to_numpy() * 100.0).astype("int64")


def test_histogram_quantile_matches_numpy(spark):
    res = _Q["agg_histogram_quantile"](spark, SF_DIR).toPandas().set_index("q_pct")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    c = np.sort(_cents(li["l_extendedprice"]))
    n = len(c)
    lo, hi = int(c[0]), int(c[-1])
    d = hi - lo + 1
    bins = 128
    binned = (c - lo) * bins // d
    counts = np.bincount(binned, minlength=bins)
    cum = np.cumsum(counts)
    for q in (50, 90, 99):
        target = (n * q + 99) // 100
        row = res.loc[q]
        # exact order statistic: target-th smallest
        assert row["exact_value"] == pytest.approx(c[target - 1] / 100.0)
        b = int(np.searchsorted(cum, target))
        assert row["bin"] == b
        edge_lo = lo + (b * d + bins - 1) // bins
        edge_hi = lo + ((b + 1) * d + bins - 1) // bins - 1
        cum_prev = int(cum[b - 1]) if b else 0
        est = edge_lo + (edge_hi - edge_lo) * (target - cum_prev) / counts[b]
        assert row["est_value"] == pytest.approx(round(est / 100.0, 4))
        # the estimate must stay inside the covering bin's value range
        assert edge_lo / 100.0 <= row["est_value"] <= edge_hi / 100.0 + 0.01
        assert row["abs_err"] == pytest.approx(
            round(abs(est - c[target - 1]) / 100.0, 4)
        )
    # 128 equi-width bins on this distribution land within ~1% of exact
    assert (res["abs_err"] / res["exact_value"] < 0.02).all()


def test_ecdf_points_exact(spark):
    res = _Q["stats_ecdf_points"](spark, SF_DIR).toPandas().set_index("probe")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    v = orders["o_totalprice"].to_numpy()
    for p in (50_000, 100_000, 150_000, 200_000, 300_000, 450_000):
        n_le = int((v <= p).sum())
        assert res.loc[p, "n_le"] == n_le
        assert res.loc[p, "ecdf"] == pytest.approx(round(n_le / len(v), 6))
    assert res["ecdf"].is_monotonic_increasing


def _lnfact_q(m: int) -> int:
    return math.floor(math.lgamma(m + 1) * 1e9)


def test_fisher_exact_matches_python(spark):
    res = _Q["stats_fisher_exact"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    sub = ev[ev["event_id"] % 37 == 0]
    fa = sub["event_type"].isin(["click", "purchase"])
    fb = sub["value"] >= 200.0
    a = int((fa & fb).sum())
    b = int((fa & ~fb).sum())
    c = int((~fa & fb).sum())
    d = int((~fa & ~fb).sum())
    assert (res["a"], res["b"], res["c"], res["d"]) == (a, b, c, d)
    n, r1, c1 = a + b + c + d, a + b, a + c

    def pq(k: int) -> int:
        ln = (
            _lnfact_q(r1) - _lnfact_q(k) - _lnfact_q(r1 - k)
            + _lnfact_q(n - r1) - _lnfact_q(c1 - k) - _lnfact_q(n - r1 - c1 + k)
            - (_lnfact_q(n) - _lnfact_q(c1) - _lnfact_q(n - c1))
        ) / 1e9
        return math.floor(math.exp(ln) * 1e12)

    kmin, kmax = max(0, c1 - (c + d)), min(r1, c1)
    obs = pq(a)
    p_two = min(sum(pq(k) for k in range(kmin, kmax + 1) if pq(k) <= obs) / 1e12, 1.0)
    assert res["p_two_sided"] == pytest.approx(round(p_two, 6), abs=2e-6)
    assert 0.0 <= res["p_two_sided"] <= 1.0


def test_welch_t_matches_numpy(spark):
    res = _Q["stats_welch_t"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    out = {}
    for flag in ("A", "R"):
        c = _cents(li.loc[li["l_returnflag"] == flag, "l_extendedprice"])
        out[flag] = (len(c), float(c.sum()), float((c.astype(object) ** 2).sum()))
    (n1, s1, q1), (n2, s2, q2) = out["A"], out["R"]
    m1, m2 = s1 / n1, s2 / n2
    v1 = (q1 - s1 * s1 / n1) / (n1 - 1)
    v2 = (q2 - s2 * s2 / n2) / (n2 - 1)
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / math.sqrt(se2)
    df = se2**2 / ((v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1))
    assert res["n_a"] == n1 and res["n_r"] == n2
    assert res["mean_a"] == pytest.approx(round(m1 / 100.0, 4))
    assert res["t_stat"] == pytest.approx(round(t, 6), abs=1e-5)
    assert res["welch_df"] == pytest.approx(round(df, 2), abs=0.05)
    # same-population groups: no significant difference expected
    assert abs(res["t_stat"]) < 4
