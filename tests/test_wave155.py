"""Semantic invariants for waves 155-156 (shift function, one-sample AD,
van der Waerden, Fligner-Killeen) against numpy / stdlib-NormalDist
references."""

from __future__ import annotations

import math
from statistics import NormalDist

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()
_PHI_INV = NormalDist().inv_cdf


def test_shift_function_matches_numpy(spark):
    res = _Q["stats_shift_function"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["event_type", "value"]
    )
    ev = ev[ev.event_type.isin(["purchase", "view"])]
    v = np.floor(ev.value.to_numpy() * 100.0).astype(np.int64)
    isp = (ev.event_type == "purchase").to_numpy()

    def q_type1(a, pi):
        a = np.sort(a)
        k = -(-len(a) * pi // 10)  # ceil(n*pi/10)
        return a[int(k) - 1]

    assert list(res.decile) == list(range(1, 10))
    for row in res.itertuples():
        qp = q_type1(v[isp], row.decile)
        qv = q_type1(v[~isp], row.decile)
        assert row.q_purchase == pytest.approx(qp / 100.0, abs=0.005)
        assert row.q_view == pytest.approx(qv / 100.0, abs=0.005)
        assert row.shift == pytest.approx((qp - qv) / 100.0, abs=0.01)


def test_ad_onesample_matches_numpy(spark):
    res = _Q["stats_ad_onesample"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_totalprice"])
    v = np.sort(np.floor(o.o_totalprice.to_numpy() * 100.0).astype(np.int64))
    n = len(v)
    d = v.max() + 1
    f = v / d
    i = np.arange(1, n + 1)
    s = np.sum((2 * i - 1) * (np.log(f) + np.log(1 - f[::-1])))
    a2 = -n - s / n
    assert res.n_orders == n
    assert res.a2_stat == pytest.approx(a2, rel=1e-5)


def _acctbal_by_seg():
    c = pd.read_parquet(
        f"{SF_DIR}/customer.parquet", columns=["c_mktsegment", "c_acctbal"]
    )
    x = np.floor(c.c_acctbal.to_numpy() * 100.0).astype(np.int64)
    return x, c.c_mktsegment.to_numpy()


def test_van_der_waerden_matches_stdlib(spark):
    res = _Q["stats_van_der_waerden"](spark, SF_DIR).toPandas().iloc[0]
    x, seg = _acctbal_by_seg()
    n = len(x)
    r = pd.Series(x).rank(method="average").to_numpy()
    a = np.array([_PHI_INV(ri / (n + 1)) for ri in r])
    segs = np.sort(np.unique(seg))
    num = sum(
        (seg == s).sum() * a[seg == s].mean() ** 2 for s in segs
    )
    s2 = float((a**2).sum()) / (n - 1)
    assert res.k_samples == len(segs) and res.n_total == n
    assert res.vdw_stat == pytest.approx(num / s2, abs=2e-3)
    assert res.df == len(segs) - 1


def test_fligner_killeen_matches_stdlib(spark):
    res = _Q["stats_fligner_killeen"](spark, SF_DIR).toPandas().iloc[0]
    x, seg = _acctbal_by_seg()
    n = len(x)
    segs = np.sort(np.unique(seg))
    d = np.empty_like(x)
    for s in segs:
        xs = np.sort(x[seg == s])
        med = xs[(len(xs) + 1) // 2 - 1]  # lower median
        d[seg == s] = np.abs(x[seg == s] - med)
    r = pd.Series(d).rank(method="average").to_numpy()
    a = np.array([_PHI_INV(0.5 + ri / (2 * (n + 1))) for ri in r])
    abar = a.mean()
    num = sum(
        (seg == s).sum() * (a[seg == s].mean() - abar) ** 2 for s in segs
    )
    v = float(((a - abar) ** 2).sum()) / (n - 1)
    assert res.k_samples == len(segs) and res.n_total == n
    assert res.fk_stat == pytest.approx(num / v, abs=2e-3)
    assert res.df == len(segs) - 1


def test_cvm_onesample_matches_numpy(spark):
    res = _Q["stats_cvm_onesample"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_totalprice"])
    v = np.sort(np.floor(o.o_totalprice.to_numpy() * 100.0).astype(np.int64))
    n = len(v)
    f = v / (v.max() + 1)
    i = np.arange(1, n + 1)
    w2 = 1.0 / (12 * n) + np.sum((f - (2 * i - 1) / (2.0 * n)) ** 2)
    u2 = w2 - n * (f.mean() - 0.5) ** 2
    assert res.n_orders == n
    # per-block 1e-9 floor quantization biases the fold down by at most
    # |blocks|*1e-9 ≈ 1.5e-5 at sf0.01 — tolerance set to that bound
    assert res.w2_stat == pytest.approx(w2, abs=2e-5)
    assert res.u2_stat == pytest.approx(u2, abs=4e-5)


def test_conover_squared_ranks_matches_numpy(spark):
    res = (
        _Q["stats_conover_squared_ranks"](spark, SF_DIR).toPandas().iloc[0]
    )
    x, seg = _acctbal_by_seg()
    n = len(x)
    segs = np.sort(np.unique(seg))
    d = np.empty(len(x), dtype=np.float64)
    for s in segs:
        d[seg == s] = np.abs(x[seg == s] - x[seg == s].mean())
    r = pd.Series(d).rank(method="average").to_numpy()
    u = r**2
    sbar = u.mean()
    d2 = (np.sum(u**2) - n * sbar**2) / (n - 1)
    t = (
        sum(u[seg == s].sum() ** 2 / (seg == s).sum() for s in segs)
        - n * sbar**2
    ) / d2
    assert res.k_samples == len(segs) and res.n_total == n
    assert res.conover_t == pytest.approx(t, abs=2e-3)
    assert res.df == len(segs) - 1


def test_lilliefors_matches_numpy(spark):
    import math

    res = _Q["stats_lilliefors"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_totalprice"])
    v = np.sort(np.floor(o.o_totalprice.to_numpy() * 100.0).astype(np.int64))
    n = len(v)
    mu, sd = v.mean(), v.std(ddof=1)
    z = (v - mu) / sd
    phi = np.array([0.5 * (1 + math.erf(t / math.sqrt(2))) for t in z])
    i = np.arange(1, n + 1)
    d = max((i / n - phi).max(), (phi - (i - 1) / n).max())
    assert res.n_orders == n
    # A&S erf |error| < 1.5e-7 (+1e-6 rounding) — tolerance to that bound
    assert res.d_stat == pytest.approx(d, abs=3e-6)
    assert res.d_scaled == pytest.approx(
        d * (math.sqrt(n) - 0.01 + 0.85 / math.sqrt(n)), abs=1e-3
    )


def test_shapiro_francia_matches_stdlib(spark):
    import math

    res = _Q["stats_shapiro_francia"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_totalprice"])
    v = np.sort(np.floor(o.o_totalprice.to_numpy() * 100.0).astype(np.int64))
    n = len(v)
    i = np.arange(1, n + 1)
    m = np.array([_PHI_INV((j - 0.375) / (n + 0.25)) for j in i])
    wp = (m @ v) ** 2 / ((m**2).sum() * ((v - v.mean()) ** 2).sum())
    assert res.n_orders == n
    assert res.w_prime == pytest.approx(wp, abs=2e-5)
    lnn = math.log(n)
    mu_r = -1.2725 + 1.0521 * (math.log(lnn) - lnn)
    s_r = 1.0308 - 0.26758 * (math.log(lnn) + 2.0 / lnn)
    assert res.royston_z == pytest.approx(
        (math.log(1 - wp) - mu_r) / s_r, abs=5e-3
    )
