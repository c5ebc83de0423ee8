"""Semantic invariants for wave-152 (randomness / paired / circular /
divergence / dispersion-rank / BWS / k-sample AD) against independent
numpy/stdlib reference implementations."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _daily_rev():
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_shipdate", "l_extendedprice"],
    )
    cents = np.floor(li.l_extendedprice.to_numpy() * 100.0).astype(np.int64)
    day = pd.to_datetime(li.l_shipdate).dt.date
    return (
        pd.DataFrame({"day": day, "c": cents})
        .groupby("day")["c"]
        .sum()
        .sort_index()
        .to_numpy()
    )


def test_runs_test_matches_numpy(spark):
    res = _Q["ts_runs_test"](spark, SF_DIR).toPandas().iloc[0]
    rev = _daily_rev()
    n_days = len(rev)
    s = rev.sum()
    keep = rev * n_days != s
    hi = (rev[keep] * n_days > s).astype(int)
    n1, n2 = int(hi.sum()), int(len(hi) - hi.sum())
    runs = 1 + int((hi[1:] != hi[:-1]).sum())
    assert res.n_above == n1 and res.n_below == n2 and res.n_runs == runs
    exp = 1 + 2.0 * n1 * n2 / (n1 + n2)
    var = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / (float(n1 + n2) ** 2 * (n1 + n2 - 1))
    )
    assert res.z_score == pytest.approx((runs - exp) / math.sqrt(var), abs=1e-4)


def test_bartels_rank_matches_numpy(spark):
    res = _Q["ts_bartels_rank"](spark, SF_DIR).toPandas().iloc[0]
    rev = _daily_rev()
    r = pd.Series(rev).rank(method="average").to_numpy()
    n = len(r)
    rvn = np.sum(np.diff(r) ** 2) / np.sum((r - (n + 1) / 2.0) ** 2)
    assert res.n_days == n
    assert res.rvn_ratio == pytest.approx(rvn, abs=1e-5)
    var = 4.0 * (n - 2) * (5.0 * n * n - 2 * n - 9) / (
        5.0 * n * (n + 1) * (n - 1) ** 2
    )
    assert res.z_score == pytest.approx((rvn - 2.0) / math.sqrt(var), abs=1e-4)


def test_paired_t_matches_numpy(spark):
    res = _Q["stats_paired_t"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )
    cents = np.floor(o.o_totalprice.to_numpy() * 100.0).astype(np.int64)
    late = pd.to_datetime(o.o_orderdate) >= pd.Timestamp("1995-01-01")
    d = (
        pd.DataFrame(
            {"k": o.o_custkey, "h2": np.where(late, cents, 0),
             "h1": np.where(~late, cents, 0)}
        )
        .groupby("k")
        .sum()
    )
    diff = (d.h2 - d.h1).to_numpy().astype(np.float64)
    n = len(diff)
    t = diff.mean() / (diff.std(ddof=1) / math.sqrt(n))
    assert res.n_customers == n
    assert res.mean_diff == pytest.approx(diff.mean() / 100.0, abs=0.01)
    assert res.t_stat == pytest.approx(t, abs=1e-4)
    assert res.cohens_dz == pytest.approx(t / math.sqrt(n), abs=1e-5)


def test_kuiper_matches_numpy(spark):
    res = _Q["stats_kuiper_dates"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_orderdate"])
    doy = pd.to_datetime(o.o_orderdate).dt.dayofyear.to_numpy()
    n = len(doy)
    atoms, counts = np.unique(doy, return_counts=True)
    cum = np.cumsum(counts)
    dplus = np.max(cum / n - atoms / 366.0)
    dminus = np.max(atoms / 366.0 - (cum - counts) / n)
    assert res.n_orders == n
    assert res.d_plus == pytest.approx(dplus, abs=1e-6)
    assert res.d_minus == pytest.approx(dminus, abs=1e-6)
    assert res.v_stat == pytest.approx(dplus + dminus, abs=1e-6)


def _pv_values():
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["event_id", "event_type", "value"]
    )
    ev = ev[ev.event_type.isin(["purchase", "view"])]
    return ev


def test_hellinger_tv_matches_numpy(spark):
    res = _Q["stats_hellinger_tv"](spark, SF_DIR).toPandas().iloc[0]
    ev = _pv_values()
    b = np.floor(ev.value.to_numpy())
    isp = (ev.event_type == "purchase").to_numpy()
    bins = np.unique(b)
    p = np.array([(b[isp] == x).sum() for x in bins], dtype=float)
    q = np.array([(b[~isp] == x).sum() for x in bins], dtype=float)
    p, q = p / p.sum(), q / q.sum()
    assert res.n_bins == len(bins)
    assert res.total_variation == pytest.approx(
        0.5 * np.abs(p - q).sum(), abs=1e-5
    )
    bc = np.sqrt(p * q).sum()
    assert res.hellinger == pytest.approx(math.sqrt(1 - bc), abs=1e-4)
    assert res.bhattacharyya == pytest.approx(-math.log(bc), abs=1e-4)


def _st_rank(a: int, n: int) -> int:
    if 2 * a == n + 1:
        return n
    m = min(a, n + 1 - a)
    if a <= n - a:  # low side
        return 2 * m if m % 2 == 0 else 2 * m - 1
    return 2 * m if m % 2 == 1 else 2 * m - 1


def test_siegel_tukey_matches_numpy(spark):
    res = _Q["stats_siegel_tukey"](spark, SF_DIR).toPandas().iloc[0]
    ev = _pv_values()
    v = np.floor(ev.value.to_numpy() * 100.0).astype(np.int64)
    order = np.lexsort((ev.event_id.to_numpy(), v))
    isp = (ev.event_type == "purchase").to_numpy()[order]
    n = len(v)
    st = np.array([_st_rank(a, n) for a in range(1, n + 1)], dtype=np.int64)
    # alternating-extreme scores are a permutation of 1..N
    assert sorted(st) == list(range(1, n + 1))
    w = int(st[isp].sum())
    n1, n2 = int(isp.sum()), int(n - isp.sum())
    assert res.n_purchase == n1 and res.n_view == n2
    assert res.st_rank_sum == w
    exp = n1 * (n + 1) / 2.0
    var = n1 * n2 * (n + 1) / 12.0
    assert res.z_score == pytest.approx((w - exp) / math.sqrt(var), abs=1e-4)


def test_bws_matches_numpy(spark):
    res = _Q["stats_bws_test"](spark, SF_DIR).toPandas().iloc[0]
    ev = _pv_values()
    v = np.floor(ev.value.to_numpy() * 100.0).astype(np.int64)
    order = np.lexsort((ev.event_id.to_numpy(), v))
    isp = (ev.event_type == "purchase").to_numpy()[order]
    n_all = len(v)
    rr = np.arange(1, n_all + 1)
    n1, n2 = int(isp.sum()), int(n_all - isp.sum())

    def b_side(mask, n_own, n_other):
        r = rr[mask]
        i = np.arange(1, n_own + 1)
        num = (r - n_all / n_own * i) ** 2
        den = (i / (n_own + 1)) * (1 - i / (n_own + 1)) * (
            n_other * n_all / n_own
        )
        return float(np.mean(num / den))

    bx = b_side(isp, n1, n2)
    by = b_side(~isp, n2, n1)
    assert res.n_purchase == n1 and res.n_view == n2
    assert res.b_x == pytest.approx(bx, rel=1e-4)
    assert res.b_y == pytest.approx(by, rel=1e-4)
    assert res.b_stat == pytest.approx((bx + by) / 2, rel=1e-4)


def test_ad_ksample_matches_numpy(spark):
    res = _Q["stats_ad_ksample"](spark, SF_DIR).toPandas().iloc[0]
    c = pd.read_parquet(
        f"{SF_DIR}/customer.parquet", columns=["c_mktsegment", "c_acctbal"]
    )
    x = np.floor(c.c_acctbal.to_numpy() * 100.0).astype(np.int64)
    seg = c.c_mktsegment.to_numpy()
    segs = np.sort(np.unique(seg))
    k, n = len(segs), len(x)
    vals, l = np.unique(x, return_counts=True)
    bex = np.concatenate([[0], np.cumsum(l)[:-1]])
    bj = bex + l / 2.0  # B̈
    a2 = 0.0
    for s in segs:
        xi = x[seg == s]
        ni = len(xi)
        lij = np.array([(xi == v).sum() for v in vals], dtype=float)
        mex = np.concatenate([[0], np.cumsum(lij)[:-1]])
        mj = mex + lij / 2.0  # M̈
        den = bj * (n - bj) - n * l / 4.0
        ok = den > 0
        a2 += (1.0 / ni) * np.sum(
            (l[ok] / n) * (n * mj[ok] - ni * bj[ok]) ** 2 / den[ok]
        )
    a2 *= (n - 1) / n
    assert res.k_samples == k and res.n_total == n
    assert res.a2k_stat == pytest.approx(a2, rel=1e-4)
    # Scholz–Stephens variance
    hh = sum(1.0 / (seg == s).sum() for s in segs)
    i = np.arange(1, n)
    hi = np.cumsum(1.0 / i)
    h = hi[-1]
    # g = Σ_{i=1}^{N-2} (H_{N-1} − H_i)/(N − i)
    g = float(np.sum((h - hi[: n - 2]) / (n - i[: n - 2])))
    a = (4 * g - 6) * (k - 1) + (10 - 6 * g) * hh
    b = (
        (2 * g - 4) * k * k + 8 * h * k + (2 * g - 14 * h - 4) * hh
        - 8 * h + 4 * g - 6
    )
    cc = (
        (6 * h + 2 * g - 2) * k * k + (4 * h - 4 * g + 6) * k
        + (2 * h - 6) * hh + 4 * h
    )
    d = (2 * h + 6) * k * k - 4 * h * k
    var = (a * n**3 + b * n**2 + cc * n + d) / ((n - 1) * (n - 2) * (n - 3))
    assert res.sigma == pytest.approx(math.sqrt(var), rel=1e-4)
    assert res.t_std == pytest.approx((a2 - (k - 1)) / math.sqrt(var), abs=2e-3)
