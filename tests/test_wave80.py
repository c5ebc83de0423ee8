"""Semantic invariants for wave-80 operators (Yuen trimmed t, Mood
scale test, Brunner–Munzel) — independent python re-derivations from
raw fixture data."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _ra_cents():
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_returnflag", "l_extendedprice"]
    )
    li = li[li["l_returnflag"].isin(["R", "A"])]
    cents = (li["l_extendedprice"] * 100.0).map(math.floor).astype("int64")
    return (
        np.sort(cents[li["l_returnflag"] == "R"].to_numpy()),
        np.sort(cents[li["l_returnflag"] == "A"].to_numpy()),
    )


def test_yuen_matches_python(spark):
    res = _Q["stats_yuen_trimmed_t"](spark, SF_DIR).toPandas().iloc[0]
    x, y = _ra_cents()

    def side(a):
        n = len(a)
        g = int(math.floor(0.2 * n))
        h = n - 2 * g
        trimmed = a[g : n - g]
        tm = trimmed.mean()
        w = a.copy()
        w[:g] = a[g]
        w[n - g :] = a[n - g - 1]
        s2w = w.var(ddof=1)
        d = s2w * (n - 1) / (h * (h - 1.0))
        return n, h, tm, d

    nx, hx, tmx, dx = side(x)
    ny, hy, tmy, dy = side(y)
    t = (tmx - tmy) / math.sqrt(dx + dy)
    df = (dx + dy) ** 2 / (dx * dx / (hx - 1) + dy * dy / (hy - 1))
    assert res["n_x"] == nx and res["n_y"] == ny
    assert res["h_x"] == hx and res["h_y"] == hy
    assert res["tmean_cents_x"] == pytest.approx(tmx, rel=1e-9)
    assert res["tmean_cents_y"] == pytest.approx(tmy, rel=1e-9)
    assert res["t_yuen"] == pytest.approx(t, abs=1e-3)
    assert res["df"] == pytest.approx(df, rel=1e-6)


def test_mood_matches_python(spark):
    res = _Q["stats_mood_scale"](spark, SF_DIR).toPandas().iloc[0]
    x, y = _ra_cents()
    pooled = np.concatenate([x, y])
    n_all = len(pooled)
    # midranks via average-rank formula on the sorted pooled array
    order = np.sort(pooled)
    uniq, counts = np.unique(order, return_counts=True)
    base = np.concatenate([[0], np.cumsum(counts)[:-1]])
    mid = base + (counts + 1) / 2.0
    rank_of = dict(zip(uniq, mid))
    rx = np.array([rank_of[v] for v in x])
    m = ((rx - (n_all + 1) / 2.0) ** 2).sum()
    nx, ny = len(x), len(y)
    e_m = nx * (n_all**2 - 1) / 12.0
    var_m = nx * ny * (n_all + 1) * (n_all**2 - 4) / 180.0
    z = (m - e_m) / math.sqrt(var_m)
    assert res["n_x"] == nx and res["n_y"] == ny
    assert res["m_stat"] == pytest.approx(m, rel=1e-12)
    assert res["e_m"] == pytest.approx(e_m, rel=1e-12)
    assert res["z"] == pytest.approx(z, abs=1e-3)


def test_brunner_munzel_matches_python(spark):
    res = _Q["stats_brunner_munzel"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_returnflag", "l_quantity"]
    )
    li = li[li["l_returnflag"].isin(["R", "A"])]
    q = li["l_quantity"].astype("int64").to_numpy()
    s = (li["l_returnflag"] == "R").to_numpy()
    x, y = q[s], q[~s]
    n1, n2 = len(x), len(y)
    pooled = pd.Series(np.concatenate([x, y]))
    r = pooled.rank(method="average").to_numpy()  # pooled midranks
    r1, r2 = r[:n1], r[n1:]
    ri1 = pd.Series(x).rank(method="average").to_numpy()  # within-sample
    ri2 = pd.Series(y).rank(method="average").to_numpy()
    rbar1, rbar2 = r1.mean(), r2.mean()
    s2_1 = ((r1 - ri1 - rbar1 + (n1 + 1) / 2.0) ** 2).sum() / (n1 - 1)
    s2_2 = ((r2 - ri2 - rbar2 + (n2 + 1) / 2.0) ** 2).sum() / (n2 - 1)
    p_hat = (rbar2 - (n2 + 1) / 2.0) / n1
    w = n1 * n2 * (rbar2 - rbar1) / ((n1 + n2) * math.sqrt(n1 * s2_1 + n2 * s2_2))
    pv = n1 * s2_1 + n2 * s2_2
    df = pv * pv / (
        (n1 * s2_1) ** 2 / (n1 - 1) + (n2 * s2_2) ** 2 / (n2 - 1)
    )
    assert res["n_x"] == n1 and res["n_y"] == n2
    assert res["p_hat"] == pytest.approx(p_hat, abs=1e-6)
    assert res["w_bm"] == pytest.approx(w, abs=1e-3)
    assert res["df"] == pytest.approx(df, rel=1e-6)
    # relative effect must be a probability
    assert 0.0 <= res["p_hat"] <= 1.0
