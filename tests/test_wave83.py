"""Semantic invariants for wave-83 operators (partial correlation,
variance-ratio test, Page–Hinkley) — independent python
re-derivations from raw fixture data."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_partial_corr_matches_python(spark):
    res = _Q["stats_partial_corr"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_extendedprice", "l_quantity", "l_discount"],
    )
    x = (li["l_extendedprice"] * 100.0).map(math.floor).astype(float)
    y = li["l_quantity"].astype(float)
    z = (li["l_discount"] * 10000.0).map(math.floor).astype(float)
    rxy = np.corrcoef(x, y)[0, 1]
    rxz = np.corrcoef(x, z)[0, 1]
    ryz = np.corrcoef(y, z)[0, 1]
    part = (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2))
    assert res["n"] == len(li)
    assert res["r_xy"] == pytest.approx(rxy, abs=1e-6)
    assert res["r_xz"] == pytest.approx(rxz, abs=1e-6)
    assert res["r_yz"] == pytest.approx(ryz, abs=1e-6)
    assert res["r_xy_given_z"] == pytest.approx(part, abs=1e-6)


def _daily_rev_returns():
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_shipdate", "l_extendedprice"]
    )
    revq = (
        (li["l_extendedprice"] * 10000.0)
        .map(math.floor)
        .groupby(li["l_shipdate"].dt.normalize())
        .sum()
        .sort_index()
    )
    r = np.floor(np.log(revq.to_numpy()[1:] / revq.to_numpy()[:-1]) * 1e6)
    return r


def test_variance_ratio_matches_python(spark):
    res = _Q["ts_variance_ratio"](spark, SF_DIR).toPandas().iloc[0]
    r = _daily_rev_returns()
    t = len(r)
    mu = r.sum() / t
    var1 = ((r**2).sum() - r.sum() ** 2 / t) / t
    out = {}
    for q in (2, 4):
        s = np.convolve(r, np.ones(q), mode="valid")  # overlapping q-sums
        varq = ((s - q * mu) ** 2).sum() / len(s) / q
        vr = varq / var1
        zz = (vr - 1) / math.sqrt(2 * (2 * q - 1) * (q - 1) / (3 * q * t))
        out[q] = (vr, zz)
    assert res["n_returns"] == t
    assert res["vr2"] == pytest.approx(out[2][0], abs=1e-5)
    assert res["z2"] == pytest.approx(out[2][1], abs=1e-3)
    assert res["vr4"] == pytest.approx(out[4][0], abs=1e-5)
    assert res["z4"] == pytest.approx(out[4][1], abs=1e-3)


def test_page_hinkley_matches_python(spark):
    res = _Q["spc_page_hinkley"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["ts"])
    daily = ev.groupby(ev["ts"].dt.normalize()).size().sort_index()
    x = daily.to_numpy().astype(float)
    days = daily.index
    m = 0.0
    cum = 0.0
    mn = math.inf
    max_ph = 0.0
    n_alarms = 0
    first_alarm = None
    for i, xi in enumerate(x, start=1):
        cum += xi
        m += xi - cum / i
        mn = min(mn, m)
        ph = m - mn
        max_ph = max(max_ph, ph)
        if ph > 100:
            n_alarms += 1
            if first_alarm is None:
                first_alarm = days[i - 1].strftime("%Y-%m-%d")
    final_ph = ph
    assert res["n_days"] == len(x)
    assert res["max_ph"] == pytest.approx(max_ph, abs=1e-3)
    assert res["final_ph"] == pytest.approx(final_ph, abs=1e-3)
    assert res["n_alarm_days"] == n_alarms
    assert res["first_alarm_day"] == (first_alarm or "none")
    # PH is nonnegative by construction
    assert res["max_ph"] >= 0.0 and res["final_ph"] >= 0.0
