"""Semantic invariants for wave-106 operators (weighted kappa,
spectral flatness, RMST) — independent python re-derivations from raw
fixture data."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _first_last():
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    o = o.sort_values(["o_orderdate", "o_orderkey", "o_orderpriority"])
    first = o.groupby("o_custkey").first()["o_orderpriority"].str[0].astype(int)
    last = o.groupby("o_custkey").last()["o_orderpriority"].str[0].astype(int)
    return first, last


def test_weighted_kappa_matches_python(spark):
    res = _Q["ml_kappa_weighted"](spark, SF_DIR).toPandas().iloc[0]
    first, last = _first_last()
    n = len(first)
    tbl = pd.crosstab(first, last)
    idx = sorted(set(tbl.index) | set(tbl.columns))
    tbl = tbl.reindex(index=idx, columns=idx, fill_value=0)
    ri = tbl.sum(axis=1)
    cj = tbl.sum(axis=0)
    oq = ol = eq = el = 0.0
    for i in idx:
        for j in idx:
            oq += tbl.loc[i, j] * (i - j) ** 2
            ol += tbl.loc[i, j] * abs(i - j)
            eq += ri[i] * cj[j] / n * (i - j) ** 2
            el += ri[i] * cj[j] / n * abs(i - j)
    assert res["n_cust"] == n
    assert res["kappa_quadratic"] == pytest.approx(1 - oq / eq, abs=1e-4)
    assert res["kappa_linear"] == pytest.approx(1 - ol / el, abs=1e-4)
    assert -1.0 <= res["kappa_quadratic"] <= 1.0


def test_spectral_flatness_matches_python(spark):
    res = _Q["ts_spectral_flatness"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["ts"])
    cnt = ev.groupby(ev["ts"].dt.date).size().sort_index().to_numpy(float)
    n = len(cnt)
    mu = cnt.mean()
    t = np.arange(n)
    powers = {}
    for p in range(2, 17):
        c = ((cnt - mu) * np.cos(2 * math.pi * t / p)).sum()
        s = ((cnt - mu) * np.sin(2 * math.pi * t / p)).sum()
        powers[p] = (c * c + s * s) / n
    vals = np.array(list(powers.values()))
    flat = math.exp(np.log(vals).mean()) / vals.mean()
    assert res["n_frequencies"] == 15
    assert res["spectral_flatness"] == pytest.approx(flat, abs=1e-3)
    assert res["peak_period_days"] == max(powers, key=powers.get)
    assert 0.0 < res["spectral_flatness"] <= 1.0 + 1e-9


def test_rmst_matches_km_integration(spark):
    km = _Q["ml_survival_km"](spark, SF_DIR).toPandas()
    res = _Q["ml_survival_rmst"](spark, SF_DIR).toPandas().iloc[0]
    tau = 30
    days = km["day"].to_numpy()
    surv = km["survival"].to_numpy()
    rmst = min(days[0], tau)  # S=1 until the first event day
    for i in range(len(days)):
        if days[i] >= tau:
            break
        nxt = days[i + 1] if i + 1 < len(days) else tau
        rmst += surv[i] * (min(nxt, tau) - days[i])
    assert res["tau_days"] == tau
    # km column is rounded to 6dp; integrating it reproduces rmst closely
    assert res["rmst_days"] == pytest.approx(rmst, abs=1e-3)
    assert res["expected_days_lost"] == pytest.approx(tau - rmst, abs=1e-3)
    assert 0 <= res["rmst_days"] <= tau
