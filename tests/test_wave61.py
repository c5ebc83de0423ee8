"""Semantic invariants for wave-61 operators (process control / service
quality: XmR chart, Apdex, Cpk) — independent pandas re-derivations."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_xmr_chart_matches_pandas(spark):
    res = _Q["spc_xmr_chart"](spark, SF_DIR).toPandas()
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cents = np.floor(orders["o_totalprice"].to_numpy() * 100.0).astype("int64")
    daily = (
        pd.DataFrame({"day": orders["o_orderdate"].dt.date, "c": cents})
        .groupby("day")["c"]
        .sum()
        .sort_index()
    )
    x = daily.to_numpy() / 100.0
    mrbar = float(np.abs(np.diff(daily.to_numpy())).mean()) / 100.0
    xbar = float(x.mean())
    ucl, lcl = xbar + 2.66 * mrbar, xbar - 2.66 * mrbar
    mask = (x > ucl) | (x < lcl)
    expect_days = [d.strftime("%Y-%m-%d") for d in daily.index[mask]]
    assert list(res["day"]) == expect_days
    assert (res["n_days"] == len(daily)).all()
    got = res.set_index("day")
    for d, v in zip(expect_days, x[mask]):
        assert got.loc[d, "revenue"] == pytest.approx(round(v, 2))
        assert got.loc[d, "side"] == ("high" if v > ucl else "low")
    assert (res["ucl"] - ucl).abs().max() < 0.011
    assert (res["lcl"] - lcl).abs().max() < 0.011
    # rule-1 violations should be rare: < 5% of days
    assert len(res) < 0.05 * len(daily)


def test_apdex_matches_pandas(spark):
    res = _Q["ops_apdex"](spark, SF_DIR).toPandas().set_index("event_type")
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    for et, g in ev.groupby("event_type"):
        v = g["value"]
        sat = int((v <= 50.0).sum())
        tol = int(((v > 50.0) & (v <= 200.0)).sum())
        fru = int((v > 200.0).sum())
        row = res.loc[et]
        assert (row["satisfied"], row["tolerating"], row["frustrated"]) == (
            sat,
            tol,
            fru,
        )
        assert row["n"] == len(g)
        assert row["apdex"] == pytest.approx(
            round((sat + tol / 2.0) / len(g), 6)
        )
        assert 0.0 <= row["apdex"] <= 1.0


def test_cpk_matches_numpy(spark):
    res = (
        _Q["spc_cpk_capability"](spark, SF_DIR)
        .toPandas()
        .set_index("l_returnflag")
    )
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    for flag, g in li.groupby("l_returnflag"):
        x = g["l_extendedprice"].to_numpy()
        mu, sd = float(x.mean()), float(x.std(ddof=1))
        cpu = (100000.0 - mu) / (3 * sd)
        cpl = (mu - 1000.0) / (3 * sd)
        row = res.loc[flag]
        assert row["n"] == len(x)
        assert row["mean_price"] == pytest.approx(round(mu, 4), abs=1e-3)
        assert row["std_price"] == pytest.approx(round(sd, 4), abs=1e-3)
        assert row["cpu"] == pytest.approx(round(cpu, 6), abs=1e-5)
        assert row["cpl"] == pytest.approx(round(cpl, 6), abs=1e-5)
        assert row["cpk"] == pytest.approx(round(min(cpu, cpl), 6), abs=1e-5)
