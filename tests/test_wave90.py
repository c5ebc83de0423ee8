"""Semantic invariants for wave-90 operators (PVM bridge, YTD/QTD
calendar windows, Brier decomposition) — independent python
re-derivations from raw fixture data."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_pvm_bridge_closes_exactly(spark):
    res = _Q["market_pvm_bridge"](spark, SF_DIR).toPandas().iloc[0]
    # the bridge must close: delta == price + volume + mix to rounding
    assert res["bridge_residual"] == pytest.approx(0.0, abs=1e-6)
    total = res["price_effect"] + res["volume_effect"] + res["mix_effect"]
    assert total == pytest.approx(res["delta_dollars"], abs=0.03)


def test_pvm_bridge_matches_python(spark):
    res = _Q["market_pvm_bridge"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_quantity"],
    )
    li = li[
        (li["l_shipdate"] >= "1996-01-01") & (li["l_shipdate"] < "1998-01-01")
    ]
    li["yr"] = (li["l_shipdate"] >= "1997-01-01").astype(int)
    li["revq"] = (li["l_extendedprice"] * 10000.0).map(math.floor)
    g = (
        li.groupby(["l_partkey", "yr"])
        .agg(rev=("revq", "sum"), qty=("l_quantity", lambda s: int(s.sum())))
        .unstack()
        .dropna()
    )
    rev0 = g[("rev", 0)].sum() / 1e4
    rev1 = g[("rev", 1)].sum() / 1e4
    q0t, q1t = g[("qty", 0)].sum(), g[("qty", 1)].sum()
    p0q1 = (
        np.floor(g[("rev", 0)] / 1e4 / g[("qty", 0)] * g[("qty", 1)] * 1e2)
        .sum()
        / 1e2
    )
    price = rev1 - p0q1
    vol = rev0 * (q1t / q0t - 1)
    mix = p0q1 - rev0 * (q1t / q0t)
    assert res["n_parts"] == len(g)
    assert res["rev0_dollars"] == pytest.approx(rev0, abs=0.02)
    assert res["rev1_dollars"] == pytest.approx(rev1, abs=0.02)
    assert res["price_effect"] == pytest.approx(price, abs=0.05)
    assert res["volume_effect"] == pytest.approx(vol, abs=0.05)
    assert res["mix_effect"] == pytest.approx(mix, abs=0.05)


def test_ytd_qtd_matches_python(spark):
    res = _Q["win_ytd_qtd"](spark, SF_DIR).toPandas()
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    cents = (o["o_totalprice"] * 100.0).map(math.floor)
    m = (
        pd.DataFrame(
            {
                "yr": o["o_orderdate"].dt.year,
                "mo": o["o_orderdate"].dt.month,
                "c": cents,
            }
        )
        .groupby(["yr", "mo"])["c"]
        .sum()
        .sort_index()
    )
    rows = {(int(r["yr"]), int(r["mo"])): r for _, r in res.iterrows()}
    seq = list(m.items())
    for idx, ((yr, mo), c) in enumerate(seq):
        r = rows[(yr, mo)]
        assert r["month_rev"] == pytest.approx(c / 100, abs=0.01)
        ytd = sum(v for (y2, m2), v in seq if y2 == yr and m2 <= mo)
        assert r["ytd_rev"] == pytest.approx(ytd / 100, abs=0.01)
        q = (mo - 1) // 3 + 1
        assert r["qtr"] == q
        qtd = sum(
            v
            for (y2, m2), v in seq
            if y2 == yr and (m2 - 1) // 3 + 1 == q and m2 <= mo
        )
        assert r["qtd_rev"] == pytest.approx(qtd / 100, abs=0.01)
        if idx >= 12:
            prior = seq[idx - 12][1]
            assert seq[idx - 12][0] == (yr - 1, mo)  # contiguous months
            assert r["yoy_pct"] == pytest.approx(
                100 * (c - prior) / prior, abs=1e-3
            )


def test_brier_decomposition_matches_python(spark):
    res = _Q["ml_brier_decomposition"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["event_type", "value"]
    )
    p = np.floor(np.minimum(ev["value"] / 500.0, 1.0) * 1e6) / 1e6
    y = (ev["event_type"] == "purchase").astype(int).to_numpy()
    bins = np.minimum(np.floor(np.minimum(ev["value"] / 500.0, 1.0) * 10), 9)
    n = len(y)
    obar = y.mean()
    bs = ((p - y) ** 2).mean()
    rel = res_ = 0.0
    for b in np.unique(bins):
        m = bins == b
        nk = int(m.sum())
        pb, ob = p[m].mean(), y[m].mean()
        rel += nk * (pb - ob) ** 2
        res_ += nk * (ob - obar) ** 2
    rel /= n
    res_ /= n
    unc = obar * (1 - obar)
    assert res["n"] == n and res["ny"] == int(y.sum())
    assert res["brier"] == pytest.approx(bs, abs=1e-4)
    assert res["reliability"] == pytest.approx(rel, abs=1e-4)
    assert res["resolution"] == pytest.approx(res_, abs=1e-4)
    assert res["uncertainty"] == pytest.approx(unc, abs=1e-6)
    assert res["within_bin_gap"] == pytest.approx(
        bs - (rel - res_ + unc), abs=1e-4
    )
