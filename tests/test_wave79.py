"""Semantic invariants for wave-79 operators (log-rank, Jonckheere–
Terpstra, two-sample Anderson–Darling) — independent python
re-derivations from raw fixture data."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _conv_frame() -> pd.DataFrame:
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["user_id", "event_type", "ts"]
    )
    t0 = (
        ev[ev["event_type"] == "view"].groupby("user_id")["ts"].min().rename("t0")
    )
    t_last = ev.groupby("user_id")["ts"].max().rename("t_last")
    spans = pd.concat([t0, t_last], axis=1).dropna(subset=["t0"])
    pur = ev[ev["event_type"] == "purchase"].merge(
        spans["t0"], left_on="user_id", right_index=True
    )
    pur = pur[pur["ts"] > pur["t0"]]
    tp = pur.groupby("user_id")["ts"].min().rename("tp")
    df = spans.join(tp)
    end = df["tp"].fillna(df["t_last"])
    dur = (end.dt.normalize() - df["t0"].dt.normalize()).dt.days
    return pd.DataFrame(
        {
            "g": (df.index % 2).astype(int),
            "dur": dur.astype(int),
            "ev": df["tp"].notna().astype(int),
        }
    )


def test_logrank_matches_python(spark):
    res = _Q["stats_logrank"](spark, SF_DIR).toPandas().iloc[0]
    conv = _conv_frame()
    o1 = e1 = v = 0.0
    n_times = 0
    for t in sorted(conv["dur"].unique()):
        at = conv[conv["dur"] >= t]
        dt = int(conv[conv["dur"] == t]["ev"].sum())
        if dt == 0:
            continue
        n_times += 1
        nt = len(at)
        n1 = int((at["g"] == 1).sum())
        d1 = int(conv[(conv["dur"] == t) & (conv["g"] == 1)]["ev"].sum())
        o1 += d1
        e1 += dt * n1 / nt
        if nt > 1:
            v += dt * (n1 / nt) * (1 - n1 / nt) * (nt - dt) / (nt - 1)
    chi2 = (o1 - e1) ** 2 / v
    assert res["n_times"] == n_times
    assert res["o1"] == o1
    assert res["e1"] == pytest.approx(e1, abs=1e-3)
    assert res["var_lr"] == pytest.approx(v, abs=1e-3)
    assert res["chi2"] == pytest.approx(chi2, abs=1e-2)


def test_jonckheere_matches_python(spark):
    res = _Q["stats_jonckheere"](spark, SF_DIR).toPandas().iloc[0]
    od = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )
    g = od["o_orderpriority"].str[0].astype(int).to_numpy()
    v = (od["o_totalprice"] * 100.0).map(math.floor).astype("int64").to_numpy()
    groups = [np.sort(v[g == k]) for k in range(1, 6)]
    j2 = 0
    for i in range(5):
        for j in range(i + 1, 5):
            lt = np.searchsorted(groups[i], groups[j], side="left")
            le = np.searchsorted(groups[i], groups[j], side="right")
            j2 += int(2 * lt.sum() + (le - lt).sum())
    n = len(v)
    sizes = np.array([len(x) for x in groups], dtype=np.int64)
    e2 = (n * n - int((sizes**2).sum())) // 2
    _, tcounts = np.unique(v, return_counts=True)
    t = tcounts.astype(np.int64)
    a = (
        n * (n - 1) * (2 * n + 5)
        - int((sizes * (sizes - 1) * (2 * sizes + 5)).sum())
        - int((t * (t - 1) * (2 * t + 5)).sum())
    )
    s3n = int((sizes * (sizes - 1) * (sizes - 2)).sum())
    s3t = int((t * (t - 1) * (t - 2)).sum())
    s2n = int((sizes * (sizes - 1)).sum())
    s2t = int((t * (t - 1)).sum())
    var = (
        a / 72
        + s3n * s3t / (36.0 * n * (n - 1) * (n - 2))
        + s2n * s2t / (8.0 * n * (n - 1))
    )
    z = (j2 - e2) / (2.0 * math.sqrt(var))
    assert res["n_total"] == n
    assert res["j_stat"] == pytest.approx(j2 / 2.0)
    assert res["e_j"] == pytest.approx(e2)
    assert res["var_j"] == pytest.approx(var, rel=1e-9)
    assert res["z"] == pytest.approx(z, abs=1e-3)


def test_anderson_darling_matches_python(spark):
    res = _Q["stats_anderson_darling"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_returnflag", "l_extendedprice"]
    )
    li = li[li["l_returnflag"].isin(["R", "A"])]
    cents = (li["l_extendedprice"] * 100.0).map(math.floor).astype("int64")
    is_x = (li["l_returnflag"] == "R").astype(int).to_numpy()
    order = np.argsort(cents.to_numpy(), kind="stable")
    vals = cents.to_numpy()[order]
    xs = is_x[order]
    uniq, idx, counts = np.unique(vals, return_index=True, return_counts=True)
    l_j = counts.astype(np.int64)
    cx_j = np.add.reduceat(xs, idx).astype(np.int64)
    b = np.cumsum(l_j)
    mx = np.cumsum(cx_j)
    n_all = int(b[-1])
    nx = int(mx[-1])
    ny = n_all - nx
    keep = b < n_all
    d = n_all * mx[keep] - nx * b[keep]
    terms = l_j[keep] * (d.astype(float) ** 2) / (
        b[keep].astype(float) * (n_all - b[keep])
    )
    a2 = terms.sum() / nx / ny
    # Scholz–Stephens k=2 null variance
    hi = np.cumsum(1.0 / np.arange(1, n_all))
    h = hi[-1]
    i = np.arange(1, n_all - 1)
    g = ((h - hi[i - 1]) / (n_all - i)).sum()
    hh = 1.0 / nx + 1.0 / ny
    va = (4 * g - 6) + (10 - 6 * g) * hh
    vb = (2 * g - 4) * 4 + 16 * h + (2 * g - 14 * h - 4) * hh - 8 * h + 4 * g - 6
    vc = (6 * h + 2 * g - 2) * 4 + (4 * h - 4 * g + 6) * 2 + (2 * h - 6) * hh + 4 * h
    var = (va * n_all**3 + vb * n_all**2 + vc * n_all + 24.0) / (
        (n_all - 1) * (n_all - 2) * (n_all - 3)
    )
    assert res["n_x"] == nx and res["n_y"] == ny
    assert res["a2_stat"] == pytest.approx(a2, abs=2e-4)
    assert res["sigma"] == pytest.approx(math.sqrt(var), abs=1e-4)
    assert res["t_std"] == pytest.approx((a2 - 1.0) / math.sqrt(var), abs=1e-3)


def test_anderson_darling_sane_under_h0(spark):
    # R vs A flags are assigned independently of price in the fixture, so
    # the standardized statistic must sit in a plausible null range.
    res = _Q["stats_anderson_darling"](spark, SF_DIR).toPandas().iloc[0]
    assert 0.0 < res["a2_stat"] < 10.0
    assert abs(res["t_std"]) < 8.0
