"""Semantic invariants for wave-158 (Nelson–Aalen, Aalen–Johansen CIF)
against an independent pandas/numpy survival re-derivation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _conv_frame():
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["user_id", "event_type", "ts"]
    )
    ev["ts"] = pd.to_datetime(ev.ts)
    t0 = ev[ev.event_type == "view"].groupby("user_id")["ts"].min()
    t_last = ev.groupby("user_id")["ts"].max()
    return ev, t0, t_last


def test_nelson_aalen_matches_pandas(spark):
    res = _Q["ml_survival_na"](spark, SF_DIR).toPandas()
    ev, t0, t_last = _conv_frame()
    p = ev[ev.event_type == "purchase"].merge(
        t0.rename("t0"), on="user_id"
    )
    tp = p[p.ts > p.t0].groupby("user_id")["ts"].min()
    users = t0.index
    end = tp.reindex(users).fillna(t_last.reindex(users))
    dur = (end.dt.date.values - t0.dt.date.values).astype(
        "timedelta64[D]"
    ).astype(int)
    evd = tp.reindex(users).notna().to_numpy().astype(int)
    order = np.argsort(dur, kind="stable")
    h = 0.0
    hv = 0.0
    rows = iter(res.itertuples())
    for t in np.unique(dur):
        at = int((dur >= t).sum())
        d = int(evd[dur == t].sum())
        if d == 0:
            continue
        h += d / at
        hv += d * (at - d) / at**3
        row = next(rows)
        assert row.day == t and row.at_risk == at and row.n_events == d
        assert row.cum_hazard == pytest.approx(h, abs=2e-4)
        assert row.hazard_var == pytest.approx(hv, abs=1e-6)


def test_cif_matches_pandas_and_sums_with_survivor(spark):
    res = _Q["ml_survival_cif"](spark, SF_DIR).toPandas()
    ev, t0, t_last = _conv_frame()
    c = ev[ev.event_type.isin(["purchase", "click"])].merge(
        t0.rename("t0"), on="user_id"
    )
    c = c[c.ts > c.t0]
    tf = c.groupby("user_id")["ts"].min()
    typed = c.merge(tf.rename("tf"), on="user_id")
    typed = (
        typed[typed.ts == typed.tf]
        .groupby("user_id")["event_type"]
        .min()
    )
    users = t0.index
    end = tf.reindex(users).fillna(t_last.reindex(users))
    dur = (end.dt.date.values - t0.dt.date.values).astype(
        "timedelta64[D]"
    ).astype(int)
    ety = typed.reindex(users).to_numpy()
    s = 1.0
    cifp = cifc = 0.0
    rows = iter(res.itertuples())
    for t in np.unique(dur):
        at = int((dur >= t).sum())
        dp = int(((dur == t) & (ety == "purchase")).sum())
        dc = int(((dur == t) & (ety == "click")).sum())
        if dp + dc == 0:
            continue
        cifp += s * dp / at
        cifc += s * dc / at
        s *= 1 - (dp + dc) / at
        row = next(rows)
        assert (row.day, row.at_risk) == (t, at)
        assert (row.n_purchase, row.n_click) == (dp, dc)
        assert row.cif_purchase == pytest.approx(cifp, abs=2e-4)
        assert row.cif_click == pytest.approx(cifc, abs=2e-4)
    # Aalen–Johansen identity: CIFs + all-cause survivor == 1 exactly
    # (up to quantization) once everyone has converted or censored out
    last = res.iloc[-1]
    assert last.cif_purchase + last.cif_click <= 1.0 + 1e-6
    assert last.cif_purchase + last.cif_click + s == pytest.approx(
        1.0, abs=2e-3
    )


def test_dagostino_k2_matches_numpy(spark):
    """Independent re-derivation of K² (D'Agostino '71 skew z +
    Anscombe–Glynn '83 kurtosis z) from numpy moments."""
    import math

    res = _Q["stats_dagostino_k2"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_totalprice"])
    y = np.floor(o.o_totalprice.to_numpy() * 100.0).astype(np.float64)
    n = len(y)
    mu = y.mean()
    m2 = ((y - mu) ** 2).mean()
    m3 = ((y - mu) ** 3).mean()
    m4 = ((y - mu) ** 4).mean()
    g1 = m3 / m2**1.5
    b2 = m4 / m2**2
    # skew z (Johnson SU)
    yv = g1 * math.sqrt((n + 1) * (n + 3) / (6.0 * (n - 2)))
    beta2 = (
        3.0 * (n * n + 27 * n - 70) * (n + 1) * (n + 3)
        / ((n - 2.0) * (n + 5) * (n + 7) * (n + 9))
    )
    w = math.sqrt(-1 + math.sqrt(2 * (beta2 - 1)))
    z1 = (1 / math.sqrt(math.log(w))) * math.asinh(
        yv / math.sqrt(2 / (w * w - 1))
    )
    # kurtosis z (Anscombe–Glynn, Wilson–Hilferty)
    x = (b2 - 3.0 * (n - 1) / (n + 1)) / math.sqrt(
        24.0 * n * (n - 2) * (n - 3) / ((n + 1.0) ** 2 * (n + 3) * (n + 5))
    )
    sb = (
        6.0 * (n * n - 5 * n + 2) / ((n + 7.0) * (n + 9))
        * math.sqrt(6.0 * (n + 3) * (n + 5) / (n * (n - 2.0) * (n - 3)))
    )
    a = 6.0 + 8.0 / sb * (2.0 / sb + math.sqrt(1.0 + 4.0 / sb**2))
    z2 = (
        1 - 2.0 / (9 * a)
        - ((1 - 2.0 / a) / (1 + x * math.sqrt(2.0 / (a - 4)))) ** (1.0 / 3)
    ) / math.sqrt(2.0 / (9 * a))
    assert res.n_obs == n
    assert res.sample_skewness == pytest.approx(g1, abs=1e-5)
    assert res.excess_kurtosis == pytest.approx(b2 - 3, abs=1e-5)
    assert res.z_skew == pytest.approx(z1, abs=1e-3)
    assert res.z_kurt == pytest.approx(z2, abs=1e-3)
    assert res.k2_stat == pytest.approx(z1**2 + z2**2, abs=5e-3)


def test_bradley_terry_matches_numpy(spark):
    """Independent MM re-derivation (unquantized floats) of the 2-step
    Bradley–Terry strengths + ranking sanity."""
    res = _Q["ml_bradley_terry"](spark, SF_DIR).toPandas()
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_extendedprice", "l_discount"],
    )
    p = pd.read_parquet(
        f"{SF_DIR}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    j["rev"] = np.floor(
        j.l_extendedprice.to_numpy() * (1 - j.l_discount.to_numpy()) * 100.0
    ).astype(np.int64)
    lines = j.groupby(["l_orderkey", "p_brand"])["rev"].sum().reset_index()
    duel_n: dict = {}
    duel_w: dict = {}
    for _, grp in lines.groupby("l_orderkey"):
        rows = list(grp.itertuples())
        for i in range(len(rows)):
            for k in range(i + 1, len(rows)):
                x, y = rows[i], rows[k]
                ba, bb = sorted([x.p_brand, y.p_brand])
                if ba == bb or x.rev == y.rev:
                    continue
                win_a = (x.rev > y.rev) == (x.p_brand == ba)
                duel_n[(ba, bb)] = duel_n.get((ba, bb), 0) + 1
                duel_w[(ba, bb)] = duel_w.get((ba, bb), 0) + int(win_a)
    brands = sorted({b for k in duel_n for b in k})
    w = {b: 0 for b in brands}
    games = {b: 0 for b in brands}
    for (ba, bb), n in duel_n.items():
        w[ba] += duel_w[(ba, bb)]
        w[bb] += n - duel_w[(ba, bb)]
        games[ba] += n
        games[bb] += n
    s1 = {b: 2.0 * w[b] / games[b] for b in brands}
    s2 = {}
    for b in brands:
        d = 0.0
        for (ba, bb), n in duel_n.items():
            if ba == b:
                d += n / (s1[ba] + s1[bb])
            elif bb == b:
                d += n / (s1[ba] + s1[bb])
        s2[b] = w[b] / d
    assert len(res) == len(brands)
    for row in res.itertuples():
        assert row.wins == w[row.brand]
        assert row.games == games[row.brand]
        assert row.bt_strength == pytest.approx(s2[row.brand], rel=1e-4)


def test_anf_hyperball_against_exact_bfs(spark):
    """HyperBall N(k) must track the EXACT neighbourhood function
    (python BFS over the same 3-NN symmetrized edges) within HLL error
    (m=64 → ~13% per-node rse; the 200-node sum averages much tighter),
    be monotone in k, and start at ~n at hop 0."""
    res = _Q["graph_anf_hyperball"](spark, SF_DIR).toPandas()
    from hive_processor_spark.operators.graphs import (
        _N,
        _knn_edges_pinned,
    )

    # the pinned helper already returns the symmetrized top-K edge set
    edges = _knn_edges_pinned(spark, SF_DIR).toPandas()
    adj: dict = {}
    for s, d in edges[["src", "dst"]].itertuples(index=False):
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    nodes = list(range(_N))
    balls = {v: {v} for v in nodes}
    exact = [len(nodes)]
    for _ in range(3):
        balls = {
            v: balls[v] | set().union(*(balls[u] for u in adj.get(v, ())))
            for v in nodes
        }
        exact.append(sum(len(b) for b in balls.values()))
    assert list(res.hop) == [0, 1, 2, 3]
    assert (res.n_nodes == len(nodes)).all()
    sums = list(res.est_reach_sum)
    assert sums == sorted(sums)  # monotone
    for est, ex in zip(sums, exact):
        assert abs(est - ex) / ex < 0.08, (est, ex)


def test_spectral_coherence_matches_numpy(spark):
    """Independent numpy Welch cross-spectral coherence (unquantized)."""
    import math

    res = _Q["ts_spectral_coherence"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["event_type", "ts"]
    )
    ev["day"] = pd.to_datetime(ev.ts).dt.date
    d = (
        ev.groupby("day")
        .agg(
            x=("event_type", lambda s: int((s == "purchase").sum())),
            y=("event_type", lambda s: int((s == "view").sum())),
        )
        .sort_index()
    )
    x, y = d.x.to_numpy(float), d.y.to_numpy(float)
    n = len(x)
    for row in res.itertuples():
        p = row.period_days
        pxx = pyy = cre = cim = 0.0
        nseg = 0
        k = 0
        while k * 7 + 14 <= n:
            xs = x[k * 7: k * 7 + 14]
            ys = y[k * 7: k * 7 + 14]
            u = np.arange(14)
            ang = 2 * math.pi * u / p
            cx = ((xs - xs.mean()) * np.cos(ang)).sum()
            sx = ((xs - xs.mean()) * np.sin(ang)).sum()
            cy = ((ys - ys.mean()) * np.cos(ang)).sum()
            sy = ((ys - ys.mean()) * np.sin(ang)).sum()
            pxx += cx * cx + sx * sx
            pyy += cy * cy + sy * sy
            cre += cx * cy + sx * sy
            cim += sx * cy - cx * sy
            nseg += 1
            k += 1
        assert row.n_segments == nseg
        coh = (cre**2 + cim**2) / (pxx * pyy)
        assert 0.0 <= row.coherence2 <= 1.0
        assert row.coherence2 == pytest.approx(coh, abs=2e-3)
        assert row.phase_rad == pytest.approx(
            math.atan2(cim, cre), abs=2e-3
        )
