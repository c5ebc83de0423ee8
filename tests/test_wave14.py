"""Semantic invariants for wave-14 operators (geohash encode, IPW ATE,
Markov argmax predictor eval)."""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_bisect(lat: Fraction, lon: Fraction, length: int = 8) -> str:
    """Textbook interval-bisection geohash, exact rational arithmetic."""
    lat_lo, lat_hi = Fraction(-90), Fraction(90)
    lon_lo, lon_hi = Fraction(-180), Fraction(180)
    bits, out, even = 0, [], True
    ch = 0
    for _ in range(length * 5):
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lon_lo = mid
            else:
                ch <<= 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_lo = mid
            else:
                ch <<= 1
                lat_hi = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(_B32[ch])
            bits, ch = 0, 0
    return "".join(out)


def test_geohash_matches_bisection_reference(spark):
    res = _Q["fn_geohash"](spark, SF_DIR).toPandas()
    for r in res.itertuples():
        lat100 = r.s_suppkey * 7919 % 18000
        lon100 = r.s_suppkey * 104729 % 36000
        lat = Fraction(lat100, 100) - 90
        lon = Fraction(lon100, 100) - 180
        assert r.geohash8 == _geohash_bisect(lat, lon)
        assert r.lat == pytest.approx(float(lat), abs=1e-9)
        assert r.lon == pytest.approx(float(lon), abs=1e-9)


def test_ipw_matches_numpy_stratified_estimator(spark):
    res = _Q["ml_ipw_ate"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    u = ev.groupby("user_id").agg(
        n_events=("event_id", "size"),
        t=("event_type", lambda s: int((s == "error").sum() >= 14)),
    )
    y = (
        ev[ev["event_type"] == "purchase"]
        .assign(yq=np.floor(ev.loc[ev["event_type"] == "purchase", "value"] * 100))
        .groupby("user_id")["yq"]
        .sum()
    )
    u["y"] = y.reindex(u.index).fillna(0).astype(np.int64)
    u["s"] = np.minimum(u["n_events"] // 20, 4)
    ipw_num, n_tot = 0.0, 0
    for _s, g in u.groupby("s"):
        n, n1 = len(g), int(g["t"].sum())
        n0 = n - n1
        if n1 == 0 or n0 == 0:
            continue
        y1 = g.loc[g["t"] == 1, "y"].sum()
        y0 = g.loc[g["t"] == 0, "y"].sum()
        ipw_num += y1 * n / n1 - y0 * n / n0
        n_tot += n
    ate = ipw_num / n_tot / 100.0
    kept = u[
        u["s"].isin(
            [s for s, g in u.groupby("s") if 0 < g["t"].sum() < len(g)]
        )
    ]
    naive = (
        kept.loc[kept["t"] == 1, "y"].mean() - kept.loc[kept["t"] == 0, "y"].mean()
    ) / 100.0
    assert res.loc[0, "n_users"] == n_tot
    assert res.loc[0, "naive_diff"] == pytest.approx(naive, abs=1e-3)
    assert res.loc[0, "ipw_ate"] == pytest.approx(ate, abs=1e-3)


def test_next_event_predictor_matches_pandas(spark):
    res = _Q["events_next_event_accuracy"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    us = ev["ts"].astype("int64") // 1000
    ev = ev.assign(us=us).sort_values(["user_id", "us", "event_id"])
    ev["nxt"] = ev.groupby("user_id")["event_type"].shift(-1)
    tr = ev.dropna(subset=["nxt"])
    for r in res.itertuples():
        g = tr[tr["event_type"] == r.from_type]["nxt"].value_counts()
        best = sorted(g.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert r.predicted_next == best[0]
        assert r.n_transitions == g.sum()
        assert r.top1_accuracy == pytest.approx(best[1] / g.sum(), abs=1e-6)
    # accuracy of a 5-class argmax baseline must beat uniform chance
    assert (res["top1_accuracy"] > 0.2).all()
