"""Semantic invariants for wave-51 operators (spectral entropy, exact
Shapley attribution) — independent python re-implementations on top of
the DuckDB hash gate."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_spectral_entropy_matches_numpy(spark):
    res = _Q["ts_spectral_entropy"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    cnt = ev.groupby(ev["ts"].dt.date).size().sort_index().to_numpy()
    mu = cnt.mean()
    t = np.arange(len(cnt))
    pows = {}
    for p in range(2, 15):
        c = sum(
            math.floor((x - mu) * math.cos(2 * math.pi * ti / p) * 1e6)
            for x, ti in zip(cnt, t)
        ) / 1e6
        s = sum(
            math.floor((x - mu) * math.sin(2 * math.pi * ti / p) * 1e6)
            for x, ti in zip(cnt, t)
        ) / 1e6
        pows[p] = math.floor(c * c + s * s)
    tp = sum(pows.values())
    nz = {p: w for p, w in pows.items() if w > 0}
    hq = sum(
        math.floor(-(w / tp) * math.log(w / tp) * 1e9) for w in nz.values()
    )
    h = hq / 1e9
    k = len(nz)
    assert res["n_frequencies"] == k
    assert res["spectral_entropy_nats"] == pytest.approx(h, abs=1e-6)
    assert res["normalized_entropy"] == pytest.approx(
        h / math.log(k), abs=1e-5
    )
    assert res["forecastability"] == pytest.approx(
        1 - h / math.log(k), abs=1e-5
    )
    # a ~uniform arrival stream is nearly white: entropy near the max
    assert res["normalized_entropy"] > 0.7


def test_shapley_attribution_matches_python(spark):
    res = _Q["events_shapley_attribution"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    early = ev["ts"].dt.day <= 10
    touch: dict[int, list] = {}
    for r in ev[early | (ev["event_type"] == "purchase")].itertuples():
        rec = touch.setdefault(r.user_id, [0, 0, 0, 0])
        is_early = r.ts.day <= 10
        if is_early and r.event_type == "view":
            rec[0] = 1
        if is_early and r.event_type == "click":
            rec[1] = 1
        if is_early and r.event_type == "signup":
            rec[2] = 1
        if r.event_type == "purchase" and r.value >= 150.0:
            rec[3] = 1
    cells: dict[tuple, list] = {}
    for tv, tc, ts_, conv in touch.values():
        n, k = cells.get((tv, tc, ts_), (0, 0))
        cells[(tv, tc, ts_)] = (n + 1, k + conv)
    vq = {
        key: math.floor(k / n * 1e6) for key, (n, k) in cells.items()
    }
    g = lambda a, b, c: vq.get((a, b, c), 0)  # noqa: E731
    shap_view = (
        2 * (g(1, 0, 0) - g(0, 0, 0))
        + (g(1, 1, 0) - g(0, 1, 0))
        + (g(1, 0, 1) - g(0, 0, 1))
        + 2 * (g(1, 1, 1) - g(0, 1, 1))
    ) / 6 / 1e6
    shap_click = (
        2 * (g(0, 1, 0) - g(0, 0, 0))
        + (g(1, 1, 0) - g(1, 0, 0))
        + (g(0, 1, 1) - g(0, 0, 1))
        + 2 * (g(1, 1, 1) - g(1, 0, 1))
    ) / 6 / 1e6
    shap_signup = (
        2 * (g(0, 0, 1) - g(0, 0, 0))
        + (g(1, 0, 1) - g(1, 0, 0))
        + (g(0, 1, 1) - g(0, 1, 0))
        + 2 * (g(1, 1, 1) - g(1, 1, 0))
    ) / 6 / 1e6
    total = (g(1, 1, 1) - g(0, 0, 0)) / 1e6
    assert res["shap_view"] == pytest.approx(shap_view, abs=1e-5)
    assert res["shap_click"] == pytest.approx(shap_click, abs=1e-5)
    assert res["shap_signup"] == pytest.approx(shap_signup, abs=1e-5)
    assert res["total_effect"] == pytest.approx(total, abs=1e-5)
    # efficiency axiom: credits sum to the grand-coalition lift
    assert res["shap_view"] + res["shap_click"] + res["shap_signup"] == (
        pytest.approx(res["total_effect"], abs=3e-6)
    )
