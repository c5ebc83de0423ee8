"""Semantic invariants for wave-117 (Tukey HSD, KS separation) —
independent python re-derivations from raw fixture data."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_tukey_hsd_matches_python(spark):
    res = _Q["stats_tukey_hsd"](spark, SF_DIR).toPandas()
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )
    y = (o["o_totalprice"] * 100.0).map(math.floor).astype(float)
    gs = {g: v.to_numpy() for g, v in y.groupby(o["o_orderpriority"])}
    nn = sum(len(v) for v in gs.values())
    k = len(gs)
    msw = sum(((v - v.mean()) ** 2).sum() for v in gs.values()) / (nn - k)
    assert len(res) == 10
    for _, row in res.iterrows():
        a, b = gs[row["g_a"]], gs[row["g_b"]]
        diff = a.mean() - b.mean()
        hsd = 3.858 * math.sqrt(msw / 2 * (1 / len(a) + 1 / len(b)))
        assert row["mean_diff_dollars"] == pytest.approx(diff / 100, abs=0.02)
        assert row["hsd_dollars"] == pytest.approx(hsd / 100, abs=0.02)
        assert row["significant"] == int(abs(diff) > hsd)
        assert row["df_within"] == nn - k


def test_ks_separation_matches_python(spark):
    res = _Q["ml_ks_separation"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["event_type", "value"]
    )
    sq = np.floor(np.minimum(ev["value"] / 500.0, 1.0) * 1e6).astype("int64")
    y = (ev["event_type"] == "purchase").astype(int).to_numpy()
    pos = np.sort(sq[y == 1].to_numpy())
    neg = np.sort(sq[y == 0].to_numpy())
    grid = np.unique(np.concatenate([pos, neg]))
    fp = np.searchsorted(pos, grid, side="right") / len(pos)
    fn = np.searchsorted(neg, grid, side="right") / len(neg)
    gaps = np.abs(fp - fn)
    i = int(np.argmax(gaps))  # first max = lowest score on ties
    assert res["n_pos"] == len(pos) and res["n_neg"] == len(neg)
    assert res["ks_statistic"] == pytest.approx(gaps[i], abs=1e-6)
    assert res["ks_threshold"] == pytest.approx(grid[i] / 1e6, abs=1e-9)
    assert 0.0 <= res["ks_statistic"] <= 1.0
