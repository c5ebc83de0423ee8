"""Semantic invariants for wave-111 (Cronbach alpha, adaptive ECE) —
independent python re-derivations from raw fixture data."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_cronbach_alpha_matches_python(spark):
    res = _Q["stats_cronbach_alpha"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet",
        columns=["o_orderdate", "o_orderpriority", "o_totalprice"],
    )
    cents = (o["o_totalprice"] * 100.0).map(math.floor)
    cell = cents.groupby(
        [o["o_orderdate"].dt.strftime("%Y-%m"), o["o_orderpriority"]]
    ).sum().unstack().dropna()
    k = 5
    vi = cell.var(ddof=1)
    vt = cell.sum(axis=1).var(ddof=1)
    svi = np.floor(vi).sum()  # the operator's whole-cents^2 fold
    alpha = (k / (k - 1)) * (1 - svi / vt)
    assert res["n_blocks"] == len(cell) and res["n_items"] == k
    assert res["sum_item_var_dollars2"] == pytest.approx(svi / 1e4, rel=1e-9)
    assert res["total_var_dollars2"] == pytest.approx(vt / 1e4, rel=1e-6)
    assert res["cronbach_alpha"] == pytest.approx(alpha, abs=1e-5)
    assert res["cronbach_alpha"] <= 1.0


def test_ece_adaptive_matches_python(spark):
    res = _Q["ml_ece_adaptive"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["event_id", "event_type", "value"]
    )
    sq = np.floor(np.minimum(ev["value"] / 500.0, 1.0) * 1e6).astype("int64")
    y = (ev["event_type"] == "purchase").astype(int)
    df = pd.DataFrame(
        {"sq": sq, "y": y, "eid": ev["event_id"]}
    ).sort_values(["sq", "eid"], kind="stable").reset_index(drop=True)
    n = len(df)
    # NTILE(10) semantics: first (n % 10) tiles get ceil(n/10)
    base, extra = divmod(n, 10)
    sizes = [base + 1 if i < extra else base for i in range(10)]
    bins = np.repeat(np.arange(1, 11), sizes)
    df["bin"] = bins
    ece = 0.0
    mce = 0.0
    for _, g in df.groupby("bin"):
        conf = g["sq"].mean() / 1e6
        acc = g["y"].mean()
        gap = abs(conf - acc)
        ece += len(g) * gap
        mce = max(mce, gap)
    ece /= n
    assert res["n"] == n and res["n_bins"] == 10
    assert res["ece_equal_mass"] == pytest.approx(ece, abs=1e-4)
    assert res["mce_equal_mass"] == pytest.approx(mce, abs=1e-4)
    assert res["mce_equal_mass"] >= res["ece_equal_mass"] - 1e-9
