"""Semantic invariants for wave-129 (concentration ratios, calibration
slope) — independent python re-derivations."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_concentration_ratios_match_python(spark):
    res = _Q["agg_concentration_ratios"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_partkey", "l_extendedprice"]
    )
    p = pd.read_parquet(
        f"{SF_DIR}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    m = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    rev = (
        (m["l_extendedprice"] * 100.0)
        .map(math.floor)
        .groupby(m["p_brand"])
        .sum()
        .sort_values(ascending=False)
    )
    tot = rev.sum()
    assert res["n_brands"] == len(rev)
    assert res["cr1"] == pytest.approx(rev.iloc[:1].sum() / tot, abs=1e-6)
    assert res["cr4"] == pytest.approx(rev.iloc[:4].sum() / tot, abs=1e-6)
    assert res["cr8"] == pytest.approx(rev.iloc[:8].sum() / tot, abs=1e-6)
    hhi = ((rev / tot) ** 2).sum() * 10000
    assert res["hhi_points"] == pytest.approx(hhi, abs=0.05)
    assert res["cr1"] <= res["cr4"] <= res["cr8"] <= 1.0


def test_calibration_slope_matches_python(spark):
    res = _Q["ml_calibration_slope"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["event_id", "event_type", "value"]
    )
    sq = np.floor(np.minimum(ev["value"] / 500.0, 1.0) * 1e6).astype("int64")
    y = (ev["event_type"] == "purchase").astype(int)
    df = pd.DataFrame({"sq": sq, "y": y, "eid": ev["event_id"]}).sort_values(
        ["sq", "eid"], kind="stable"
    ).reset_index(drop=True)
    n = len(df)
    base, extra = divmod(n, 10)
    sizes = [base + 1 if i < extra else base for i in range(10)]
    df["bin"] = np.repeat(np.arange(1, 11), sizes)
    g = df.groupby("bin").agg(nk=("y", "size"), spq=("sq", "sum"), sy=("y", "sum"))
    w = g["nk"].sum()
    sx = g["spq"].sum() / 1e6
    syt = g["sy"].sum()
    sxx = (g["spq"].astype(float) ** 2 / g["nk"]).sum() / 1e12
    sxy = (g["spq"].astype(float) * g["sy"] / g["nk"]).sum() / 1e6
    slope = (w * sxy - sx * syt) / (w * sxx - sx * sx)
    intercept = (syt - slope * sx) / w
    citl = syt / w - sx / w
    assert res["n_obs"] == w
    assert res["calibration_slope"] == pytest.approx(slope, abs=1e-3)
    assert res["calibration_intercept"] == pytest.approx(intercept, abs=1e-3)
    assert res["calibration_in_the_large"] == pytest.approx(citl, abs=1e-5)
