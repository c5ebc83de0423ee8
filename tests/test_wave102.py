"""Semantic invariants for wave-102 operators (segmented trend, Quade
test, ratio estimator) — independent python re-derivations from raw
fixture data."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_segmented_trend_matches_python(spark):
    res = _Q["ts_segmented_trend"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_shipdate", "l_extendedprice"]
    )
    li = li[(li["l_shipdate"] >= "1996-01-01") & (li["l_shipdate"] < "2000-01-01")]
    t = (li["l_shipdate"].dt.normalize() - pd.Timestamp("1996-01-01")).dt.days
    seg = (li["l_shipdate"] >= "1998-01-01").astype(int)
    y = (li["l_extendedprice"] * 100.0).map(math.floor)
    daily = pd.DataFrame({"t": t, "seg": seg, "y": y}).groupby(["seg", "t"])[
        "y"
    ].sum()
    out = {}
    for s in (0, 1):
        d = daily.loc[s]
        tt, yy = d.index.to_numpy(float), d.to_numpy(float)
        n = len(tt)
        slope = (n * (tt * yy).sum() - tt.sum() * yy.sum()) / (
            n * (tt * tt).sum() - tt.sum() ** 2
        )
        icept = (yy.sum() - slope * tt.sum()) / n
        out[s] = (n, slope, icept)
    assert res["n_days_pre"] == out[0][0]
    assert res["n_days_post"] == out[1][0]
    assert res["slope_pre_dollars"] == pytest.approx(out[0][1] / 100, abs=1e-4)
    assert res["slope_post_dollars"] == pytest.approx(out[1][1] / 100, abs=1e-4)
    fa = out[0][2] + out[0][1] * 730
    fb = out[1][2] + out[1][1] * 730
    assert res["level_change_dollars"] == pytest.approx(
        (fb - fa) / 100, abs=0.5
    )
    assert res["slope_change_dollars"] == pytest.approx(
        (out[1][1] - out[0][1]) / 100, abs=1e-4
    )


def test_quade_matches_python(spark):
    res = _Q["stats_quade_test"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet",
        columns=["o_orderdate", "o_orderpriority", "o_totalprice"],
    )
    cents = (o["o_totalprice"] * 100.0).map(math.floor)
    cell = cents.groupby(
        [o["o_orderdate"].dt.strftime("%Y-%m"), o["o_orderpriority"]]
    ).sum().unstack().dropna()
    b, k = len(cell), 5
    r = cell.rank(axis=1, method="average")
    q = (cell.max(axis=1) - cell.min(axis=1)).rank(method="average")
    s = r.sub((k + 1) / 2).mul(q, axis=0)
    a_stat = (s**2).to_numpy().sum()
    b_stat = (s.sum() ** 2).sum() / b
    f = (b - 1) * b_stat / (a_stat - b_stat)
    assert res["n_blocks"] == b and res["k"] == k
    assert res["df1"] == 4 and res["df2"] == (b - 1) * 4
    assert res["f_quade"] == pytest.approx(f, abs=1e-3)


def test_ratio_estimator_matches_python(spark):
    res = _Q["sample_ratio_estimator"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey"])
    x = li.groupby("l_orderkey").size().rename("x")
    m = o.set_index("o_orderkey").join(x, how="inner")
    y = (m["o_totalprice"] * 100.0).map(math.floor)
    h = pd.Series(m.index).map(
        lambda kk: int(hashlib.md5(str(kk).encode()).hexdigest()[:15], 16)
    ).to_numpy()
    mask = h < math.floor(0.1 * float(1 << 60))
    ys, xs = y.to_numpy()[mask], m["x"].to_numpy()[mask]
    n_pop, n_s = len(m), int(mask.sum())
    exp_est = ys.sum() * n_pop / n_s
    ratio_est = ys.sum() / xs.sum() * m["x"].sum()
    truth = y.sum()
    assert res["n_pop"] == n_pop and res["n_sample"] == n_s
    assert res["true_total"] == pytest.approx(truth / 100, abs=0.02)
    assert res["expansion_estimate"] == pytest.approx(exp_est / 100, abs=0.5)
    assert res["ratio_estimate"] == pytest.approx(ratio_est / 100, abs=0.5)
    # both estimators land close to truth on a 10% sample; which one
    # wins depends on the realized sample (the within-order price
    # variance keeps the correlation moderate), so pin magnitudes only
    assert res["rel_err_ratio"] < 0.05
    assert res["rel_err_expansion"] < 0.05
