"""Semantic invariants for wave-101 operators (Cucconi, Lepage,
broadcast-threshold audit) — independent python re-derivations from
raw fixture data."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _pooled_midranks():
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_returnflag", "l_extendedprice"]
    )
    li = li[li["l_returnflag"].isin(["R", "A"])]
    cents = (li["l_extendedprice"] * 100.0).map(math.floor).astype("int64")
    is_y = (li["l_returnflag"] == "R").to_numpy()
    r = pd.Series(cents).rank(method="average").to_numpy()
    return r, is_y


def test_cucconi_matches_python(spark):
    res = _Q["stats_cucconi"](spark, SF_DIR).toPandas().iloc[0]
    r, is_y = _pooled_midranks()
    nn = len(r)
    m = int(is_y.sum())
    ry = r[is_y]
    denom = math.sqrt(
        m * (nn - m) * (nn + 1) * (2 * nn + 1) * (8 * nn + 11) / 5
    )
    u = (6 * (ry**2).sum() - m * (nn + 1) * (2 * nn + 1)) / denom
    vv = (6 * ((nn + 1 - ry) ** 2).sum() - m * (nn + 1) * (2 * nn + 1)) / denom
    rho = 2 * (nn * nn - 4) / ((2 * nn + 5) * (8 * nn + 11)) - 1
    c = (u * u + vv * vv - 2 * rho * u * vv) / (2 * (1 - rho * rho))
    assert res["n_y"] == m and res["n_x"] == nn - m
    assert res["u_stat"] == pytest.approx(u, abs=1e-3)
    assert res["v_stat"] == pytest.approx(vv, abs=1e-3)
    assert res["rho"] == pytest.approx(rho, abs=1e-6)
    assert res["cucconi_c"] == pytest.approx(c, abs=1e-2)
    assert res["cucconi_c"] >= 0


def test_lepage_matches_python(spark):
    res = _Q["stats_lepage"](spark, SF_DIR).toPandas().iloc[0]
    r, is_y = _pooled_midranks()
    nn = len(r)
    m = int(is_y.sum())
    n = nn - m
    ry = r[is_y]
    w = ry.sum()
    # tie-corrected Wilcoxon variance
    vals, t = np.unique(
        pd.read_parquet(
            f"{SF_DIR}/lineitem.parquet",
            columns=["l_returnflag", "l_extendedprice"],
        )
        .query("l_returnflag in ('R','A')")["l_extendedprice"]
        .mul(100.0)
        .map(math.floor)
        .astype("int64"),
        return_counts=True,
    )
    tie3 = int((t * (t - 1) * (t + 1)).sum())
    var_w = m * n / (12 * nn * (nn - 1)) * (nn**3 - nn - tie3)
    z_w = (w - m * (nn + 1) / 2) / math.sqrt(var_w)
    a = np.minimum(ry, nn + 1 - ry).sum()
    if nn % 2 == 0:
        ea = m * (nn + 2) / 4
        va = m * n * (nn + 2) * (nn - 2) / (48 * (nn - 1))
    else:
        ea = m * (nn + 1) ** 2 / (4 * nn)
        va = m * n * (nn + 1) * (3 + nn * nn) / (48 * nn * nn)
    z_a = (a - ea) / math.sqrt(va)
    assert res["n_y"] == m and res["n_x"] == n
    assert res["z_wilcoxon"] == pytest.approx(z_w, abs=1e-3)
    assert res["z_ansari"] == pytest.approx(z_a, abs=1e-3)
    assert res["lepage_l"] == pytest.approx(z_w**2 + z_a**2, abs=1e-2)


def test_broadcast_threshold_audit(spark):
    res = (
        _Q["plan_broadcast_threshold_audit"](spark, SF_DIR).toPandas().iloc[0]
    )
    # default threshold must broadcast the 25-row dim; disabling must not
    assert res["strategy_default"] == "broadcast_hash"
    assert res["strategy_disabled"] in ("sort_merge", "shuffled_hash")
    assert res["results_identical"] == 1
    assert res["rows_default"] == res["rows_disabled"]
