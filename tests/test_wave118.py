"""Semantic invariants for wave-118 (Sobel mediation) — independent
python OLS re-derivation plus the effect-decomposition identity."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_sobel_matches_python_ols(spark):
    res = _Q["stats_sobel_mediation"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_discount", "l_quantity", "l_extendedprice"],
    )
    x = (li["l_discount"] * 10000.0).map(math.floor).astype(float).to_numpy()
    m = li["l_quantity"].astype(float).to_numpy()
    y = (li["l_extendedprice"] * 100.0).map(math.floor).astype(float).to_numpy()
    n = len(x)
    xc, mc, yc = x - x.mean(), m - m.mean(), y - y.mean()
    cxx, cmm = (xc * xc).sum(), (mc * mc).sum()
    cyy = (yc * yc).sum()
    cxm, cxy, cmy = (xc * mc).sum(), (xc * yc).sum(), (mc * yc).sum()
    a = cxm / cxx
    se_a2 = (cmm - a * cxm) / ((n - 2) * cxx)
    det = cxx * cmm - cxm * cxm
    b = (cxx * cmy - cxm * cxy) / det
    cprime = (cmm * cxy - cxm * cmy) / det
    c_total = cxy / cxx
    sse = cyy - cprime * cxy - b * cmy
    se_b2 = sse / (n - 3) * cxx / det
    z = a * b / math.sqrt(b * b * se_a2 + a * a * se_b2)
    assert res["n"] == n
    assert res["a_x_to_m"] == pytest.approx(a, abs=1e-5)
    assert res["b_m_to_y"] == pytest.approx(b, rel=1e-4)
    assert res["c_prime_direct"] == pytest.approx(cprime, rel=1e-4)
    assert res["c_total"] == pytest.approx(c_total, rel=1e-4)
    assert res["indirect_effect"] == pytest.approx(a * b, rel=1e-3)
    assert res["sobel_z"] == pytest.approx(z, abs=2e-2)
    # decomposition identity: total = direct + indirect
    assert res["c_total"] == pytest.approx(
        res["c_prime_direct"] + res["indirect_effect"], abs=1e-3
    )
