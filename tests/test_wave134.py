"""Semantic invariants for wave-134 (Breslow-Day homogeneity test)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _tables():
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_returnflag"],
    )
    li = li[li.l_returnflag.isin(["R", "A"])]
    yr = pd.to_datetime(li.l_shipdate).dt.year
    exposed = (li.l_discount >= 0.05).astype(int)
    outcome = (li.l_returnflag == "R").astype(int)
    rows = []
    for y, g in pd.DataFrame({"yr": yr, "e": exposed, "o": outcome}).groupby("yr"):
        a = int(((g.e == 1) & (g.o == 1)).sum())
        b = int(((g.e == 1) & (g.o == 0)).sum())
        c = int(((g.e == 0) & (g.o == 1)).sum())
        d = int(((g.e == 0) & (g.o == 0)).sum())
        rows.append((y, a, b, c, d, a + b + c + d))
    return rows


def test_breslow_day_matches_python(spark):
    res = _Q["stats_breslow_day"](spark, SF_DIR).toPandas().iloc[0]
    rows = _tables()
    psi = sum(a * d / n for _, a, b, c, d, n in rows) / sum(
        b * c / n for _, a, b, c, d, n in rows
    )
    chi = dev = vsum = 0.0
    for _, a, b, c, d, n in rows:
        r1, c1 = a + b, a + c
        qa, qb, qc = 1.0 - psi, n - r1 - c1 + psi * (r1 + c1), -psi * r1 * c1
        s = math.sqrt(qb * qb - 4 * qa * qc)
        t1, t2 = (-qb + s) / (2 * qa), (-qb - s) / (2 * qa)
        lo, hi = max(0.0, r1 + c1 - n), min(r1, c1)
        ta = t1 if lo <= t1 <= hi else t2
        assert lo <= ta <= hi  # selected root must be the feasible one
        vv = 1.0 / (
            1.0 / ta + 1.0 / (r1 - ta) + 1.0 / (c1 - ta) + 1.0 / (n - r1 - c1 + ta)
        )
        chi += (a - ta) ** 2 / vv
        dev += a - ta
        vsum += vv
    assert res["n_strata"] == len(rows)
    assert res["df"] == len(rows) - 1
    assert res["or_mh"] == pytest.approx(psi, rel=1e-4)
    assert res["bd_chi2"] == pytest.approx(chi, abs=2e-3)
    assert res["tarone_chi2"] == pytest.approx(chi - dev * dev / vsum, abs=2e-3)
    assert res["tarone_chi2"] <= res["bd_chi2"] + 1e-9
    assert res["bd_chi2"] >= 0.0
