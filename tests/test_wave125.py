"""Semantic invariants for wave-125 (Hotelling T²) — numpy linear
algebra must agree with the explicit cofactor solve."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_hotelling_t2_matches_numpy(spark):
    res = _Q["stats_hotelling_t2"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity", "l_discount"],
    )
    li = li[li["l_returnflag"].isin(["R", "A"])]
    x = np.column_stack(
        [
            (li["l_extendedprice"] * 100.0).map(math.floor).astype(float),
            li["l_quantity"].astype(float),
            (li["l_discount"] * 10000.0).map(math.floor).astype(float),
        ]
    )
    g = (li["l_returnflag"] == "R").to_numpy()
    a, b = x[g], x[~g]
    n1, n2 = len(a), len(b)
    d = a.mean(axis=0) - b.mean(axis=0)
    ca = (a - a.mean(axis=0)).T @ (a - a.mean(axis=0))
    cb = (b - b.mean(axis=0)).T @ (b - b.mean(axis=0))
    sp = (ca + cb) / (n1 + n2 - 2)
    t2 = n1 * n2 / (n1 + n2) * float(d @ np.linalg.solve(sp, d))
    f = t2 * (n1 + n2 - 3 - 1) / ((n1 + n2 - 2) * 3)
    assert res["n_returned"] == n1 and res["n_available"] == n2
    assert res["hotelling_t2"] == pytest.approx(t2, abs=1e-3)
    assert res["f_stat"] == pytest.approx(f, abs=1e-3)
    assert res["df1"] == 3 and res["df2"] == n1 + n2 - 4
    assert res["hotelling_t2"] >= 0
