"""Semantic invariants for wave-148 (Chatterjee's xi)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _xi(x, y, k1, k2):
    df = pd.DataFrame({"x": x, "y": y, "k1": k1, "k2": k2})
    df = df.sort_values(["x", "k1", "k2"], kind="mergesort").reset_index(
        drop=True
    )
    n = len(df)
    # r_i = #{y_j <= y_i}; l_i = #{y_j >= y_i}
    ys = df.y.values
    order = np.argsort(ys, kind="mergesort")
    sorted_y = ys[order]
    r = np.searchsorted(sorted_y, ys, side="right").astype(np.int64)
    l = n - np.searchsorted(sorted_y, ys, side="left").astype(np.int64)
    num = np.abs(np.diff(r)).sum()
    den = (l.astype(float) * (n - l)).sum()
    return n, 1.0 - n * float(num) / (2.0 * den)


def test_chatterjee_xi_matches_numpy(spark):
    res = _Q["stats_chatterjee_xi"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=[
            "l_extendedprice",
            "l_discount",
            "l_orderkey",
            "l_linenumber",
        ],
    )
    n, xi = _xi(
        li.l_extendedprice.values,
        (li.l_extendedprice * (1 - li.l_discount)).values,
        li.l_orderkey.values,
        li.l_linenumber.values,
    )
    # near-functional dependence: xi must be strongly positive
    assert xi > 0.5
    assert res["n_rows"] == n
    assert res["xi"] == pytest.approx(xi, abs=1e-5)
    assert res["z_no_ties"] == pytest.approx(
        xi * np.sqrt(5.0 * n / 2.0), abs=1e-2
    )
    assert -1.0 <= res["xi"] <= 1.0
