"""Semantic invariants for wave-96 operators (Nemenyi post-hoc,
winsorized correlation, median polish) — independent python
re-derivations from raw fixture data."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_nemenyi_matches_python(spark):
    res = _Q["stats_friedman_nemenyi"](spark, SF_DIR).toPandas()
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet",
        columns=["o_orderdate", "o_orderpriority", "o_totalprice"],
    )
    cents = (o["o_totalprice"] * 100.0).map(math.floor)
    cell = cents.groupby(
        [o["o_orderdate"].dt.strftime("%Y-%m"), o["o_orderpriority"]]
    ).sum().unstack()
    cell = cell.dropna()  # full blocks only
    ranks = cell.rank(axis=1, method="average")
    rbar = ranks.mean()
    nb = len(cell)
    cd = 2.728 * math.sqrt(5 * 6 / (6.0 * nb))
    assert len(res) == 10
    for _, row in res.iterrows():
        a, b = row["trt_a"], row["trt_b"]
        assert row["rank_a"] == pytest.approx(rbar[a], abs=1e-3)
        assert row["rank_b"] == pytest.approx(rbar[b], abs=1e-3)
        assert row["critical_difference"] == pytest.approx(cd, abs=1e-3)
        assert row["significant"] == int(abs(rbar[a] - rbar[b]) > cd)
        assert row["n_blocks"] == nb


def test_winsorized_correlation_matches_python(spark):
    res = _Q["stats_winsorized_correlation"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_extendedprice", "l_quantity"]
    )
    x = (li["l_extendedprice"] * 100.0).map(math.floor).astype("int64").to_numpy()
    y = li["l_quantity"].astype("int64").to_numpy()
    n = len(x)
    g = int(math.floor(0.1 * n))

    def clip(a):
        srt = np.sort(a)
        lo, hi = srt[g], srt[n - g - 1]
        return np.clip(a, lo, hi)

    r_raw = np.corrcoef(x.astype(float), y.astype(float))[0, 1]
    r_w = np.corrcoef(clip(x).astype(float), clip(y).astype(float))[0, 1]
    assert res["n"] == n
    assert res["r_raw"] == pytest.approx(r_raw, abs=1e-6)
    assert res["r_winsorized"] == pytest.approx(r_w, abs=1e-6)


def test_median_polish_matches_python(spark):
    res = _Q["agg_median_polish"](spark, SF_DIR).toPandas()
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet",
        columns=["o_orderdate", "o_orderpriority", "o_totalprice"],
    )
    cents = (o["o_totalprice"] * 100.0).map(math.floor)
    z = cents.groupby(
        [o["o_orderdate"].dt.month, o["o_orderpriority"]]
    ).sum().unstack().astype(float)
    months, pris = list(z.index), list(z.columns)
    row_eff = pd.Series(0.0, index=months)
    col_eff = pd.Series(0.0, index=pris)
    for _ in range(2):
        rmed = z.median(axis=1)  # 5 values: exact middle
        z = z.sub(rmed, axis=0)
        row_eff += rmed
        cmed = z.median(axis=0)  # 12 values: mean of middle two
        z = z.sub(cmed, axis=1)
        col_eff += cmed
    got = res.set_index(["kind", "key"])["effect_dollars"]
    for m in months:
        assert got[("month", f"{m:02d}")] == pytest.approx(
            row_eff[m] / 100.0, abs=1e-3
        )
    for p in pris:
        assert got[("priority", p)] == pytest.approx(
            col_eff[p] / 100.0, abs=1e-3
        )
    assert got[("diag", "max_abs_resid")] == pytest.approx(
        z.abs().max().max() / 100.0, abs=1e-3
    )
    assert got[("diag", "mean_abs_resid")] == pytest.approx(
        z.abs().mean().mean() / 100.0, abs=1e-3
    )
