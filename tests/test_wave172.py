"""Semantic invariants for wave 172 (hierarchical forecast
reconciliation) against a pandas re-derivation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_forecast_reconcile_matches_pandas(spark):
    res = (
        _Q["ts_forecast_reconcile"](spark, SF_DIR)
        .toPandas()
        .set_index("nation")
    )
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )
    c = pd.read_parquet(
        f"{SF_DIR}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    n = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    o = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        n, left_on="c_nationkey", right_on="n_nationkey"
    )
    o["yr"] = pd.to_datetime(o.o_orderdate).dt.year
    o = o[o.yr.isin([1995, 1996, 1997])]
    o["cents"] = np.floor(o.o_totalprice.to_numpy() * 100.0).astype(
        np.int64
    )
    piv = o.pivot_table(
        index="n_name", columns="yr", values="cents", aggfunc="sum",
        fill_value=0,
    )
    t95, t96 = piv[1995].sum(), piv[1996].sum()
    for nation, row in piv.iterrows():
        share = 0.5 * (row[1995] / t95 + row[1996] / t96)
        fc_td = t96 * share
        assert res.loc[nation].actual_1997 == pytest.approx(
            row[1997] / 100.0, abs=0.011
        )
        assert res.loc[nation].fc_bottom_up == pytest.approx(
            row[1996] / 100.0, abs=0.011
        )
        assert res.loc[nation].fc_top_down == pytest.approx(
            fc_td / 100.0, abs=0.02
        )
        assert res.loc[nation].ape_bottom_up == pytest.approx(
            abs(row[1996] - row[1997]) / row[1997], abs=1e-4
        )
        assert res.loc[nation].ape_top_down == pytest.approx(
            abs(fc_td - row[1997]) / row[1997], abs=1e-4
        )
    # coherence: bottom-up forecasts sum exactly to the top-level naive
    assert res.fc_bottom_up.sum() == pytest.approx(t96 / 100.0, abs=0.3)


def test_cv_backtest_matches_pandas(spark):
    res = (
        _Q["ts_cv_backtest"](spark, SF_DIR)
        .toPandas()
        .set_index("cutoff_month_1997")
    )
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    d = pd.to_datetime(o.o_orderdate)
    o = o.assign(m=d.dt.year * 12 + d.dt.month)
    o["cents"] = np.floor(o.o_totalprice.to_numpy() * 100.0).astype(
        np.int64
    )
    mon = o.groupby("m").cents.sum()
    assert len(res) == 12
    for mm in range(1, 13):
        t = 1997 * 12 + mm
        act, lm, sn = mon[t], mon[t - 1], mon[t - 12]
        assert res.loc[mm].actual == pytest.approx(act / 100.0, abs=0.011)
        assert res.loc[mm].fc_last_month == pytest.approx(
            lm / 100.0, abs=0.011
        )
        assert res.loc[mm].fc_seasonal_naive == pytest.approx(
            sn / 100.0, abs=0.011
        )
        assert res.loc[mm].ape_last_month == pytest.approx(
            abs(lm - act) / act, abs=1e-4
        )
        assert res.loc[mm].ape_seasonal_naive == pytest.approx(
            abs(sn - act) / act, abs=1e-4
        )
