"""Semantic invariants for wave-53 operators (chi residuals, RLE audit)
— independent pandas/numpy re-implementations on top of the DuckDB hash
gate."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_chi_residuals_matches_numpy(spark):
    res = (
        _Q["stats_chi_residuals"](spark, SF_DIR)
        .toPandas()
        .set_index(["priority", "status"])
    )
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    ct = pd.crosstab(orders["o_orderpriority"], orders["o_orderstatus"])
    n = ct.to_numpy().sum()
    for pr in ct.index:
        for st in ct.columns:
            obs = ct.loc[pr, st]
            rn, cn = ct.loc[pr].sum(), ct[st].sum()
            exp = rn * cn / n
            resid = (obs - exp) / math.sqrt(
                exp * (1 - rn / n) * (1 - cn / n)
            )
            row = res.loc[(pr, st)]
            assert row["observed"] == obs
            assert row["expected"] == pytest.approx(exp, abs=0.01)
            assert row["adj_residual"] == pytest.approx(resid, abs=1e-3)
            assert row["significant_5pct"] == int(abs(resid) > 1.96)
    assert len(res) == ct.size
    # residuals roughly balance: their sum is near zero
    assert abs(res["adj_residual"].sum()) < 0.5 * len(res)


def test_rle_audit_matches_pandas(spark):
    res = _Q["scan_rle_audit"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")

    def runs(order_cols):
        s = li.sort_values(order_cols, kind="stable")["l_returnflag"]
        return int((s != s.shift(1)).sum())

    r_self = runs(["l_returnflag", "l_orderkey", "l_linenumber"])
    r_date = runs(["l_shipdate", "l_orderkey", "l_linenumber"])
    assert res["n_rows"] == len(li)
    assert res["runs_sorted_by_value"] == r_self
    assert res["runs_sorted_by_shipdate"] == r_date
    assert res["rle_ratio_value_sorted"] == pytest.approx(
        len(li) / r_self, abs=0.1
    )
    assert res["rle_ratio_date_sorted"] == pytest.approx(
        len(li) / r_date, abs=1e-3
    )
    # the storage lesson: value-sorted collapses to |distinct values| runs
    assert res["runs_sorted_by_value"] == li["l_returnflag"].nunique()
    assert res["runs_sorted_by_shipdate"] > 100 * res["runs_sorted_by_value"]
