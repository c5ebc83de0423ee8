"""Semantic invariants for wave-138 (Lerner markup index)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_lerner_index_matches_pandas(spark):
    res = _Q["market_lerner_index"](spark, SF_DIR).toPandas()
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_quantity"],
    )
    part = pd.read_parquet(
        f"{SF_DIR}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    li["net"] = li.l_extendedprice * (1 - li.l_discount)
    li["unit"] = li.net / li.l_quantity
    li["u_min"] = li.groupby("l_partkey")["unit"].transform("min")
    li["rev_c"] = (li.net * 100.0).map(math.floor).astype(object)
    li["cost_c"] = (li.u_min * li.l_quantity * 100.0).map(math.floor).astype(
        object
    )
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    g = j.groupby("p_brand").agg(
        n=("rev_c", "size"), rev=("rev_c", "sum"), cost=("cost_c", "sum")
    )
    assert set(res.p_brand) == set(g.index)
    for _, row in res.iterrows():
        ref = g.loc[row.p_brand]
        assert row.n_lines == ref.n
        assert row.revenue == pytest.approx(int(ref.rev) / 100.0, abs=0.011)
        assert row.floor_cost == pytest.approx(
            int(ref.cost) / 100.0, abs=0.011
        )
        assert row.lerner_index == pytest.approx(
            1.0 - int(ref.cost) / int(ref.rev), abs=2e-6
        )
        # floor-cost proxy never exceeds revenue
        assert 0.0 <= row.lerner_index < 1.0
    # sorted by markup power
    assert list(res.lerner_index) == sorted(res.lerner_index, reverse=True)
