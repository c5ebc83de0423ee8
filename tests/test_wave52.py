"""Semantic invariants for wave-52 operators (OTIF, geometric median) —
independent pandas/numpy re-implementations on top of the DuckDB hash
gate."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_otif_matches_pandas(spark):
    res = _Q["agg_otif"](spark, SF_DIR).toPandas().set_index("month")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    j["late"] = (
        (j["l_shipdate"].dt.normalize() - j["o_orderdate"].dt.normalize()).dt.days > 30
    )
    per_order = j.groupby("o_orderkey").agg(
        month=("o_orderdate", lambda s: s.iloc[0].strftime("%Y-%m")),
        otif=("late", lambda s: int(not s.any())),
        n_lines=("late", "size"),
    )
    for month, g in per_order.groupby("month"):
        row = res.loc[month]
        assert row["n_orders"] == len(g)
        assert row["otif_orders"] == g["otif"].sum()
        assert row["otif_rate"] == pytest.approx(
            g["otif"].mean(), abs=1e-6
        )
        assert row["avg_lines"] == pytest.approx(
            g["n_lines"].mean(), abs=1e-3
        )
    # OTIF is strictly harder than any per-line on-time rate
    assert res["otif_rate"].between(0, 1).all()


def test_geometric_median_matches_numpy(spark):
    res = _Q["stats_geometric_median"](spark, SF_DIR).toPandas().iloc[0]
    sup = pd.read_parquet(f"{SF_DIR}/supplier.parquet")
    ids = sup["s_suppkey"].to_numpy()
    y = (ids * 7919 % 18000).astype(float)
    x = (ids * 104729 % 36000).astype(float)
    n = len(ids)
    cx, cy = x.sum() / n, y.sum() / n

    def weiszfeld(cx, cy):
        d = np.sqrt((x - cx) ** 2 + (y - cy) ** 2 + 1.0)
        sxw = np.floor(x / d * 1e6).sum() / 1e6
        syw = np.floor(y / d * 1e6).sum() / 1e6
        sw = np.floor(1.0 / d * 1e12).sum() / 1e12
        return sxw / sw, syw / sw

    c1 = weiszfeld(cx, cy)
    c2 = weiszfeld(*c1)
    assert res["n_points"] == n
    assert res["centroid_x"] == pytest.approx(cx, abs=0.01)
    assert res["centroid_y"] == pytest.approx(cy, abs=0.01)
    assert res["gmedian_x"] == pytest.approx(c2[0], abs=0.01)
    assert res["gmedian_y"] == pytest.approx(c2[1], abs=0.01)
    assert res["shift_from_centroid"] == pytest.approx(
        math.hypot(c2[0] - cx, c2[1] - cy), abs=0.02
    )
    # Weiszfeld strictly decreases total distance vs the centroid start
    def total_dist(px, py):
        return np.sqrt((x - px) ** 2 + (y - py) ** 2).sum()

    assert total_dist(*c2) <= total_dist(cx, cy) + 1e-6
