"""Semantic invariants for wave-50 operators (bitmap membership,
capture-recapture) — independent python re-implementations on top of
the DuckDB hash gate."""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_bitmap_membership_matches_python(spark):
    res = _Q["join_bitmap_membership"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey").merge(
        cust, left_on="o_custkey", right_on="c_custkey"
    )
    sets: dict[int, set] = defaultdict(set)
    for pk, nk in zip(j["l_partkey"], j["c_nationkey"]):
        sets[pk].add(int(nk))
    both = sum(1 for s in sets.values() if 3 in s and 7 in s)
    either = sum(1 for s in sets.values() if 3 in s or 7 in s)
    reaches = [len(s) for s in sets.values()]
    assert res["n_parts"] == len(sets)
    assert res["parts_nations_3_and_7"] == both
    assert res["parts_nations_3_or_7"] == either
    assert res["max_nation_reach"] == max(reaches)
    assert res["avg_nation_reach"] == pytest.approx(
        sum(reaches) / len(reaches), abs=1e-3
    )
    # inclusion-exclusion sanity
    assert res["parts_nations_3_and_7"] <= res["parts_nations_3_or_7"]


def test_capture_recapture_matches_python(spark):
    res = _Q["stats_capture_recapture"](spark, SF_DIR).toPandas().iloc[0]
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    keys = orders["o_orderkey"].to_numpy().astype(object)
    s1 = np.array([((k * 2654435761) % 4294967296) % 5 == 0 for k in keys])
    s2 = np.array(
        [((k * 1000003 + 17) % 4294967296) % 5 == 0 for k in keys]
    )
    n1, n2, m = int(s1.sum()), int(s2.sum()), int((s1 & s2).sum())
    lp = n1 * n2 / m
    chap = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    assert res["true_n"] == len(keys)
    assert (res["n1"], res["n2"], res["m"]) == (n1, n2, m)
    assert res["lincoln_petersen"] == pytest.approx(lp, abs=0.1)
    assert res["chapman"] == pytest.approx(chap, abs=0.1)
    assert res["chapman_rel_error"] == pytest.approx(
        chap / len(keys) - 1, abs=1e-5
    )
    # two independent ~20% samples estimate the population within ~10%
    assert abs(res["chapman_rel_error"]) < 0.10
