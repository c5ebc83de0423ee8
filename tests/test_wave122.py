"""Semantic invariants for wave-122 (permutation entropy, Woolf OR CI)
— independent python re-derivations."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_permutation_entropy_matches_python(spark):
    res = _Q["ts_permutation_entropy"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_shipdate", "l_extendedprice"]
    )
    x = (
        (li["l_extendedprice"] * 100.0)
        .map(math.floor)
        .groupby(li["l_shipdate"].dt.normalize())
        .sum()
        .sort_index()
        .to_numpy()
    )
    pats = Counter()
    for i in range(len(x) - 2):
        a, b, c = x[i], x[i + 1], x[i + 2]
        if a < b and b < c:
            p = "012"
        elif a < c and c <= b:
            p = "021"
        elif b <= a and a < c:
            p = "102"
        elif c <= a and a < b:
            p = "120"
        elif b < c and c <= a:
            p = "201"
        else:
            p = "210"
        pats[p] += 1
    m = sum(pats.values())
    h = -sum(n * math.log(n / m) for n in pats.values()) / m
    assert res["n_windows"] == m
    assert res["n_patterns"] == len(pats)
    assert res["perm_entropy_nats"] == pytest.approx(h, abs=1e-4)
    assert res["perm_entropy_norm"] == pytest.approx(
        h / math.log(6), abs=1e-4
    )
    assert 0.0 <= res["perm_entropy_norm"] <= 1.0


def test_odds_ratio_ci_matches_python(spark):
    res = _Q["stats_odds_ratio_ci"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_returnflag", "l_discount"]
    )
    li = li[li["l_returnflag"].isin(["R", "A"])]
    e = (li["l_discount"] >= 0.05).astype(int)
    o = (li["l_returnflag"] == "R").astype(int)
    a = int(((e == 1) & (o == 1)).sum())
    b = int(((e == 1) & (o == 0)).sum())
    c = int(((e == 0) & (o == 1)).sum())
    d = int(((e == 0) & (o == 0)).sum())
    orr = a * d / (b * c)
    se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    lo, hi = math.exp(math.log(orr) - 1.96 * se), math.exp(
        math.log(orr) + 1.96 * se
    )
    assert (res["a"], res["b"], res["c"], res["d"]) == (a, b, c, d)
    assert res["odds_ratio"] == pytest.approx(orr, abs=1e-5)
    assert res["ci_lower"] == pytest.approx(lo, abs=1e-5)
    assert res["ci_upper"] == pytest.approx(hi, abs=1e-5)
    assert res["excludes_one"] == int(lo > 1.0 or hi < 1.0)
    assert res["ci_lower"] < res["odds_ratio"] < res["ci_upper"]
