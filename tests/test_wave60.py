"""Semantic invariants for wave-60 operators (mergeable cardinality /
moment sketches: KMV, AMS F2, linear counting) — independent python
re-derivations of the hash math plus estimator-accuracy bounds."""

from __future__ import annotations

import hashlib
import math

import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_kmv_matches_python(spark):
    res = _Q["sketch_kmv_distinct"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey"])
    keys = li["l_orderkey"].unique()
    hashes = sorted({_h60(str(k)) for k in keys})
    k = 256
    kmin = hashes[:k]
    h_k = kmin[-1]
    est = (k - 1) * float(1 << 60) / h_k if len(kmin) == k else float(len(keys))
    assert res["k"] == min(k, len(hashes))
    assert res["n_exact"] == len(keys)
    assert res["kth_normalized"] == pytest.approx(
        round(h_k / float(1 << 60), 6)
    )
    assert res["kmv_estimate"] == pytest.approx(round(est, 2))
    # KMV stderr ~ 1/sqrt(k-2) ~ 6%; allow 4 sigma
    assert res["rel_err_pct"] < 25.0


def test_ams_f2_matches_python(spark):
    res = _Q["sketch_ams_f2"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet", columns=["l_partkey"])
    freq = li["l_partkey"].value_counts()
    exact = int((freq.astype("int64") ** 2).sum())
    zs = []
    for j in range(16):
        z = 0
        for key, f in freq.items():
            bit = int(hashlib.md5(f"{j}#{key}".encode()).hexdigest()[0], 16) % 2
            z += int(f) * (2 * bit - 1)
        zs.append(z)
    ests = [z * z for z in zs]
    assert res["n_keys"] == len(freq)
    assert res["exact_f2"] == exact
    assert res["est_mean"] == pytest.approx(round(sum(ests) / 16.0, 1))
    assert res["est_min"] == min(ests)
    assert res["est_max"] == max(ests)
    # mean of 16 AMS estimators: stderr ~ sqrt(2/16) ~ 35%; allow ~3 sigma
    assert res["rel_err_mean_pct"] < 100.0


def test_linear_counting_matches_python(spark):
    res = _Q["sketch_linear_counting"](spark, SF_DIR).toPandas().iloc[0]
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_custkey"])
    keys = orders["o_custkey"].unique()
    m = 65536
    occupied = len({_h60(str(k)) % m for k in keys})
    est = -m * math.log((m - occupied) / float(m))
    assert res["m"] == m
    assert res["occupied"] == occupied
    assert res["n_exact"] == len(keys)
    assert res["lc_estimate"] == pytest.approx(round(est, 2))
    # load factor is low at fixture scale: LC should be near-exact
    assert res["rel_err_pct"] < 5.0
    # the estimate corrects hash collisions upward: est >= occupied
    assert res["lc_estimate"] >= res["occupied"]
