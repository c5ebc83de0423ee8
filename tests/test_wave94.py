"""Semantic invariants for wave-94 operators (Neyman allocation,
Horvitz–Thompson, FPC sample size) — independent python
re-derivations from raw fixture data."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _orders():
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )
    o["cents"] = (o["o_totalprice"] * 100.0).map(math.floor).astype("int64")
    return o


def test_neyman_allocation_matches_python(spark):
    res = (
        _Q["sample_neyman_allocation"](spark, SF_DIR)
        .toPandas()
        .set_index("stratum")
    )
    o = _orders()
    g = o.groupby("o_orderpriority")["cents"]
    nh = g.size()
    sh = g.std(ddof=1) / 100.0
    # both allocations sum to exactly 500 (largest remainder)
    assert res["n_prop"].sum() == 500
    assert res["n_neyman"].sum() == 500
    frac_prop = 500.0 * nh / nh.sum()
    frac_ney = 500.0 * nh * sh / (nh * sh).sum()

    def lr_round(frac):
        fl = np.floor(frac).astype(int)
        rem = 500 - fl.sum()
        order = sorted(
            frac.index, key=lambda k: (-(frac[k] - math.floor(frac[k])), k)
        )
        out = fl.copy()
        for k in order[:rem]:
            out[k] += 1
        return out

    np_prop = lr_round(frac_prop)
    np_ney = lr_round(frac_ney)
    for k in nh.index:
        assert res.loc[k, "stratum_size"] == nh[k]
        assert res.loc[k, "sd_dollars"] == pytest.approx(sh[k], abs=1e-2)
        assert res.loc[k, "n_prop"] == np_prop[k]
        assert res.loc[k, "n_neyman"] == np_ney[k]


def test_horvitz_thompson_matches_python(spark):
    res = _Q["sample_horvitz_thompson"](spark, SF_DIR).toPandas().iloc[0]
    o = _orders()
    total_c = int(o["cents"].sum())
    p = np.minimum(500.0 * o["cents"] / total_c, 1.0)
    h60 = o["o_orderkey"].map(
        lambda k: int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
    )
    thresh = np.floor(p * float(1 << 60))
    mask = h60 < thresh
    ht = (np.floor(o["cents"][mask] / p[mask] * 1e2).sum() / 1e2) / 100.0
    assert res["n_pop"] == len(o)
    assert res["n_sampled"] == int(mask.sum())
    assert res["expected_n"] == pytest.approx(
        np.floor(p * 1e6).sum() / 1e6, abs=0.01
    )
    assert res["true_total"] == pytest.approx(total_c / 100.0, abs=0.02)
    assert res["ht_estimate"] == pytest.approx(ht, abs=0.05)
    # HT under pps-by-value is tight: within a few percent of truth
    assert res["rel_err"] < 0.10


def test_sample_size_fpc_matches_python(spark):
    res = _Q["profile_sample_size_fpc"](spark, SF_DIR).toPandas().iloc[0]
    o = _orders()
    n = len(o)
    mean_d = o["cents"].mean() / 100.0
    sd_d = o["cents"].std(ddof=1) / 100.0
    d = 0.01 * mean_d
    n0 = (1.96 * sd_d / d) ** 2
    nf = n0 / (1 + (n0 - 1) / n)
    assert res["n_pop"] == n
    assert res["mean_dollars"] == pytest.approx(mean_d, abs=0.02)
    assert res["sd_dollars"] == pytest.approx(sd_d, abs=0.02)
    assert res["n_needed_infinite"] == math.ceil(n0)
    assert res["n_needed_fpc"] == math.ceil(nf)
    # FPC can only shrink the requirement
    assert res["n_needed_fpc"] <= res["n_needed_infinite"]
