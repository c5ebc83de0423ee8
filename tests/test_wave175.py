"""Semantic invariants for wave 175 (IV/2SLS, off-policy IPS) against
independent numpy/hashlib references."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_iv_2sls_matches_numpy(spark):
    res = _Q["ml_iv_2sls"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_discount", "l_quantity", "l_extendedprice"],
    )
    z = np.round(li.l_discount.to_numpy() * 10000.0).astype(np.int64)
    x = li.l_quantity.to_numpy().astype(np.int64)
    y = np.floor(
        li.l_extendedprice.to_numpy() * (1.0 - li.l_discount.to_numpy())
        * 100.0
    ).astype(np.int64)
    zf, xf, yf = z.astype(float), x.astype(float), y.astype(float)
    czx = ((zf - zf.mean()) * (xf - xf.mean())).sum()
    czy = ((zf - zf.mean()) * (yf - yf.mean())).sum()
    cxy = ((xf - xf.mean()) * (yf - yf.mean())).sum()
    czz = ((zf - zf.mean()) ** 2).sum()
    cxx = ((xf - xf.mean()) ** 2).sum()
    n = len(z)
    r2 = czx**2 / (czz * cxx)
    assert res.n_rows == n
    assert res.beta_ols == pytest.approx(cxy / cxx / 100.0, abs=1e-4)
    assert res.beta_iv == pytest.approx(czy / czx / 100.0, abs=1e-4)
    # engine emits F rounded to 2 dp
    assert res.first_stage_f == pytest.approx(
        r2 * (n - 2) / (1 - r2), abs=0.006
    )
    assert res.endogeneity_gap == pytest.approx(
        (czy / czx - cxy / cxx) / 100.0, abs=1e-4
    )


def test_offpolicy_ips_matches_reference(spark):
    res = _Q["ml_offpolicy_ips"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet",
        columns=["user_id", "event_type", "value"],
    )
    ev["r"] = np.where(
        ev.event_type == "purchase",
        np.floor(ev.value.to_numpy() * 100.0).astype(np.int64),
        0,
    )
    u = ev.groupby("user_id").r.sum()
    a = np.array(
        [
            int(hashlib.md5(str(uid).encode()).hexdigest()[:8], 16) % 2
            for uid in u.index
        ]
    )
    pi = (u.index.to_numpy() % 3 == 0).astype(int)
    r = u.to_numpy().astype(float)
    n = len(r)
    match = a == pi
    assert res.n_users == n
    assert res.v_logging == pytest.approx(r.mean() / 100.0, abs=1e-3)
    assert res.v_ips == pytest.approx(
        2.0 * r[match].sum() / n / 100.0, abs=1e-3
    )
    assert res.v_snips == pytest.approx(
        r[match].mean() / 100.0, abs=1e-3
    )
    assert res.ess == pytest.approx(int(match.sum()), abs=0.1)
    assert res.match_rate == pytest.approx(match.mean(), abs=1e-4)
    # a half-propensity coin should match a deterministic policy ~50%
    assert 0.35 < res.match_rate < 0.65
