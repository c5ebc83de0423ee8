"""Semantic invariants for wave-93 operators (Somers' D, Theil's U,
Poisson dispersion) — independent python re-derivations from raw
fixture data."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _ordinal_pairs():
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey"])
    cnt = li.groupby("l_orderkey").size().rename("cnt")
    m = o.set_index("o_orderkey").join(cnt, how="inner")
    x = m["o_orderpriority"].str[0].astype(int).to_numpy()
    y = np.minimum(m["cnt"].to_numpy(), 7)
    return x, y


def test_somers_d_matches_python(spark):
    res = _Q["stats_somers_d"](spark, SF_DIR).toPandas().iloc[0]
    x, y = _ordinal_pairs()
    cells = Counter(zip(x, y))
    p = q = 0
    items = list(cells.items())
    for (ax, ay), ac in items:
        for (bx, by), bc in items:
            if bx > ax and by > ay:
                p += ac * bc
            elif bx > ax and by < ay:
                q += ac * bc
    n = len(x)
    sx2 = sum(c * c for c in Counter(x).values())
    sy2 = sum(c * c for c in Counter(y).values())
    d_yx = (p - q) / ((n * n - sx2) / 2)
    d_xy = (p - q) / ((n * n - sy2) / 2)
    assert res["n_orders"] == n
    assert res["p_concordant"] == p and res["q_discordant"] == q
    assert res["d_yx"] == pytest.approx(d_yx, abs=1e-6)
    assert res["d_xy"] == pytest.approx(d_xy, abs=1e-6)
    # Somers' D magnitudes never exceed gamma's
    gam = _Q["stats_gamma_concordance"](spark, SF_DIR).toPandas().iloc[0]
    assert abs(res["d_yx"]) <= abs(gam["gamma"]) + 1e-9
    assert abs(res["d_xy"]) <= abs(gam["gamma"]) + 1e-9


def test_theil_u_matches_python(spark):
    res = _Q["stats_theil_u"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderpriority", "o_orderstatus"]
    )
    n = len(o)
    cells = Counter(zip(o["o_orderpriority"], o["o_orderstatus"]))
    hx = -sum(
        c * math.log(c / n) for c in Counter(o["o_orderpriority"]).values()
    ) / n
    hy = -sum(
        c * math.log(c / n) for c in Counter(o["o_orderstatus"]).values()
    ) / n
    hxy = -sum(c * math.log(c / n) for c in cells.values()) / n
    mi = hx + hy - hxy
    assert res["n_orders"] == n
    assert res["h_x"] == pytest.approx(hx, abs=1e-5)
    assert res["h_y"] == pytest.approx(hy, abs=1e-5)
    assert res["h_xy"] == pytest.approx(hxy, abs=1e-5)
    assert res["u_y_given_x"] == pytest.approx(mi / hy, abs=1e-4)
    assert res["u_x_given_y"] == pytest.approx(mi / hx, abs=1e-4)
    assert 0.0 <= res["u_y_given_x"] <= 1.0
    assert 0.0 <= res["u_x_given_y"] <= 1.0


def test_poisson_dispersion_matches_python(spark):
    res = _Q["events_poisson_dispersion"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["ts"])
    x = ev.groupby(ev["ts"].dt.normalize()).size().to_numpy().astype(float)
    n = len(x)
    mean_x, var_x = x.mean(), x.var(ddof=1)
    d = var_x / mean_x
    chi2 = (n - 1) * d
    z = math.sqrt(2 * chi2) - math.sqrt(2 * (n - 1) - 1)
    assert res["n_days"] == n
    assert res["mean_daily"] == pytest.approx(mean_x, abs=1e-3)
    assert res["var_daily"] == pytest.approx(var_x, abs=1e-3)
    assert res["dispersion_index"] == pytest.approx(d, abs=1e-3)
    assert res["chi2"] == pytest.approx(chi2, abs=0.1)
    assert res["z"] == pytest.approx(z, abs=1e-3)
    assert res["overdispersed"] == int(z > 1.645)
