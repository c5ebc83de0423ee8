"""Semantic invariants for wave-85 operators (Cochran–Armitage,
Mantel–Haenszel, Goodman–Kruskal gamma) — independent python
re-derivations from raw fixture data."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_cochran_armitage_matches_python(spark):
    res = _Q["stats_cochran_armitage"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderpriority", "o_orderstatus"]
    )
    w = o["o_orderpriority"].str[0].astype(int)
    succ = (o["o_orderstatus"] == "F").astype(int)
    g = pd.DataFrame({"w": w, "s": succ}).groupby("w")["s"].agg(["count", "sum"])
    nn, rr = int(g["count"].sum()), int(g["sum"].sum())
    ws = g.index.to_numpy()
    t = (ws * g["sum"]).sum() - rr / nn * (ws * g["count"]).sum()
    var = (
        rr / nn
        * (1 - rr / nn)
        * ((ws**2 * g["count"]).sum() - (ws * g["count"]).sum() ** 2 / nn)
    )
    assert res["n_groups"] == len(g)
    assert res["n_total"] == nn and res["n_success"] == rr
    assert res["t_stat"] == pytest.approx(t, abs=1e-3)
    assert res["z"] == pytest.approx(t / math.sqrt(var), abs=1e-3)


def test_mantel_haenszel_matches_python(spark):
    res = _Q["stats_mantel_haenszel"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_returnflag"],
    )
    li = li[li["l_returnflag"].isin(["R", "A"])]
    yr = li["l_shipdate"].dt.year
    exp = (li["l_discount"] >= 0.05).astype(int)
    out = (li["l_returnflag"] == "R").astype(int)
    df = pd.DataFrame({"yr": yr, "e": exp, "o": out})
    num = den = sa = ea = va = 0.0
    n_strata = 0
    for _, s in df.groupby("yr"):
        a = int(((s["e"] == 1) & (s["o"] == 1)).sum())
        b = int(((s["e"] == 1) & (s["o"] == 0)).sum())
        c = int(((s["e"] == 0) & (s["o"] == 1)).sum())
        d = int(((s["e"] == 0) & (s["o"] == 0)).sum())
        n = a + b + c + d
        n_strata += 1
        num += a * d / n
        den += b * c / n
        sa += a
        ea += (a + b) * (a + c) / n
        va += (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
    assert res["n_strata"] == n_strata
    assert res["sum_a"] == sa
    assert res["or_mh"] == pytest.approx(num / den, abs=1e-5)
    assert res["chi2_cmh"] == pytest.approx((sa - ea) ** 2 / va, abs=1e-2)


def test_gamma_matches_python(spark):
    res = _Q["stats_gamma_concordance"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey"])
    cnt = li.groupby("l_orderkey").size().rename("cnt")
    m = o.set_index("o_orderkey").join(cnt, how="inner")
    x = m["o_orderpriority"].str[0].astype(int).to_numpy()
    y = np.minimum(m["cnt"].to_numpy(), 7)
    cells = pd.DataFrame({"x": x, "y": y}).groupby(["x", "y"]).size()
    p = q = 0
    items = list(cells.items())
    for (ax, ay), ac in items:
        for (bx, by), bc in items:
            if bx > ax and by > ay:
                p += ac * bc
            elif bx > ax and by < ay:
                q += ac * bc
    assert res["n_orders"] == len(m)
    assert res["p_concordant"] == p and res["q_discordant"] == q
    assert res["gamma"] == pytest.approx((p - q) / (p + q), abs=1e-6)
    assert -1.0 <= res["gamma"] <= 1.0
