"""Semantic invariants for wave-139 (Hosmer-Lemeshow test)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_hosmer_lemeshow_matches_python(spark):
    res = _Q["ml_hosmer_lemeshow"](spark, SF_DIR).toPandas().iloc[0]
    d = pd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["text", "n_chars"]
    )
    n_tokens = d.text.str.strip().str.split().map(len)
    keep = n_tokens > 0
    nt = n_tokens[keep].astype(float)
    nc = d.n_chars[keep].astype(float)
    z = -3.0 + 0.9 * np.log(1.0 + nt) - 0.2 * (nc / nt)
    p = np.clip(np.round(1.0 / (1.0 + np.exp(-z)), 4), 0.0001, 0.9999)
    y = (d.n_chars[keep] >= 250).astype(int)
    df = pd.DataFrame({"p": p, "y": y})
    pts = (
        df.groupby("p")
        .agg(cnt=("y", "size"), pos=("y", "sum"))
        .sort_index()
        .reset_index()
    )
    n = int(pts.cnt.sum())
    before = pts.cnt.cumsum() - pts.cnt
    pts["decile"] = np.minimum(9, np.floor(before * 10.0 / n)).astype(int)
    pts["pq"] = pts.cnt * np.round(pts.p * 10000.0).astype(int)
    g = pts.groupby("decile").agg(
        n_g=("cnt", "sum"), o1=("pos", "sum"), e1q=("pq", "sum")
    )
    e1 = g.e1q / 10000.0
    chi2 = float(
        (((g.o1 - e1) ** 2) / (e1 * (1.0 - e1 / g.n_g))).sum()
    )
    assert res["n_docs"] == n
    assert res["n_groups"] == len(g)
    assert res["df"] == len(g) - 2
    assert res["hl_chi2"] == pytest.approx(chi2, rel=1e-4, abs=1e-3)
    assert res["hl_chi2"] >= 0.0
