"""Semantic invariants for wave-65 operators (DQ rule quarantine,
simplified silhouette, ACF/PACF) — independent pandas re-derivations."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_dq_quarantine_matches_pandas(spark):
    res = _Q["dq_rule_quarantine"](spark, SF_DIR).toPandas().set_index("rule")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    v = {
        "qty_1_to_45": (li["l_quantity"] < 1) | (li["l_quantity"] > 45),
        "discount_le_6pct": li["l_discount"] > 0.06,
        "price_positive": li["l_extendedprice"] <= 0,
        "ship_before_2001": li["l_shipdate"] >= pd.Timestamp("2001-01-01"),
        "tax_le_8pct": li["l_tax"] > 0.08,
    }
    any_mask = np.zeros(len(li), dtype=bool)
    for name, mask in v.items():
        any_mask |= mask.to_numpy()
        assert res.loc[name, "n_violations"] == int(mask.sum())
        assert res.loc[name, "violation_pct"] == pytest.approx(
            round(int(mask.sum()) / len(li), 6)
        )
    assert res.loc["any_rule", "n_violations"] == int(any_mask.sum())
    assert (res["n_rows"] == len(li)).all()
    # union bound: any_rule <= sum of individual rules
    assert res.loc["any_rule", "n_violations"] <= sum(
        int(m.sum()) for m in v.values()
    )
    # the fixture exercises both firing and passing rules
    assert res.loc["price_positive", "n_violations"] == 0
    assert res.loc["qty_1_to_45", "n_violations"] > 0


def test_silhouette_matches_numpy(spark):
    res = _Q["embed_silhouette"](spark, SF_DIR).toPandas().set_index("label")
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    mats = {
        lbl: np.stack(g["embedding"].to_numpy()).astype(np.float64)
        for lbl, g in emb.groupby("label")
    }
    # mirror the engine's quantized per-dim centroid means
    cents = {
        lbl: np.floor(m * 1e6).astype("int64").sum(axis=0) / len(m) / 1e6
        for lbl, m in mats.items()
    }
    for lbl, m in mats.items():
        a = np.sqrt(
            np.floor((m - cents[lbl]) ** 2 * 1e12).astype("int64").sum(axis=1)
            / 1e12
        )
        others = np.stack(
            [
                np.sqrt(
                    np.floor((m - c) ** 2 * 1e12).astype("int64").sum(axis=1)
                    / 1e12
                )
                for o, c in cents.items()
                if o != lbl
            ]
        )
        b = others.min(axis=0)
        s = (b - a) / np.maximum(a, b)
        row = res.loc[lbl]
        assert row["n"] == len(m)
        assert row["mean_intra_dist"] == pytest.approx(
            round(np.floor(a * 1e6).sum() / len(m) / 1e6, 4), abs=1e-3
        )
        assert row["mean_nearest_dist"] == pytest.approx(
            round(np.floor(b * 1e6).sum() / len(m) / 1e6, 4), abs=1e-3
        )
        assert row["silhouette"] == pytest.approx(
            round(np.floor(s * 1e6).sum() / len(m) / 1e6, 4), abs=1e-3
        )
    # silhouette is bounded [-1, 1]
    assert res["silhouette"].between(-1, 1).all()


def test_pacf_matches_numpy(spark):
    res = _Q["ts_pacf"](spark, SF_DIR).toPandas().set_index("lag")
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    daily = ev.groupby(ev["ts"].dt.date).size().sort_index().to_numpy(float)
    xbar = daily.mean()
    c = daily - xbar
    s0 = float((c * c).sum())
    r = [float((c[:-k] * c[k:]).sum()) / s0 for k in (1, 2, 3)]
    phi11 = r[0]
    phi22 = (r[1] - r[0] ** 2) / (1 - r[0] ** 2)
    phi21 = phi11 - phi22 * phi11
    phi33 = (r[2] - phi21 * r[1] - phi22 * r[0]) / (
        1 - phi21 * r[0] - phi22 * r[1]
    )
    for k, (acf, pacf) in enumerate(
        [(r[0], phi11), (r[1], phi22), (r[2], phi33)], start=1
    ):
        assert res.loc[k, "acf"] == pytest.approx(acf, abs=1e-4)
        assert res.loc[k, "pacf"] == pytest.approx(pacf, abs=1e-4)
    # autocorrelations are bounded
    assert res["acf"].abs().max() <= 1.0
    assert res.loc[1, "acf"] == res.loc[1, "pacf"]  # definitionally equal
