"""Semantic invariants for wave-123 (partial AUC) — independent python
trapezoid re-derivation on the exact integer ROC grid."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_partial_auc_matches_python(spark):
    res = _Q["ml_partial_auc"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["event_type", "value"]
    )
    sq = np.floor(np.minimum(ev["value"] / 500.0, 1.0) * 1e6).astype("int64")
    y = (ev["event_type"] == "purchase").astype(int)
    df = (
        pd.DataFrame({"sq": sq, "y": y})
        .groupby("sq")
        .agg(pos=("y", "sum"), neg=("y", lambda s: int((1 - s).sum())))
        .sort_index(ascending=False)
    )
    m, n = int(df["pos"].sum()), int(df["neg"].sum())
    cap = n // 10
    tp = fp = 0
    area = 0.0
    for _, row in df.iterrows():
        tp0, fp0 = tp, fp
        tp += row["pos"]
        fp += row["neg"]
        if row["neg"] == 0 or fp0 >= cap:
            continue
        fp1c = min(float(fp), float(cap))
        tp1c = tp0 + (tp - tp0) * (fp1c - fp0) / (fp - fp0)
        area += math.floor((fp1c - fp0) * (tp0 + tp1c) / 2 * 1e2)
    pauc = area / 1e2 / m / n
    f0 = cap / n
    assert res["n_pos"] == m and res["n_neg"] == n
    assert res["pauc_0_10"] == pytest.approx(pauc, abs=1e-6)
    assert res["pauc_normalized"] == pytest.approx(pauc / f0, abs=1e-5)
    spauc = 0.5 * (1 + (pauc - f0 * f0 / 2) / (f0 - f0 * f0 / 2))
    assert res["mcclish_spauc"] == pytest.approx(spauc, abs=1e-5)
    # hard bounds: pAUC in [0, f0]; standardized below 0.5 means the
    # score is under the chance diagonal in this region (true for this
    # near-random fixture score), above 1 is impossible
    assert 0.0 <= res["pauc_0_10"] <= f0 + 1e-9
    assert res["mcclish_spauc"] <= 1.0 + 1e-6
