"""Semantic invariants for wave-142 (Youden's J operating point)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _scored():
    d = pd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["text", "n_chars"]
    )
    n_tokens = d.text.str.strip().str.split().map(len)
    keep = n_tokens > 0
    nt = n_tokens[keep].astype(float)
    nc = d.n_chars[keep].astype(float)
    z = -3.0 + 0.9 * np.log(1.0 + nt) - 0.2 * (nc / nt)
    p = np.round(1.0 / (1.0 + np.exp(-z)), 4)
    y = (d.n_chars[keep] >= 250).astype(int).values
    return pd.DataFrame({"p": p, "y": y})


def test_youden_j_matches_brute_force_sweep(spark):
    res = _Q["ml_youden_j"](spark, SF_DIR).toPandas().iloc[0]
    df = _scored()
    np_, nn = int(df.y.sum()), int((1 - df.y).sum())
    best = (-2.0, None)
    for tau in sorted(df.p.unique(), reverse=True):
        pred = df.p >= tau
        tpr = float((pred & (df.y == 1)).sum()) / np_
        fpr = float((pred & (df.y == 0)).sum()) / nn
        j = tpr - fpr
        # tie-break toward smaller tau == later in descending sweep: >=
        if j > best[0] or (j == best[0] and tau < best[1]):
            best = (j, tau, tpr, fpr)
    assert res["n_pos"] == np_ and res["n_neg"] == nn
    assert res["threshold"] == pytest.approx(best[1], abs=1e-9)
    assert res["youden_j"] == pytest.approx(best[0], abs=2e-6)
    assert res["sensitivity"] == pytest.approx(best[2], abs=2e-6)
    assert res["specificity"] == pytest.approx(1.0 - best[3], abs=2e-6)
    assert -1.0 <= res["youden_j"] <= 1.0
