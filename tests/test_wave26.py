"""Semantic invariants for wave-26 operators (permutation importance,
k-fold CV from mergeable sufficient statistics) — independent numpy
re-implementations on top of the DuckDB hash gate."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _ols2_r2(x1, x2, y):
    n = len(y)
    a11 = (x1 * x1).sum() - x1.sum() ** 2 / n
    a22 = (x2 * x2).sum() - x2.sum() ** 2 / n
    a12 = (x1 * x2).sum() - x1.sum() * x2.sum() / n
    b1 = (x1 * y).sum() - x1.sum() * y.sum() / n
    b2 = (x2 * y).sum() - x2.sum() * y.sum() / n
    sst = (y * y).sum() - y.sum() ** 2 / n
    det = a11 * a22 - a12 * a12
    beta1 = (b1 * a22 - b2 * a12) / det
    beta2 = (b2 * a11 - b1 * a12) / det
    return (beta1 * b1 + beta2 * b2) / sst


def test_permutation_importance_matches_numpy(spark):
    res = (
        _Q["ml_permutation_importance"](spark, SF_DIR)
        .toPandas()
        .set_index("model")
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet").sort_values("doc_id")
    x1 = docs["text"].str.split(" ").str.len().to_numpy().astype(float)
    x2 = (docs["doc_id"] % 7).to_numpy().astype(float)
    y = docs["n_chars"].to_numpy().astype(float)
    h = (docs["doc_id"].to_numpy() * 2654435761) % 4294967296
    hash_order = np.lexsort((docs["doc_id"].to_numpy(), h))
    x1p, x2p = x1[hash_order], x2[hash_order]
    r2_base = _ols2_r2(x1, x2, y)
    r2_p1 = _ols2_r2(x1p, x2, y)
    r2_p2 = _ols2_r2(x1, x2p, y)
    assert res.loc["base", "r2"] == pytest.approx(r2_base, abs=1e-5)
    assert res.loc["permute_words", "r2"] == pytest.approx(r2_p1, abs=1e-5)
    assert res.loc["permute_noise", "r2"] == pytest.approx(r2_p2, abs=1e-5)
    assert res.loc["base", "importance"] == 0.0
    # word count genuinely determines document length
    assert res.loc["base", "r2"] > 0.8
    assert res.loc["permute_words", "importance"] > 0.5
    # the noise feature carries nothing: permuting it barely moves R2
    assert abs(res.loc["permute_noise", "importance"]) < 0.05


def test_kfold_cv_matches_numpy(spark):
    res = _Q["ml_kfold_cv"](spark, SF_DIR).toPandas().set_index("fold")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    fold = (
        (li["l_orderkey"] * 2654435761 + li["l_linenumber"] * 97)
        % 4294967296
        % 5
    ).to_numpy()
    x = li["l_quantity"].to_numpy()
    y = li["l_extendedprice"].to_numpy()
    assert len(res) == 5
    for k in range(5):
        tr, te = fold != k, fold == k
        n = tr.sum()
        sx, sy = x[tr].sum(), y[tr].sum()
        sxx, sxy = (x[tr] * x[tr]).sum(), (x[tr] * y[tr]).sum()
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        pred = slope * x[te] + intercept
        rmse = math.sqrt(((y[te] - pred) ** 2).mean())
        row = res.loc[k]
        assert row["n_test"] == te.sum()
        assert row["slope"] == pytest.approx(slope, abs=1e-3)
        assert row["intercept"] == pytest.approx(intercept, rel=1e-3)
        assert row["test_rmse"] == pytest.approx(rmse, rel=1e-3)
    # hash folds are balanced within a few percent
    assert res["n_test"].max() / res["n_test"].min() < 1.2
    # quantity doesn't predict price in this fixture: held-out RMSE must sit
    # near the raw std of price for every fold (the CV detects the non-model)
    assert (res["test_rmse"] / y.std()).between(0.9, 1.1).all()
