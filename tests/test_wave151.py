"""Semantic invariants for wave-151 (Davies-Bouldin index)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_davies_bouldin_matches_numpy(spark):
    res = _Q["embed_davies_bouldin"](spark, SF_DIR).toPandas()
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    X = np.stack(emb.embedding.values).astype(np.float64)
    y = emb.label.values
    labels = np.sort(np.unique(y))
    cents = {
        l: X[y == l].astype(np.float64).mean(axis=0) for l in labels
    }
    sigma = {
        l: float(
            np.linalg.norm(X[y == l] - cents[l], axis=1).mean()
        )
        for l in labels
    }
    comps = {}
    for li in labels:
        rs = [
            (sigma[li] + sigma[lj]) / np.linalg.norm(cents[li] - cents[lj])
            for lj in labels
            if lj != li
        ]
        comps[li] = max(rs)
    dbi = float(np.mean(list(comps.values())))
    assert list(res.label) == list(labels)
    for _, row in res.iterrows():
        assert row.n == int((y == row.label).sum())
        assert row.sigma == pytest.approx(sigma[row.label], abs=2e-3)
        assert row.db_component == pytest.approx(comps[row.label], rel=5e-3)
        assert row.db_index == pytest.approx(dbi, rel=5e-3)
    # DB index is the mean of the per-cluster components
    assert res.db_index.iloc[0] == pytest.approx(
        res.db_component.mean(), abs=2e-3
    )
