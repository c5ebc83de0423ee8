"""Semantic invariants for wave-130 (decision curve analysis)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_decision_curve_matches_python(spark):
    res = (
        _Q["ml_decision_curve"](spark, SF_DIR)
        .toPandas()
        .set_index("threshold_prob")
    )
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["event_type", "value"]
    )
    sq = np.floor(np.minimum(ev["value"] / 500.0, 1.0) * 1e6).astype("int64")
    y = (ev["event_type"] == "purchase").astype(int).to_numpy()
    n_all = len(y)
    m = int(y.sum())
    n = n_all - m
    for pt in (0.05, 0.10, 0.20, 0.30, 0.50):
        tq = math.floor(pt * 1e6)
        mask = sq >= tq
        tp = int(y[mask].sum())
        fp = int(mask.sum() - tp)
        odds = pt / (1 - pt)
        nb = (tp - fp * odds) / n_all
        nb_all = (m - n * odds) / n_all
        row = res.loc[pt]
        assert row["net_benefit_model"] == pytest.approx(nb, abs=1e-5)
        assert row["net_benefit_treat_all"] == pytest.approx(nb_all, abs=1e-5)
        assert row["model_wins"] == int(nb > max(nb_all, 0.0))
    # net benefit of the model is bounded by prevalence
    assert (res["net_benefit_model"] <= m / n_all + 1e-9).all()
