"""Semantic invariants for wave-136 (rank-based effect sizes)."""

from __future__ import annotations

import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_rank_effect_sizes_match_pandas_midranks(spark):
    res = _Q["stats_rank_effect_sizes"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["event_type", "value"]
    )
    ev = ev[ev.event_type.isin(["purchase", "view"])]
    ranks = ev["value"].rank(method="average")
    is_a = ev.event_type == "purchase"
    n1, n2 = int(is_a.sum()), int((~is_a).sum())
    r1 = float(ranks[is_a].sum())
    u = r1 - n1 * (n1 + 1) / 2.0
    a_hat = u / (n1 * n2)
    delta = 2.0 * a_hat - 1.0
    assert res["n_a"] == n1 and res["n_b"] == n2
    assert res["u_stat"] == pytest.approx(u, abs=0.51)
    assert res["vd_a"] == pytest.approx(a_hat, abs=1e-5)
    assert res["cliffs_delta"] == pytest.approx(delta, abs=2e-5)
    # identities: delta = 2A-1, both bounded
    assert -1.0 <= res["cliffs_delta"] <= 1.0
    assert 0.0 <= res["vd_a"] <= 1.0
    ad = abs(res["cliffs_delta"])
    want = (
        "negligible"
        if ad < 0.147
        else "small" if ad < 0.33 else "medium" if ad < 0.474 else "large"
    )
    assert res["magnitude"] == want
