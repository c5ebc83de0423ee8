"""Semantic invariants for wave-116 (two-proportion power table) —
independent python re-derivation."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_proportion_power_matches_python(spark):
    res = (
        _Q["ab_proportion_power"](spark, SF_DIR)
        .toPandas()
        .set_index("rel_lift")
    )
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["user_id", "event_type"]
    )
    conv = (
        (ev["event_type"] == "purchase")
        .groupby(ev["user_id"])
        .max()
        .astype(int)
    )
    n_users = len(conv)
    p1 = conv.mean()
    za, zb = 1.959964, 0.841621
    for lift in (0.05, 0.10, 0.20):
        p2 = min(p1 * (1 + lift), 0.999)
        pbar = (p1 + p2) / 2
        n = math.ceil(
            (
                za * math.sqrt(2 * pbar * (1 - pbar))
                + zb * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))
            )
            ** 2
            / (p2 - p1) ** 2
        )
        mde = (za + zb) * math.sqrt(2 * p1 * (1 - p1) / (n_users / 2)) / p1
        row = res.loc[lift]
        assert row["base_rate"] == pytest.approx(p1, abs=1e-6)
        assert row["target_rate"] == pytest.approx(p2, abs=1e-6)
        assert row["n_per_arm"] == n
        assert row["mde_rel_at_current_n"] == pytest.approx(mde, abs=1e-5)
    # larger lifts need smaller samples
    ns = res.sort_index()["n_per_arm"].to_numpy()
    assert (ns[:-1] >= ns[1:]).all()
