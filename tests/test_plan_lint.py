"""Registry-wide plan lint as a test: no CartesianProduct, no
row-at-a-time Python UDFs, no cache scans outside the reviewed
allowlists (tools/plan_lint.py). Caught a real CartesianProduct in
ts_double_smoothing on introduction; runs per-round so the next one
can't ship."""

from __future__ import annotations

import pytest

from tools.plan_lint import lint


@pytest.mark.slow
def test_registry_plans_clean(spark):
    bad = lint()
    assert not bad, f"plan lint flagged: {bad}"
