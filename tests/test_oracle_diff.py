"""Primary correctness gate: every registered query vs its DuckDB oracle
at sf0.01 — the same differential the driver runs (SURVEY.md §5.2.1)."""

from __future__ import annotations

import pytest

from hive_processor_spark import oracles, queries
from tests.conftest import SF_DIR
from tools.check import compare

_QUERIES = queries()
_ORACLES = oracles()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, duck):
    sdf = _QUERIES[name](spark, SF_DIR).toPandas()
    if name not in _ORACLES:
        # Tier R: rows-only — must run and produce a stable, non-degenerate
        # schema; semantic checks live in the dedicated test modules.
        assert sdf.shape[1] >= 1
        return
    odf = duck.execute(_ORACLES[name]).df()
    problems = compare(sdf, odf)
    assert not problems, f"{name}: {problems[:5]}"


def test_every_oracle_has_a_query():
    assert set(_ORACLES) <= set(_QUERIES)


def test_inventory_size():
    # SURVEY §2.2 promises 102 data-plane operators; we ship those plus the
    # training-pipeline extensions. Guard against accidental de-registration.
    assert len(_QUERIES) >= 110
    assert len(_ORACLES) >= 100
