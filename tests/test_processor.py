"""Processor facade parity (reference src/processor.ts:29-89,135-161)."""

from __future__ import annotations

import pytest

from hive_processor_spark.processor import (
    Processor,
    UnknownCommand,
    run_serial,
    run_serial_ignore,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def proc(spark):
    return Processor(spark, SF_SMALL)


def test_registry_prepopulated_from_engine(proc):
    assert "agg_groupby" in proc.commands()
    assert len(proc.commands()) >= 120


def test_dispatch_runs_registered_query(proc):
    assert proc.run_job("agg_groupby").count() == 6


def test_last_registration_wins(proc, spark):
    # reference src/processor.ts:57-59 — Map.set overwrites
    proc.call("probe", lambda s, d: s.range(3).toDF("n"))
    proc.call("probe", lambda s, d: s.range(5).toDF("n"))
    assert proc.run_job("probe").count() == 5


def test_unknown_cmd_raises(proc):
    # reference logs-and-drops (src/processor.ts:85-87); in-process we raise
    with pytest.raises(UnknownCommand):
        proc.run_job("no_such_cmd")


def test_run_serial_fail_fast():
    ran = []

    def ok(i):
        return lambda: ran.append(i) or i

    def boom():
        raise ValueError("x")

    with pytest.raises(ValueError):
        run_serial([ok(1), ok(2), boom, ok(3)])
    assert ran == [1, 2]  # aborted at the failure, in order


def test_run_serial_ignore_skips_failures():
    errs = []

    def boom():
        raise ValueError("x")

    out = run_serial_ignore(
        [lambda: 1, boom, lambda: 3], on_error=errs.append
    )
    assert out == [1, 3]
    assert len(errs) == 1
