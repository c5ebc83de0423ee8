"""Processor facade: the reference's worker surface, Spark-native.

The reference's entire public API is four things (reference
``src/processor.ts``): a ``Processor`` owning pooled resources (``:36-55``),
``call(cmd, impl)`` registration (``:57-59``), a ``run()`` loop decoding job
packets and dispatching them with the data planes injected (``:61-89``), and
the ``async_serial`` / ``async_serial_ignore`` sequencing combinators
(``:135-161``). This module is that surface re-expressed for an in-process
Spark engine:

* the pooled resource is the ``SparkSession`` itself;
* a job packet ``{cmd, args}`` selects a registered query — the msgpack
  transport disappears because caller and engine share a process;
* the streaming analog of the nanomsg pull loop is a micro-batch dispatch:
  ``readStream → foreachBatch(dispatch)``, where each arriving row is a job
  (exercised by ``stream_dispatch``);
* sequencing combinators keep their fail-fast / ignore-failures semantics —
  Spark actions are synchronous in the driver, so "serialize observation of
  promises" degenerates to an ordered loop with the same two error modes.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from hive_processor_spark.engine import QueryFn, ensure_session_confs
from hive_processor_spark.engine import queries as _registered


class UnknownCommand(KeyError):
    """Raised on dispatch of an unregistered cmd (the reference logs and
    drops, reference ``src/processor.ts:85-87``; in-process we can do
    better than a silent drop for the fail-fast path)."""


class Processor:
    """Query dispatcher with the reference's registration-and-run shape.

    ``call`` mirrors ``Processor.call`` (last registration wins, reference
    ``src/processor.ts:57-59``); ``run_job`` mirrors one iteration of the
    ``run`` loop (``:61-89``) with the SparkSession taking the place of the
    injected ``(db, cache)`` pair; resource finalization (``done()``,
    ``:72-74``) is automatic — Spark frees per-job resources when the
    action completes, so the leak-if-handler-forgets failure mode of the
    reference cannot occur.
    """

    def __init__(self, spark: SparkSession, sf_dir: str) -> None:
        ensure_session_confs(spark)
        self.spark = spark
        self.sf_dir = sf_dir
        self._functions: dict[str, QueryFn] = dict(_registered())

    def call(self, cmd: str, impl: QueryFn) -> None:
        """Register (or override — last wins) a handler for ``cmd``."""
        self._functions[cmd] = impl

    def commands(self) -> list[str]:
        return sorted(self._functions)

    def run_job(self, cmd: str, *args: Any) -> DataFrame:
        """Dispatch one job packet ``{cmd, args}`` to its handler."""
        fn = self._functions.get(cmd)
        if fn is None:
            raise UnknownCommand(cmd)
        return fn(self.spark, self.sf_dir, *args)


def run_serial(
    jobs: Iterable[Callable[[], Any]],
) -> list[Any]:
    """Fail-fast ordered execution (``async_serial``, reference
    ``src/processor.ts:135-147``): results accumulate in order; the first
    raise aborts and propagates."""
    return [job() for job in jobs]


def run_serial_ignore(
    jobs: Iterable[Callable[[], Any]],
    on_error: Callable[[Exception], None] | None = None,
) -> list[Any]:
    """Ignore-failures ordered execution (``async_serial_ignore``,
    reference ``src/processor.ts:149-161``): failed jobs are skipped, the
    rest still run — the bench harness's per-query error mode."""
    out: list[Any] = []
    for job in jobs:
        try:
            out.append(job())
        except Exception as exc:  # noqa: BLE001 - semantics of the combinator
            if on_error is not None:
                on_error(exc)
    return out
