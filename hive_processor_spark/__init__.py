"""hive_processor_spark — a PySpark-native analytics engine.

A ground-up rebuild of the capabilities of the reference
``titan/hive-processor`` (an RPC worker that delegates all query processing
to PostgreSQL/Redis — see ``/root/reference/src/processor.ts``), re-centered
*inside* the engine: queries run as Spark DataFrame/SQL plans over Parquet,
the KV/cache plane is Spark caching + broadcast, and the handler registry
(``Processor.call``/``run``, reference ``src/processor.ts:57-89``) becomes a
declarative query registry (:mod:`hive_processor_spark.engine`).

Layout:

- ``engine``     — SparkSession factory, session-conf discipline, query registry
- ``sources``    — table loading (ns-timestamp handling), CSV/JSON/Parquet round-trips
- ``operators``  — joins (incl. as-of/range), aggregates, windows, set ops,
                   sorts/limits, dedup, similarity/ANN, text ops, cache plane
- ``functions``  — scalar function families + higher-order vector math
- ``streaming``  — event-time windows (batch-checkable) + true streaming smokes
- ``plans``      — physical-plan assertion helpers (explain-based)

Importing this package populates the query registry; ``__spark_entry__.py``
at the repo root re-exports it for the verification driver.

**Executor-side import discipline**: a handful of Arrow-batched kernels
(``operators/events.py`` Holt–Winters/DTW/theta) import
:mod:`hive_processor_spark.functions.seqrec` *inside* the kernel so the
operator and the property tests share one definition. On a fresh Python
worker that import executes this ``__init__`` — which must therefore NOT
pull in the whole 30-module operator registry (measured 0.91 s per worker,
doubling those kernels' wall time in isolated runs). ``_load_all()`` runs
only on the driver: registration is a driver concern (the registry dicts
live in the driver process; workers only ever need the pure-Python helpers
they explicitly import).
"""

import os as _os
import sys as _sys

from hive_processor_spark.engine import (  # noqa: F401
    get_spark,
    oracles,
    queries,
    register,
)


def _in_python_worker() -> bool:
    """True when this import runs inside a Spark Python worker process.

    Two independent signals (round-10, ADVICE r9): ``pyspark.worker`` /
    ``pyspark.daemon`` in ``sys.modules`` covers the default POSIX
    daemon launcher (the daemon imports those modules before any user
    import), and the ``PYTHON_WORKER_FACTORY_*`` environment variables —
    set only by the JVM's PythonWorkerFactory when launching the worker
    (``pyspark/worker.py`` reads them at startup) — cover
    ``spark.python.use.daemon=false``, where the worker runs
    ``pyspark.worker`` as ``__main__`` and the module-name check alone
    would silently reinstate the ~0.9 s per-worker registry load. Either
    signal misfiring toward "driver" is self-repairing: the registry
    also lazy-loads on the first :func:`queries`/:func:`oracles` call.
    """
    if "pyspark.worker" in _sys.modules or "pyspark.daemon" in _sys.modules:
        return True
    return (
        "PYTHON_WORKER_FACTORY_SECRET" in _os.environ
        or "PYTHON_WORKER_FACTORY_PORT" in _os.environ
        or "PYTHON_WORKER_FACTORY_SOCK_PATH" in _os.environ
    )


from hive_processor_spark.engine import _load_all  # noqa: F401  (back-compat)


# Python workers (spawned by the JVM to run UDF/applyInPandas kernels) import
# this package only to reach pure helpers like functions.seqrec; loading the
# full operator registry there costs ~0.9 s per fresh worker for zero benefit
# (the registry is consumed exclusively driver-side). See _in_python_worker
# for the detection signals; a false "worker" verdict on the driver is
# repaired by the lazy load inside engine.queries()/oracles().
if not _in_python_worker():
    _load_all()
