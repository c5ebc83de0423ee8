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

import sys as _sys

from hive_processor_spark.engine import (  # noqa: F401
    get_spark,
    oracles,
    queries,
    register,
)


def _load_all() -> None:
    """Import every query module so registration decorators run."""
    from hive_processor_spark import functions, operators, sources, streaming  # noqa: F401
    from hive_processor_spark.functions import scalar, vector  # noqa: F401
    from hive_processor_spark.operators import (  # noqa: F401
        aggregates,
        cache_plane,
        clustering,
        corpus,
        dedup,
        events,
        experiments,
        filters,
        fuzzy,
        graphs,
        joins,
        market,
        metrics,
        multimodal,
        profiling,
        regression,
        retrieval,
        setops,
        similarity,
        sorts_limits,
        textops,
        tpch,
        udfs,
        windows,
    )
    from hive_processor_spark.sources import pysource, roundtrip, scans  # noqa: F401
    from hive_processor_spark.streaming import eventtime, smoke  # noqa: F401


# Python workers (spawned by the JVM to run UDF/applyInPandas kernels) import
# this package only to reach pure helpers like functions.seqrec; loading the
# full operator registry there costs ~0.9 s per fresh worker for zero benefit
# (the registry is consumed exclusively driver-side). `pyspark.worker` (or the
# daemon module) is only ever imported inside a worker process, never on the
# driver, so its presence is a reliable executor-side marker.
if not ("pyspark.worker" in _sys.modules or "pyspark.daemon" in _sys.modules):
    _load_all()
