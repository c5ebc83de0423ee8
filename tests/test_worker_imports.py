"""Executor-side import discipline lint (round-9, VERDICT r8 item 1).

The round-8 seqrec refactor placed ``from hive_processor_spark...`` imports
inside Arrow kernels (``applyInPandas`` bodies). On a fresh Python worker
that import executes ``hive_processor_spark/__init__``; before the round-9
guard, ``_load_all()`` there imported all 30 operator modules (0.91 s
measured per worker), doubling ``ts_holt_winters``'s isolated wall time.

Two permanent protections, both enforced here:

1. ``_load_all()`` is skipped whenever the process looks like a PySpark
   worker (``pyspark.worker``/``pyspark.daemon`` in ``sys.modules``).
2. Any package import nested deep enough to live inside a kernel body
   (indent >= 8 in an operator module) must target a WORKER-SAFE module —
   pure Python, no transitive pyspark.sql/pandas work at import time —
   so even the unguarded cost is microseconds.
"""

from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "hive_processor_spark"

#: Modules a kernel may import executor-side: pure-Python, import in <10 ms,
#: no DataFrame/SparkSession machinery at module scope.
WORKER_SAFE = {
    "hive_processor_spark.functions.seqrec",
}

_KERNEL_IMPORT = re.compile(
    r"^(?P<indent> {8,})from\s+(?P<mod>hive_processor_spark[.\w]*)\s+import"
)


def test_kernel_level_imports_are_worker_safe():
    offenders = []
    for py in PKG.rglob("*.py"):
        for ln, line in enumerate(py.read_text().splitlines(), 1):
            m = _KERNEL_IMPORT.match(line)
            if m and m.group("mod") not in WORKER_SAFE:
                offenders.append(f"{py.relative_to(PKG.parent)}:{ln} {m.group('mod')}")
    assert not offenders, (
        "kernel-level (indent>=8) package imports must be WORKER_SAFE "
        "(pure Python, no registry side effects):\n" + "\n".join(offenders)
    )


def test_worker_safe_modules_are_actually_light():
    """Each allowlisted module must import without pulling in the operator
    registry, pandas, or pyspark.sql — checked in a clean subprocess."""
    for mod in sorted(WORKER_SAFE):
        code = (
            "import sys\n"
            f"import {mod}\n"
            "bad = [m for m in ('hive_processor_spark.operators.events',"
            " 'hive_processor_spark.operators.metrics', 'pandas')"
            " if m in sys.modules]\n"
            "assert not bad, bad\n"
        )
        # The parent package __init__ DOES run on import; simulate the worker
        # marker so the guard path (not luck) is what keeps it light.
        pre = "import sys, types\nsys.modules['pyspark.worker'] = types.ModuleType('pyspark.worker')\n"
        res = subprocess.run(
            [sys.executable, "-c", pre + code], capture_output=True, text=True
        )
        assert res.returncode == 0, f"{mod} heavy under worker marker:\n{res.stderr}"


def test_load_all_skipped_under_worker_marker():
    # Import-time emptiness is the contract (queries()/oracles() now
    # lazy-REPAIR an empty registry on the driver — round-10, ADVICE r9 —
    # so the probe reads the raw dict, which a worker never touches).
    code = (
        "import sys, types\n"
        "sys.modules['pyspark.worker'] = types.ModuleType('pyspark.worker')\n"
        "import hive_processor_spark as h\n"
        "from hive_processor_spark.engine import _QUERIES\n"
        "assert len(_QUERIES) == 0, 'registry must stay empty on workers'\n"
        "assert 'hive_processor_spark.operators.events' not in sys.modules\n"
    )
    res = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    assert res.returncode == 0, res.stderr


def test_load_all_skipped_under_factory_env_marker():
    """spark.python.use.daemon=false launches pyspark.worker as __main__ —
    no pyspark.worker in sys.modules; the PYTHON_WORKER_FACTORY_* env vars
    (set only by the JVM's PythonWorkerFactory) are the second signal."""
    code = (
        "import os, sys\n"
        "os.environ['PYTHON_WORKER_FACTORY_SECRET'] = 'x'\n"
        "import hive_processor_spark as h\n"
        "from hive_processor_spark.engine import _QUERIES\n"
        "assert len(_QUERIES) == 0, 'registry must stay empty on workers'\n"
        "assert 'hive_processor_spark.operators.events' not in sys.modules\n"
    )
    res = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    assert res.returncode == 0, res.stderr


def test_registry_read_repairs_misclassified_driver():
    """A driver misread as a worker still serves the full registry on the
    first queries() call — the explicit driver-path repair."""
    code = (
        "import os\n"
        "os.environ['PYTHON_WORKER_FACTORY_SECRET'] = 'x'\n"
        "import hive_processor_spark as h\n"
        "assert len(h.queries()) > 800, len(h.queries())\n"
    )
    res = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    assert res.returncode == 0, res.stderr


def test_load_all_runs_on_driver():
    code = (
        "import hive_processor_spark as h\n"
        "assert len(h.queries()) > 800, len(h.queries())\n"
    )
    res = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
