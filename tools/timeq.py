"""Single-query steady-state timer — the measurement protocol of record.

Round-5 verdict: committed per-query claims must be reproducible, and
driver-run numbers were shown to inflate up to 1.4x under machine
contention. This tool IS the protocol: one shared session (startup
amortized), one warmup run (codegen/JIT), then best-of-N (default 3)
steady-state through the noop sink — identical to bench.py's inner loop,
runnable for any subset of queries so a perf claim can be re-measured in
isolation on a quiet machine. Numbers quoted in commits/docs come from
this tool's output pasted verbatim.

Usage:
    python -m tools.timeq fn_trigram_similarity graph_hits_bipartite
    python -m tools.timeq --reps 5 --sf /root/testdata/sf0.1 <names...>
"""

from __future__ import annotations

import argparse
import time

from hive_processor_spark import get_spark, queries


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    spark = get_spark(app_name="timeq", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    for name in args.names:
        run(name)  # warmup
        times = [run(name) for _ in range(args.reps)]
        print(
            f"{name}: best={min(times):.3f}s "
            f"all=[{', '.join(f'{t:.3f}' for t in times)}] sf={args.sf}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
