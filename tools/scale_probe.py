"""10× scale probe: key-shifted fixture replication + steady-state timing.

Replicates the sf0.1 fixtures K× with shifted keys (so join fan-outs and
group cardinalities grow faithfully rather than colliding into the same
keys), then times queries steady-state (noop sink, second run) on both the
base and replicated data. Results feed SCALING.md.

Usage:
    python -m tools.scale_probe [--k 10] [--sf /root/testdata/sf0.1] q1 q2 ...
"""

from __future__ import annotations

import argparse
import os
import shutil
import time

from pyspark.sql import functions as F

from hive_processor_spark import get_spark, queries

SCRATCH = "/tmp/hive_spark_scale"

#: Per-table key columns to shift per replica (everything else is copied
#: verbatim — dims like region/nation/part/supplier/customer stay fixed so
#: fact→dim joins keep their real shape).
_SHIFTS = {
    "lineitem": {"l_orderkey": 10_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 0},
    "events": {"event_id": 100_000_000, "user_id": 10_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
_COPY = ("region", "nation", "customer", "supplier", "part")


def build(spark, sf_dir: str, k: int) -> str:
    out = os.path.join(SCRATCH, f"x{k}")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for t in _COPY:
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{out}/{t}.parquet")
    for t, shifts in _SHIFTS.items():
        base = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        parts = []
        for i in range(k):
            df = base
            for col, step in shifts.items():
                if step:
                    df = df.withColumn(
                        col, (F.col(col) + F.lit(i * step)).cast(base.schema[col].dataType)
                    )
            parts.append(df)
        rep = parts[0]
        for p in parts[1:]:
            rep = rep.unionByName(p)
        # single file per table keeps the layout comparable to the fixtures
        rep.coalesce(8).write.mode("overwrite").parquet(f"{out}/{t}__dir")
        # flatten to <table>.parquet path shape expected by load_table: keep
        # the directory but rename — Spark reads directories fine.
        os.rename(f"{out}/{t}__dir", f"{out}/{t}.parquet")
    open(os.path.join(out, "_SUCCESS"), "w").close()
    return out


def steady(qfn, spark, sf_dir: str) -> float:
    qfn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    t0 = time.perf_counter()
    qfn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--append",
        metavar="LABEL",
        help="append the probe rows to SCALING.md under a '## LABEL' "
        "section (VERDICT r10 item 8: probe numbers should come from "
        "this tool, not hand-run snippets)",
    )
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    big = build(spark, args.sf, args.k)
    qs = queries()

    from hive_processor_spark.operators import dedup

    failures = 0
    rows = []
    for name in args.names:
        try:
            dedup.LAST_CC_ROUNDS = None
            t1 = steady(qs[name], spark, args.sf)
            r1 = dedup.LAST_CC_ROUNDS
            dedup.LAST_CC_ROUNDS = None
            tk = steady(qs[name], spark, big)
            rk = dedup.LAST_CC_ROUNDS
        except Exception as exc:  # a probe failure IS the finding — record it
            print(f"{name}: FAILED at {args.k}x — {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:200]}", flush=True)
            failures += 1
            continue
        growth = round(tk / t1, 1) if t1 else float("nan")
        iters = f" rounds={r1}->{rk}" if rk is not None else ""
        rows.append((name, t1, tk, growth, iters.strip()))
        print(
            f"{name}: 1x={t1}s {args.k}x={tk}s growth={growth}x{iters}",
            flush=True,
        )
    if args.append and rows:
        path = os.path.join(os.path.dirname(__file__), "..", "SCALING.md")
        with open(path, "a") as f:
            f.write(
                f"\n## {args.append} ({args.k}× key-shifted replicas of"
                f" {args.sf}, `tools/scale_probe.py`)\n\n"
                "| query | 1× steady | "
                f"{args.k}× steady | growth |\n|---|---|---|---|\n"
            )
            for name, t1, tk, growth, iters in rows:
                note = f" ({iters})" if iters else ""
                f.write(f"| {name} | {t1} s | {tk} s | {growth}×{note} |\n")
        print(f"appended {len(rows)} rows to SCALING.md", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
