"""Same-window A/B for the `_ranked_pairs` lane gate (r11 verdict item 1).

Builds key-shifted corpus replicas of the embeddings fixture (queries stay
vec_id < 50; replicas only enlarge the corpus side), then times the HOF
lane vs the numpy-kernel lane INTERLEAVED inside one Spark session through
the noop sink, at each replica factor. The crossover locates
``_KERNEL_MIN_PAIRS``.

Usage:
    python -m tools.ab_ranked_pairs --reps 3 --factors 1 4 10
"""

from __future__ import annotations

import argparse
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from hive_processor_spark import get_spark
from hive_processor_spark.operators.retrieval import (
    _Q_MAX,
    _ranked_pairs_hof,
    _ranked_pairs_kernel,
)
from hive_processor_spark.sources.tables import load_table

SRC = "/root/testdata/sf0.1/embeddings.parquet"


def build_replica(factor: int) -> str:
    out_dir = f"/tmp/r12_ab_emb_x{factor}"
    path = f"{out_dir}/embeddings.parquet"
    if os.path.exists(path):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(SRC)
    n = t.num_rows
    parts = [t]
    for i in range(1, factor):
        shifted = t.set_column(
            t.schema.get_field_index("vec_id"),
            "vec_id",
            pa.compute.add(t.column("vec_id"), i * n),
        )
        parts.append(shifted)
    pq.write_table(pa.concat_tables(parts), path)
    return out_dir


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--factors", type=int, nargs="+", default=[1, 4, 10])
    args = ap.parse_args()
    spark = get_spark(app_name="ab-ranked-pairs", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    def run(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for factor in args.factors:
        sf_dir = build_replica(factor)
        emb = load_table(spark, sf_dir, "embeddings")
        n_corpus = emb.count() - _Q_MAX
        lanes = {
            "hof": lambda: _ranked_pairs_hof(spark, emb),
            "kernel": lambda: _ranked_pairs_kernel(spark, emb),
        }
        for name, mk in lanes.items():
            run(mk())  # warmup
        times: dict[str, list[float]] = {k: [] for k in lanes}
        for _ in range(args.reps):  # interleaved
            for name, mk in lanes.items():
                times[name].append(run(mk()))
        mass = _Q_MAX * n_corpus
        for name in lanes:
            ts = times[name]
            print(
                f"x{factor} pairs={mass} {name}: best={min(ts):.3f}s "
                f"all=[{', '.join(f'{t:.3f}' for t in ts)}]"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
