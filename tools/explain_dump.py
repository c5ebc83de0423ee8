"""Dump .explain('formatted') for named queries to plans/<dir>/<name>_<tag>.txt.

Usage:
    python -m tools.explain_dump --tag before --dir plans/r11 <names...>
"""

from __future__ import annotations

import argparse
import os

from hive_processor_spark import get_spark, queries


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--dir", default="plans/r11")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    spark = get_spark(app_name="explain-dump", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    os.makedirs(args.dir, exist_ok=True)
    for name in args.names:
        df = qs[name](spark, args.sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
