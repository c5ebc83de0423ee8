"""Measured audit of unpartitioned (global) windows across the registry.

Round-5 verdict #5: a ``Window`` with an empty partition spec moves its
whole input through ONE partition — the defect class behind
``profile_iqr_outliers`` (round 4) and ``events_conversion_lag``
(round 5). Most global windows in this repo are legitimate: they rank a
BOUNDED frame (a calendar series, a dimension grid, a distinct-value
histogram), not corpus rows. Nothing in the plan *text* distinguishes the
two — so this tool measures instead of trusting review prose:

For every oracle-backed query whose plan contains a global window, the
query is EXECUTED at two scale factors and the actual row count entering
each global WindowExec is read from the executed plan's SQL metrics
(shuffle records written / numOutputRows of the first cardinality-bearing
descendant — Sort/Window preserve cardinality, so that is exactly the
window's input). Verdict per query:

- ``bounded``  — input rows grow ≤ GROWTH_MAX across a 10x data growth,
  or stay under ABS_SMALL rows at the larger SF. The frame is pinned by
  a dimension/calendar/limit, not by the corpus.
- ``saturating`` — rows grow with SF but the window runs over a
  distinct-VALUE histogram (grows until the value domain saturates;
  the house exact-order-statistic pattern, e.g. ``stats_mad_outliers``).
  These are listed in SATURATING_OK with the value domain named —
  a reviewed judgment the measurement alone cannot make.
- ``UNBOUNDED`` — input grows ~linearly and is not a reviewed histogram:
  a real scale defect. The audit exits non-zero.

Output: WINDOW_AUDIT.json at the repo root — consumed by
tools/plan_lint.py as the allowlist evidence for its
UnboundedGlobalWindow rule. Regenerate per round (stale entries for
renamed/changed queries simply stop matching and the lint flags them).

Usage:
    python -m tools.window_audit              # audit all flagged queries
    python -m tools.window_audit name ...     # audit specific queries
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from hive_processor_spark import get_spark, oracles, queries
from hive_processor_spark.plans import plan_string
from tools.plan_lint import unbounded_global_windows

SF_A = "/root/testdata/sf0.01"
SF_B = "/root/testdata/sf0.1"
#: input-rows growth ratio across the 10x SF step that still counts as
#: bounded (dimension/calendar frames measure ~1x; sqrt-ish frames pass)
GROWTH_MAX = 4.0
#: frames this small never dominate a stage regardless of growth shape
ABS_SMALL = 1000

#: Reviewed distinct-value-histogram windows: input grows with SF at
#: fixture scale but saturates at the (finite) value domain — the house
#: exact order-statistic pattern. Keyed by query, value names the domain.
SATURATING_OK: dict[str, str] = {}

_ROW_METRICS = ("numOutputRows", "shuffleRecordsWritten")


def _children(node):
    name = node.getClass().getSimpleName()
    if name.endswith("QueryStageExec"):
        return [node.plan()]
    if name == "ReusedExchangeExec":
        return [node.child()]
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def _metric(node, key):
    mets = node.metrics()
    it = mets.iterator()
    while it.hasNext():
        kv = it.next()
        if kv._1() == key:
            return kv._2().value()
    return None


def _input_rows(node) -> int:
    """Rows flowing out of the first cardinality-bearing descendants —
    Sort/Window/Project preserve cardinality, so summed across branches
    this is the row count entering ``node``."""
    for key in _ROW_METRICS:
        v = _metric(node, key)
        if v is not None:
            return int(v)
    return sum(_input_rows(c) for c in _children(node))


def _global_window_inputs(final_plan) -> list[int]:
    out: list[int] = []

    def walk(node):
        name = node.getClass().getSimpleName()
        if name.startswith("Window"):
            try:
                # _osb-ordered windows are the orderstat helper's bucket
                # frame — bounded at n_buckets+1 by construction
                if node.partitionSpec().size() == 0 and "_osb" not in str(
                    node.orderSpec()
                ):
                    out.append(
                        sum(_input_rows(c) for c in _children(node))
                    )
            except Exception:
                pass
        for c in _children(node):
            walk(c)

    walk(final_plan)
    return out


def _measure(spark, fn, sf_dir: str) -> int:
    """Max global-window input row count for one query at one SF."""
    df = fn(spark, sf_dir)
    qe = df._jdf.queryExecution()
    qe.executedPlan().execute().count()
    plan = qe.executedPlan()
    if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        plan = plan.executedPlan()
    inputs = _global_window_inputs(plan)
    return max(inputs) if inputs else 0


def audit(names: list[str] | None = None) -> dict[str, dict]:
    qs, ors = queries(), oracles()
    spark = get_spark(app_name="window-audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    if names is None:
        names = []
        for name in sorted(ors):
            try:
                plan = plan_string(qs[name](spark, "/root/testdata/sf0.001"))
            except Exception:
                continue
            if unbounded_global_windows(plan):
                names.append(name)
    report: dict[str, dict] = {}
    for name in names:
        try:
            rows_a = _measure(spark, qs[name], SF_A)
            rows_b = _measure(spark, qs[name], SF_B)
        except Exception as e:
            report[name] = {"verdict": "error", "err": repr(e)[:200]}
            continue
        ratio = rows_b / max(rows_a, 1)
        if rows_b <= ABS_SMALL or ratio <= GROWTH_MAX:
            verdict = "bounded"
        elif name in SATURATING_OK:
            verdict = "saturating"
        else:
            verdict = "UNBOUNDED"
        report[name] = {
            "rows_sf0.01": rows_a,
            "rows_sf0.1": rows_b,
            "growth_10x": round(ratio, 2),
            "verdict": verdict,
            **(
                {"domain": SATURATING_OK[name]}
                if name in SATURATING_OK
                else {}
            ),
        }
        print(f"{verdict:>10} {name}: {rows_a} -> {rows_b} ({ratio:.2f}x)")
    return report


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(__file__), "..", "WINDOW_AUDIT.json"),
    )
    args = ap.parse_args()
    report = audit(args.names or None)
    # Merge into the existing artifact rather than overwriting: a partial
    # audit run (e.g. only the newest wave's queries) must not delete the
    # measured allowlist entries for every previously-audited query, which
    # tools/plan_lint.py depends on.
    merged = {}
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                merged = json.load(f)
        except (OSError, ValueError):
            merged = {}
    merged.update(report)
    with open(args.out, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    bad = [n for n, r in report.items() if r["verdict"] == "UNBOUNDED"]
    err = [n for n, r in report.items() if r["verdict"] == "error"]
    print(
        f"== {len(report)} audited: {len(bad)} unbounded, {len(err)} error =="
    )
    for n in bad:
        print(f"UNBOUNDED {n}: {report[n]}")
    return 1 if bad or err else 0


if __name__ == "__main__":
    sys.exit(main())
