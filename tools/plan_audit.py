"""Mechanical anti-pattern audit over EVERY registered query's
physical plan — the sweep a reviewer otherwise does by hand each
round, as one command.

Hard failures (exit 1):
  * ``CartesianProduct`` — an unbounded cross join anywhere.
  * ``BatchEvalPython`` — a row-at-a-time (non-Arrow) Python UDF in
    the plan. Arrow-batched crossings (``ArrowEvalPython``,
    ``MapInPandas``, ``FlatMapGroupsInPandas[WithState]``) are the
    sanctioned Python boundary and are reported, not failed.

Reported for review (not failed — each legitimate occurrence is a
bounded frame by design, see SCALE.md):
  * ``Exchange SinglePartition`` count per query — legitimate only on
    bounded aggregates (per-pid offsets, |terms|-row df, final ≤k-row
    rank windows).
  * total Exchange count and WholeStageCodegen span count.

Usage: python tools/plan_audit.py [--sf DIR] [query ...]
Prints one JSON line; exit 0 iff no hard failure.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from irio2024_mapreduce_spark import registry
from irio2024_mapreduce_spark.session import get_spark

HARD = ("CartesianProduct", "BatchEvalPython")
ARROW = (
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapGroupsInPandasWithState",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    names = args.names or list(qs)

    report: dict[str, dict] = {}
    failures: list[str] = []
    for name in names:
        try:
            plan = (
                qs[name](spark, args.sf)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # noqa: BLE001 — audit must report, not die
            report[name] = {"error": str(e)[:200]}
            failures.append(name)
            continue
        entry = {
            "exchanges": plan.count("Exchange"),
            "single_partition": plan.count("SinglePartition"),
            "wscg_spans": plan.count("WholeStageCodegen"),
            "arrow_python": sum(plan.count(a) for a in ARROW),
        }
        hard = [h for h in HARD if h in plan]
        if hard:
            entry["hard_failures"] = hard
            failures.append(name)
        report[name] = entry

    print(
        json.dumps(
            {
                "sf": args.sf,
                "queries_audited": len(names),
                "hard_failures": failures,
                "report": report,
            }
        )
    )
    if failures:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
