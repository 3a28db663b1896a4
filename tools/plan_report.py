"""Plan audit over every declared query: one row per query with the
physical-plan features that matter at 100 TB — shuffle (Exchange)
count, join strategies, scan count, pushed-filter presence, and
red flags (CartesianProduct / BroadcastNestedLoopJoin / row-at-a-time
PythonUDF in the hot path).

Usage: python tools/plan_report.py [sf_dir]

This is the ".explain and iterate" loop made repeatable: run it after
adding a query and eyeball the row before trusting the plan.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLAGS = ("CartesianProduct", "BroadcastNestedLoopJoin")

# Brute-force similarity IS a deliberate broadcast nested loop: tiny
# query set broadcast, one linear corpus scan, no shuffle — that's the
# exact-baseline contract (operators/similarity.py). Everywhere else a
# BNLJ is a bug.
EXPECTED_BNLJ = {"similarity_topk", "similarity_quantized"}


def audit(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "scans": plan.count("FileScan") + plan.count("Scan parquet"),
        "pushed": "PushedFilters: [" in plan and "PushedFilters: []" not in plan,
        "python": ("ArrowEvalPython" in plan)
        or ("FlatMapGroupsInPandas" in plan)
        or ("MapInPandas" in plan)
        or ("BatchEvalPython" in plan),
        "flags": [f for f in FLAGS if f in plan],
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as entrymod
    from nypd_arrest_etl_spark.session import get_spark

    spark = get_spark(app_name="plan-report", shuffle_partitions=8)
    bad = 0
    hdr = f"{'query':34} {'xchg':>4} {'bhj':>3} {'smj':>3} {'shj':>3} {'scan':>4}  push  py  flags"
    print(hdr)
    print("-" * len(hdr))
    for name, fn in entrymod.queries().items():
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # streaming-only or env-gated entries
            print(f"{name:34} (not plannable here: {type(e).__name__})")
            continue
        a = audit(plan)
        unexpected = [
            f
            for f in a["flags"]
            if not (f == "BroadcastNestedLoopJoin" and name in EXPECTED_BNLJ)
        ]
        flag = ",".join(
            f + ("(by design)" if f not in unexpected else "") for f in a["flags"]
        )
        if unexpected:
            bad += 1
        print(
            f"{name:34} {a['exchanges']:>4} {a['bhj']:>3} {a['smj']:>3} "
            f"{a['shj']:>3} {a['scans']:>4}  {'y' if a['pushed'] else '-':>4}"
            f"  {'y' if a['python'] else '-':>2}  {flag}"
        )
    print(f"\n{bad} queries with unexpected red-flag operators")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
