"""Capture .explain("formatted") for named queries into
$SPARK_GRAFT_PLAN_DIR (default plans/r13/).

Usage: python tools/plan_capture.py <suffix> name [name ...]
    suffix: "before" or "after" (file becomes <dir>/<name>_<suffix>.txt)

Also prints a one-line plan summary per query (Exchange count, join
strategies, Python-eval nodes) so before/after diffs are quick to eyeball.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.environ.get(
    "SPARK_GRAFT_PLAN_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
    ),
)


def summarize(plan: str) -> str:
    counts = {}
    for pat in (
        "Exchange",
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
        "BatchEvalPython",
        "ArrowEvalPython",
        "MapInArrow",
        "MapInPandas",
        "HashAggregate",
        "Window",
        "Sort ",
        "Scan parquet",
    ):
        n = len(re.findall(re.escape(pat), plan))
        if n:
            counts[pat.strip()] = n
    return ", ".join(f"{k}={v}" for k, v in counts.items())


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)

    import __spark_entry__ as entry_mod
    from nypd_arrest_etl_spark.session import get_spark

    spark = get_spark(app_name="plan-capture")
    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {summarize(plan)}  -> {path}", flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
