"""Same-session A/B of the two queries the r9 verdict flagged
(ccnet_buckets +50%, sole_returning_supplier +67% raw vs r8) —
VERDICT r9 task 2.

Evidence layers, strongest first:
1. `git diff <r8-commit> HEAD -- operators/text.py plans/queries.py`
   is EMPTY (checked in BENCH_AB.md): the two queries run byte-
   identical code, so a true r8->now regression is impossible.
2. This tool measures both queries N alternating passes in ONE
   session (alternation cancels slow-session drift), alongside the
   pinned CPU anchor, and fingerprints each physical plan (formatted
   explain with object ids stripped) so shape identity is mechanical,
   not narrative.
3. The per-pass spread bounds how much single-run noise the r9
   numbers could carry (r9's flagged ratios sit inside the spread x
   the session's anchor ratio, or they don't — that's the verdict).

Usage: python tools/bench_ab.py [passes] [query ...]
(default 7 passes over the r9-flagged pair; pass query names to A/B
any registry entries; idle machine!)
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import re
import statistics
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# default: the r9-flagged pair; override with query names on argv
FLAGGED = sys.argv[2:] or ["ccnet_buckets", "sole_returning_supplier"]


def plan_digest(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    txt = buf.getvalue()
    # strip volatile ids: plan node ids, codegen ids, exchange ids
    txt = re.sub(r"#\d+[A-Za-z]*", "#x", txt)
    txt = re.sub(r"\[id=#?\d+\]", "[id=x]", txt)
    txt = re.sub(r"\(\d+\)", "(n)", txt)
    txt = re.sub(r"plan_id=\d+", "plan_id=x", txt)
    return hashlib.md5(txt.encode()).hexdigest()[:16]


def main() -> None:
    from tools.calibration import cpu_anchor_sec

    import __spark_entry__ as entry_mod
    from nypd_arrest_etl_spark import get_spark

    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    anchor = cpu_anchor_sec()
    spark = get_spark(app_name="bench-ab")
    qs = entry_mod.queries()

    from nypd_arrest_etl_spark.session import load_tables

    for df in load_tables(spark, SF_DIR).values():
        df.count()

    digests = {n: plan_digest(qs[n](spark, SF_DIR)) for n in FLAGGED}
    runs: dict[str, list[float]] = {n: [] for n in FLAGGED}
    # warm both (codegen compile off the clock), then alternate
    for n in FLAGGED:
        qs[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    for _ in range(passes):
        for n in FLAGGED:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qs[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs[n].append(round(time.perf_counter() - t0, 3))

    out = {
        "sf_dir": SF_DIR,
        "anchor_hash_sec": anchor,
        "passes": passes,
        "queries": {
            n: {
                "runs": runs[n],
                "median": round(statistics.median(runs[n]), 3),
                "spread_pct": round(
                    100 * (max(runs[n]) - min(runs[n])) / statistics.median(runs[n]), 1
                ),
                "median_per_anchor": round(statistics.median(runs[n]) / anchor, 3),
                "plan_digest": digests[n],
            }
            for n in FLAGGED
        },
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
