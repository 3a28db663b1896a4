"""ETL throughput: this engine vs a faithful single-process pandas
twin of the reference pipeline (the north-star target is "match or
beat the reference's single-node throughput at the same scale").

Generates N dirty NYPD-shaped JSONL rows (epoch-millis dates, garbage
numerics, blank/duplicate keys, UPPERCASE headers, lon_lat extras),
then times:

- spark: ``run_etl`` end to end (scan -> clean -> merge -> parquet)
- pandas: the reference's transform semantics re-implemented from
  SURVEY.md §2c (T1-T10 + required-key filter + first-wins dedup),
  chunked at 100k rows like the reference (transform.py:36), single
  thread like the reference (SURVEY §6: 1 process / 1 thread)

Prints one JSON line with rows/sec for both and the ratio.

Usage: python tools/bench_etl.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BOROS = ["B", "K", "M", "Q", "S", "X", ""]
LAWCATS = ["F", "M", "V", "I", "", "NONE", "9"]


def synth_rows(n: int, path: str) -> None:
    """Deterministic dirty generator (LCG, no RNG state dependencies)."""
    state = 42

    def rnd(mod: int) -> int:
        nonlocal state
        state = (1103515245 * state + 12345) & 0x7FFFFFFF
        return state % mod

    with open(path, "w") as f:
        for i in range(n):
            key = f"K{i - rnd(50)}" if rnd(100) < 5 else f"K{i}"  # ~5% dup keys
            if rnd(100) < 2:
                key = "  "  # blank keys -> dropped
            day = 1704067200 + rnd(365) * 86400
            date = (
                day * 1000  # epoch millis branch (T6 rescue)
                if rnd(100) < 20
                else time.strftime("%Y-%m-%d", time.gmtime(day))
            )
            row = {
                "ARREST_KEY": key,
                "ARREST_DATE": date,
                "PD_CD": str(rnd(999)),
                "OFNS_DESC": "assault" if rnd(2) else "",
                "LAW_CAT_CD": LAWCATS[rnd(len(LAWCATS))],
                "ARREST_BORO": BOROS[rnd(len(BOROS))],
                "ARREST_PRECINCT": str(rnd(123)) if rnd(100) < 90 else "garbage",
                "PERP_SEX": ["M", "F", "u", ""][rnd(4)],
                "LATITUDE": f"40.{rnd(99999)}" if rnd(100) < 90 else "junk",
                "LON_LAT": "POINT(1 2)",
            }
            f.write(json.dumps(row) + "\n")


def pandas_reference(src: str) -> int:
    """The reference's observable transform semantics (SURVEY §2c),
    written from the survey spec: chunked read, header lower-casing,
    'nan' scrub, law_cat/sex domain guards, required-key filter,
    to_datetime with epoch-millis rescue, numeric coercion, fill
    defaults, borough map then uppercase, first-writer-wins dedup."""
    import pandas as pd

    boro = {"B": "Bronx", "K": "Brooklyn", "M": "Manhattan", "Q": "Queens", "S": "Staten Island"}
    out = []
    seen: set = set()
    for chunk in pd.read_json(src, lines=True, chunksize=100_000, dtype=str):
        chunk.columns = [c.lower() for c in chunk.columns]
        chunk = chunk.drop(columns=[c for c in ("lon_lat",) if c in chunk.columns])
        for c in chunk.columns:
            chunk[c] = chunk[c].astype(str).replace("nan", "")
        chunk["law_cat_cd"] = chunk["law_cat_cd"].str.upper().where(
            chunk["law_cat_cd"].str.upper().isin(["F", "M", "V", "I"]), "U"
        )
        chunk["perp_sex"] = chunk["perp_sex"].str.upper().where(
            chunk["perp_sex"].str.upper().isin(["M", "F"]), "U"
        )
        chunk = chunk[chunk["arrest_key"].str.strip() != ""]
        d = pd.to_datetime(chunk["arrest_date"], errors="coerce", format="%Y-%m-%d")
        ms = pd.to_numeric(chunk["arrest_date"], errors="coerce")
        rescue = pd.to_datetime(ms / 1000, unit="s", errors="coerce")
        chunk["arrest_date"] = d.fillna(rescue).dt.strftime("%Y-%m-%d")
        chunk["arrest_precinct"] = (
            pd.to_numeric(chunk["arrest_precinct"], errors="coerce").fillna(-1).astype(int)
        )
        chunk["latitude"] = pd.to_numeric(chunk["latitude"], errors="coerce").fillna(0.0)
        chunk["ofns_desc"] = chunk["ofns_desc"].replace("", "UNKNOWN")
        chunk["arrest_boro"] = chunk["arrest_boro"].map(lambda v: boro.get(v, v)).str.upper()
        fresh = chunk[~chunk["arrest_key"].isin(seen)].drop_duplicates("arrest_key")
        seen.update(fresh["arrest_key"])
        out.append(fresh)
    return sum(len(c) for c in out)


def main() -> None:
    from tools.calibration import cpu_anchor_sec

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    d = tempfile.mkdtemp()
    src = os.path.join(d, "raw.jsonl")
    synth_rows(n, src)

    # Same host anchor as bench.py (VERDICT r9 task 7): the ratio
    # below compares two legs run in the SAME session, so it is
    # host-neutral already — but the anchor makes the ABSOLUTE legs
    # comparable across rounds (r9's "slowdown" was both legs slowing
    # uniformly on a slow host).
    cal_hash = cpu_anchor_sec()

    t0 = time.perf_counter()
    pandas_rows = pandas_reference(src)
    t_pandas = time.perf_counter() - t0

    from nypd_arrest_etl_spark import get_spark
    from nypd_arrest_etl_spark.pipeline import run_etl

    spark = get_spark(app_name="bench-etl")
    spark.range(1).count()  # JVM up before the clock starts
    t0 = time.perf_counter()
    res = run_etl(spark, src, os.path.join(d, "target"))
    t_spark = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "n_rows": n,
                "spark_inserted": res.inserted,
                "pandas_kept": pandas_rows,
                "spark_sec": round(t_spark, 2),
                "pandas_sec": round(t_pandas, 2),
                "spark_rows_per_s": round(n / t_spark),
                "pandas_rows_per_s": round(n / t_pandas),
                "speedup": round(t_pandas / t_spark, 2),
                "calibration_hash_sec": cal_hash,
                # anchor-normalized legs: seconds per anchor-second —
                # host-speed-cancelled absolutes for cross-round diffs
                "spark_sec_normalized": round(t_spark / cal_hash, 2),
                "pandas_sec_normalized": round(t_pandas / cal_hash, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
