"""Benchmark harness: run every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line:

    {"metric": "total_query_sec_steady", "value": N, "unit": "sec",
     "queries": {"pricing_summary": sec, ...},
     "total_best2": M, "total_cold": C, "sf": 0.1}

Each query is materialized through the noop sink (df.write.format
("noop")) so every output column is computed and written, with no
driver-side collect cost. Session-level warmups amortize JVM startup
and the Python worker pool; each query then runs twice — cold (pays
its own codegen compile) and steady-state (fresh plan, caches cleared
in between, compiles nothing). A per-query untimed small-SF prepass
was tried for cold-start (round 5) and REJECTED on measurement: it
cut nothing it was supposed to cut and inflated the WHOLE run
(steady 131 s vs 81 s, dedup family 3-5x) — 117 extra tiny-SF
executions accumulate block-manager/broadcast state that pushes the
long session over the GC cliff. Set $SPARK_GRAFT_PREPASS_DIR to a
small SF dir to re-enable it for experiments.

Cold-start, closed out with measurement (round 5): cold - steady =
~24 s at 120 queries = ~0.2 s/query of FIRST-compile janino time.
Whole-stage source embeds each query's unique expression chain, so
cross-query class sharing is minimal — the only real lever was
keeping what IS shared resident, done by raising
spark.sql.codegen.cache.maxEntries 100 -> 4096 (session.py); the
residual is irreducible per unique plan without precompiling the
exact SF-shaped physical plan, which the prepass experiment showed
costs more than it saves. A deployment sees this cost once per query
shape per JVM, not per run.

Host calibration (round 10): every run records two pinned anchors —
a single-thread SHA-256 loop taken before the JVM starts
(tools/calibration.py) and a median-of-3 warmed pass of the
pricing_summary reference query — under the ``calibration`` key of
both the stdout line and BENCH_DETAIL.json. BENCH_DETAIL additionally
carries ``normalized_delta_vs_prev``: per-query
(now/now_anchor)/(prev/prev_anchor) - 1 against the previous detail
file, which cancels the documented ±30-40% session-to-session host
swing — a nonzero normalized delta means the plan or data changed,
not the VM (r9's headline rose 31% purely from host speed; proving
that required a manual twin-bench rerun). Queries are TIMED in
sorted-name order regardless of registry/gate-window order (round
11): rotation used to change which queries ran first and absorbed
residual session first-touch cost, confounding the deltas.

Intra-session drift (round 12): every 20 queries the loop triggers a
JVM full GC (bounding the accumulated block-manager/GC state that
inflated r11's mid-sweep dedup readings up to 12x) and re-measures
both anchors; the series lands in BENCH_DETAIL.anchor_samples and a
single worst/best pinned-query ratio rides the stdout line as
``anchor_drift`` — above ~2, heavy-family readings need the
tools/bench_ab.py fresh-session protocol before being believed.

The HEADLINE value is the sum of per-query MEDIAN steady passes
($SPARK_GRAFT_STEADY_RUNS, default 3) — every pass re-executes the
full pipeline with nothing cached, compile cost excluded; the median
removes single-run GC/scheduling noise that made identical-code
rounds read as regressions (this host swings 78-89 s). ``steady_min``
/ ``steady_max`` carry the spread; ``total_best2`` (sum of min(cold,
best steady) per query — the round-1/2 headline definition, kept
under its own explicitly versioned name for cross-round
comparability) and ``total_cold`` sit alongside; per-query runs in
BENCH_DETAIL.json.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def sf_of(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    from nypd_arrest_etl_spark import get_spark
    from tools.calibration import cpu_anchor_sec

    import __spark_entry__ as entry_mod

    # Host-speed anchor FIRST (before the JVM exists, machine quiet):
    # one pinned single-thread hash loop. A second anchor (a pinned
    # reference query) is measured after warmup below. Both land in
    # the output so cross-round comparisons can divide out the
    # documented ±30-40% session-to-session host swing.
    cal_hash = cpu_anchor_sec()
    print(f"  calibration: hash anchor {cal_hash}s", file=sys.stderr)

    spark = get_spark(app_name="bench")
    qs = entry_mod.queries()

    # Warmup: touch every table + JIT the common codepaths once, and
    # pre-fork the Python UDF worker pool (numpy import per worker)
    # so no single query pays the ~12 s pool cold start.
    from nypd_arrest_etl_spark.session import load_tables

    for df in load_tables(spark, SF_DIR).values():
        df.count()

    def _warm(batches):
        import numpy  # noqa: F401

        yield from batches

    spark.range(10_000).repartition(64).mapInPandas(_warm, "id long").count()

    # JIT/codegen warmup on synthetic data: broadcast join, shuffle agg,
    # and a ranking window — the operator kernels most queries share —
    # so the first timed query doesn't absorb their compile cost.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    a = spark.range(100_000).select("id", (F.col("id") % 100).alias("k"))
    b = spark.range(100).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    (
        a.join(F.broadcast(b), "k")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"))
        .write.format("noop").mode("overwrite").save()
    )
    w = Window.partitionBy("k").orderBy("id")
    (
        a.select(F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .write.format("noop").mode("overwrite").save()
    )

    # Second calibration anchor: the pinned reference query
    # (pricing_summary — stable shape since round 1) at the bench SF,
    # median of 3 warmed passes. Anchors the SPARK-side host factor
    # (JVM + shuffle + codegen paths) the way the hash loop anchors
    # raw CPU; both are recorded, neither joins the headline.
    cal_runs = []
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        qs["pricing_summary"](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        cal_runs.append(time.perf_counter() - t0)
    cal_query = round(sorted(cal_runs)[1], 3)
    calibration = {
        "hash_sec": cal_hash,
        "query": "pricing_summary",
        "query_sec": cal_query,
    }
    print(f"  calibration: pinned query {cal_query}s", file=sys.stderr)

    # Each query runs twice: a cold pass (absorbs that query's janino
    # codegen compile — AQE picks SF-dependent physical plans, so a
    # tiny-SF prepass cannot pre-compile them all) and a steady-state
    # pass on a freshly built plan with all operator-internal caches
    # dropped in between, so the second pass re-executes the full
    # pipeline but compiles nothing. The headline metric sums the
    # STEADY passes (no run selection); cold totals and the
    # min(cold, steady) total_best2 series are in BENCH_DETAIL.json.
    # A per-query untimed prepass is available behind
    # $SPARK_GRAFT_PREPASS_DIR but OFF by default — measured round 5,
    # it degrades the whole session (see module docstring).
    prepass_dir = os.environ.get("SPARK_GRAFT_PREPASS_DIR", "")
    do_prepass = (
        bool(prepass_dir) and os.path.isdir(prepass_dir) and prepass_dir != SF_DIR
    )
    # Round 6: the steady pass runs N times per query (default 3,
    # back-to-back so all N see the same session state) and the
    # headline is the sum of per-query MEDIANS, with min/max spread
    # fields alongside — this host swings identical-code steady totals
    # 78-89 s across sessions, and single-run headlines kept reading as
    # regressions that were not (r5 committed 95.6 s vs a judge re-run
    # of 85.7 s on the same commit). Whole-session A/B against the
    # 1-pass protocol measured NO accumulation inflation from the extra
    # passes (per-query medians sum within the documented swing), so
    # the medians stay comparable to prior rounds' steady sums.
    n_steady = max(1, int(os.environ.get("SPARK_GRAFT_STEADY_RUNS", "3")))
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    cold: dict[str, float] = {}
    best2: dict[str, float] = {}
    # Canonical FIXED execution order (sorted by name), decoupled from
    # the registry/gate-window order: round 10's gate rotation
    # reordered which queries ran first, and the first-run queries
    # absorb residual session JIT/first-touch cost — polluting exactly
    # the per-query normalized deltas the calibration protocol exists
    # to produce (sliding_daily read +510% on a byte-identical plan).
    # Gate order still decides WHICH entries the driver checks; bench
    # timing order never changes again.
    # Intra-session drift instrumentation (round 12, VERDICT r11 task
    # 4): the 22 s/248 s dedup readings of r11 came from block-manager/
    # GC state accumulated over a 140-query session and were only
    # caught by manual fresh-session A/B arbitration. Every 20 queries
    # the loop now (a) asks the JVM for a full GC — bounding the
    # accumulated-garbage cliff the r5 prepass experiment first
    # documented — and (b) re-measures BOTH calibration anchors, so
    # session drift is a committed artifact series
    # (BENCH_DETAIL.anchor_samples), not a spelunking discovery. The
    # pinned-query sample uses the same cleared-cache protocol as the
    # up-front anchor; the hash sample is reps=1 (raw-CPU drift needs
    # no median — it is the JVM-side series that moves).
    anchor_samples: list[dict] = []

    def _storage_bytes() -> dict:
        # Block-manager storage level (r13, VERDICT r12 task 4): cached
        # RDD bytes in memory/on disk at sample time. A leak-free
        # session reads ~0 here at every sample (the loop clearCache()s
        # after each query); a rising series is an operator pinning
        # storage without an unpersist path.
        try:
            infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
            return {
                "cached_rdds": len(infos),
                "mem_bytes": int(sum(i.memSize() for i in infos)),
                "disk_bytes": int(sum(i.diskSize() for i in infos)),
            }
        except Exception:
            return {}

    def _sample_anchor(after_n: int) -> None:
        storage = _storage_bytes()  # BEFORE the sample's clearCache
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        qs["pricing_summary"](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        anchor_samples.append(
            {
                "after_queries": after_n,
                "query_sec": round(time.perf_counter() - t0, 3),
                "hash_sec": cpu_anchor_sec(reps=1),
                "storage": storage,
            }
        )
        spark.catalog.clearCache()

    for qi, name in enumerate(sorted(qs)):
        if qi and qi % 20 == 0:
            _sample_anchor(qi)
        fn = qs[name]
        if do_prepass:
            fn(spark, prepass_dir).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.perf_counter() - t0, 3)
        runs: list[float] = []
        for _ in range(n_steady):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
        # Headline = median steady pass (robust to a stray GC pause
        # inflating one of ~500 executions several-fold; even N
        # averages the two middles). total_best2 keeps its EXACT
        # round-1/2 definition — min(cold, FIRST steady) — so that
        # series stays comparable across rounds instead of drifting
        # low as N grows.
        rs = sorted(runs)
        n = len(rs)
        steady = round((rs[(n - 1) // 2] + rs[n // 2]) / 2, 3)
        timings[name] = steady
        spread[name] = runs
        best2[name] = min(cold[name], runs[0])
        print(
            f"  {name}: steady {steady}s (runs {runs}, cold {cold[name]}s)",
            file=sys.stderr,
        )

    _sample_anchor(len(qs))  # closing sample bounds the series
    # one scalar for the stdout line: worst/best pinned-query sample
    # ratio — >2 means the session drifted enough that heavy-family
    # readings need fresh-session A/B before being believed
    _aq = [s["query_sec"] for s in anchor_samples] + [cal_query]
    anchor_drift = round(max(_aq) / min(_aq), 2) if min(_aq) > 0 else None

    total = round(sum(timings.values()), 3)
    total_best2 = round(sum(best2.values()), 3)
    total_min = round(sum(min(r) for r in spread.values()), 3)
    total_max = round(sum(max(r) for r in spread.values()), 3)

    # Full per-query detail goes to a side file; the stdout JSON line
    # must stay under the driver's 2000-char tail capture or it cannot
    # be parsed (r1 lesson: 87 individual entries = 2299 chars = lost
    # bench record). Extension-op families are rolled up by prefix;
    # the relational queries stay individual.
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    # Calibration-normalized cross-round deltas: read the PREVIOUS
    # committed detail (before overwriting) and, when it carries an
    # anchor, report (now_sec/now_anchor) / (prev_sec/prev_anchor) - 1
    # per query — host-speed-cancelled, so a nonzero value means the
    # PLAN or DATA changed, not the VM. First calibrated round emits
    # no deltas (r9 and earlier details have no anchor).
    normalized_delta_vs_prev: dict[str, float] = {}
    try:
        with open(detail_path) as f:
            prev = json.load(f)
        prev_anchor = prev.get("calibration", {}).get("hash_sec")
        if prev_anchor:
            for name, sec in timings.items():
                p = prev.get("queries", {}).get(name)
                if p:
                    normalized_delta_vs_prev[name] = round(
                        (sec / cal_hash) / (p / prev_anchor) - 1, 3
                    )
    except (OSError, ValueError):
        pass
    with open(detail_path, "w") as f:
        json.dump(
            {
                "metric": "total_query_sec_steady",
                "value": total,
                "unit": "sec",
                "calibration": calibration,
                "anchor_samples": anchor_samples,
                "anchor_drift": anchor_drift,
                "normalized_delta_vs_prev": normalized_delta_vs_prev,
                "queries": timings,
                "steady_runs": spread,
                "n_steady": n_steady,
                "total_steady_min": total_min,
                "total_steady_max": total_max,
                "cold_queries": cold,
                "best2_queries": best2,
                "total_best2": total_best2,
                "cold_total": round(sum(cold.values()), 3),
                "sf": sf_of(SF_DIR),
            },
            f,
            indent=1,
        )

    families = (
        "dedup_",
        "text_",
        "similarity_",
        "multimodal_",
        "sample_",
        "curate_",
        "sketch_",
    )
    compact: dict[str, float] = {}
    for name, sec in timings.items():
        fam = next((p[:-1] for p in families if name.startswith(p)), None)
        key = fam or name
        compact[key] = round(compact.get(key, 0.0) + sec, 2)

    def render() -> str:
        return json.dumps(
            {
                "metric": "total_query_sec_steady",
                "value": total,
                "unit": "sec",
                "calibration": calibration,
                "anchor_drift": anchor_drift,
                "queries": compact,
                "n_steady": n_steady,
                "steady_min": total_min,
                "steady_max": total_max,
                "total_best2": total_best2,
                "total_cold": round(sum(cold.values()), 3),
                "sf": sf_of(SF_DIR),
            },
            separators=(",", ":"),
        )

    line = render()
    # Hard guard: collapse entries into "other" until the line fits
    # with margin (driver keeps only the last 2000 chars). Cheapest
    # first: the slow queries are the signal worth keeping visible.
    while len(line) > 1900:
        k = min((k for k in compact if k != "other"), key=lambda k: compact[k])
        compact["other"] = round(compact.get("other", 0.0) + compact.pop(k), 2)
        line = render()
    print(line)


if __name__ == "__main__":
    main()
