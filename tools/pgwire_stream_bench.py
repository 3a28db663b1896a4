#!/usr/bin/env python3
"""Measure the pgwire STREAMING paths (VERDICT r8 #3) — the batch
paths are in PGWIRE_BENCH.md already. Bootstraps a throwaway local
server (initdb, unix socket), then:

1. streaming SINK throughput: N microbatches of lineitem sf0.1
   through the exactly-once claim+merge, vs the batch two-phase
   writer on the same rows in the same session (apples-to-apples,
   same host load);
2. streaming SOURCE drain throughput at maxRowsPerBatch 10k / 100k
   (each availableNow run processes ONE prefetched microbatch, so a
   full drain is a re-drain loop — the realistic catch-up pattern);
3. long-stream vacuum_staging interplay: an aggressive vacuum between
   microbatches must reclaim nothing and leave counts exact (the sink
   sweeps its own staging inside the commit transaction).

Usage: python tools/pgwire_stream_bench.py [--rows 600000]
Appends nothing anywhere; prints a markdown-ready summary.
"""

import os
import pwd
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PG_PORT = 54331
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sh(cmd: str, as_postgres: bool) -> subprocess.CompletedProcess:
    if as_postgres:
        return subprocess.run(
            ["su", "postgres", "-s", "/bin/sh", "-c", cmd],
            capture_output=True, text=True,
        )
    return subprocess.run(cmd, shell=True, capture_output=True, text=True)


def boot_server():
    initdb, pg_ctl = shutil.which("initdb"), shutil.which("pg_ctl")
    if not (initdb and pg_ctl):
        sys.exit("no initdb/pg_ctl on PATH")
    as_postgres = os.geteuid() == 0
    if as_postgres:
        pwd.getpwnam("postgres")
    base = tempfile.mkdtemp(prefix="pgbench-", dir="/tmp")
    data, sock = f"{base}/data", f"{base}/sock"
    os.makedirs(data)
    os.makedirs(sock)
    if as_postgres:
        subprocess.run(["chown", "-R", "postgres:postgres", base], check=True)
        os.chmod(base, 0o755)
    r = _sh(f"{initdb} -D {data} -A trust -U postgres", as_postgres)
    assert r.returncode == 0, r.stderr[-400:]
    _sh(f"chmod 755 {sock}", as_postgres)
    r = _sh(
        f"{pg_ctl} -D {data} -l {base}/log "
        f"-o \"-k {sock} -c listen_addresses='' -p {PG_PORT}\" -w start",
        as_postgres,
    )
    assert r.returncode == 0, r.stderr[-400:]

    def stop():
        _sh(f"{pg_ctl} -D {data} -m immediate -w stop", as_postgres)
        shutil.rmtree(base, ignore_errors=True)

    conninfo = {
        "host": sock, "port": PG_PORT, "user": "postgres",
        "database": "postgres",
    }
    return conninfo, stop


def main() -> None:
    rows_target = 600_000
    if "--rows" in sys.argv:
        rows_target = int(sys.argv[sys.argv.index("--rows") + 1])

    from pyspark.sql import functions as F

    from nypd_arrest_etl_spark import get_spark
    from nypd_arrest_etl_spark.sinks.pgwire import PgWireClient
    from nypd_arrest_etl_spark.sources.pg_source import (
        register_pgwire,
        vacuum_staging,
    )

    spark = get_spark(shuffle_partitions=32)
    register_pgwire(spark)
    conninfo, stop = boot_server()
    results = []
    try:
        li = (
            spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
            .limit(rows_target)
            .withColumn("rid", F.monotonically_increasing_id())
        )
        li = li.repartition(8).cache()
        n = li.count()
        width = len(li.columns)
        print(f"input: {n} rows x {width} cols from {SF_DIR}/lineitem.parquet")

        def pg_opt(x):
            return (
                x.option("host", conninfo["host"])
                .option("port", conninfo["port"])
                .option("user", conninfo["user"])
                .option("database", conninfo["database"])
            )

        # ---- 1. batch two-phase write (same-session baseline) -----------
        t0 = time.monotonic()
        pg_opt(li.write.format("pgwire")).option("table", "li_batch").mode(
            "overwrite"
        ).save()
        t_batch = time.monotonic() - t0
        results.append(("write, batch two-phase (8 partitions)", t_batch, n))

        # ---- 2. streaming SINK: 8 microbatches through claim+merge ------
        src_dir = tempfile.mkdtemp(prefix="pgsrc-", dir="/tmp")
        li.write.mode("overwrite").parquet(src_dir)  # 8 files = 8 batches
        ckpt = tempfile.mkdtemp(prefix="pgckpt-", dir="/tmp")
        t0 = time.monotonic()
        q = (
            pg_opt(
                spark.readStream.schema(li.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src_dir)
                .writeStream.format("pgwire")
            )
            .option("table", "li_stream_tgt")
            .option("streamId", "bench-sink")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        t_sink = time.monotonic() - t0
        with PgWireClient(**conninfo) as c:
            _, cnt = c.query("SELECT count(*) FROM li_stream_tgt")
            assert int(cnt[0][0]) == n, cnt
            _, nb = c.query(
                "SELECT batch_id FROM pgw_stream_commits "
                "WHERE stream_id = 'bench-sink'"
            )
        batches = int(nb[0][0]) + 1
        results.append(
            (f"write, streaming sink ({batches} microbatches, claim+merge)",
             t_sink, n)
        )

        # ---- 3. streaming SOURCE drains at two batch bounds --------------
        with PgWireClient(**conninfo) as c:
            c.execute("DROP TABLE IF EXISTS li_stream_tgt")
        for max_rows, stream_parts in ((100_000, 0), (10_000, 0), (100_000, 8)):
            out = tempfile.mkdtemp(prefix="pgout-", dir="/tmp")
            ck = tempfile.mkdtemp(prefix="pgck2-", dir="/tmp")
            drains = 0
            t0 = time.monotonic()
            got = 0
            while got < n:
                rs = (
                    pg_opt(spark.readStream.format("pgwire"))
                    .option("table", "li_batch")
                    .option("watermarkColumn", "rid")
                    .option("maxRowsPerBatch", max_rows)
                )
                if stream_parts:
                    rs = rs.option("streamPartitions", stream_parts)
                (
                    rs.load()
                    .writeStream.format("parquet")
                    .option("path", out)
                    .option("checkpointLocation", ck)
                    .trigger(availableNow=True)
                    .start()
                    .awaitTermination()
                )
                drains += 1
                got = spark.read.parquet(out).count()
                if drains > 2 * (n // max_rows + 2):
                    sys.exit(f"stall: {got}/{n} after {drains} drains")
            t_drain = time.monotonic() - t0
            assert got == n, (got, n)
            label = (
                f"read, streaming source (maxRowsPerBatch={max_rows:,}, "
                f"{drains} drains"
                + (f", streamPartitions={stream_parts})" if stream_parts else ")")
            )
            results.append((label, t_drain, n))

        # ---- 4. vacuum interplay on a long stream ------------------------
        src2 = tempfile.mkdtemp(prefix="pgsrc2-", dir="/tmp")
        li.repartition(16).write.mode("overwrite").parquet(src2)
        ck3 = tempfile.mkdtemp(prefix="pgck3-", dir="/tmp")
        reclaimed = 0
        for _ in range(4):  # several availableNow passes over 16 files
            (
                pg_opt(
                    spark.readStream.schema(li.schema)
                    .option("maxFilesPerTrigger", 4)
                    .parquet(src2)
                    .writeStream.format("pgwire")
                )
                .option("table", "li_vac_tgt")
                .option("streamId", "bench-vac")
                .option("checkpointLocation", ck3)
                .trigger(availableNow=True)
                .start()
                .awaitTermination()
            )
            # aggressive vacuum BETWEEN microbatch groups: must find
            # nothing — the sink sweeps its own staging in-commit
            reclaimed += len(vacuum_staging(conninfo, max_age_seconds=5))
        with PgWireClient(**conninfo) as c:
            _, cnt = c.query("SELECT count(*) FROM li_vac_tgt")
            _, stg = c.query(
                "SELECT count(*) FROM information_schema.tables "
                "WHERE table_name LIKE '\\_pgw\\_%'"
            )
        print(
            f"vacuum interplay: target {cnt[0][0]}/{n} rows exact="
            f"{int(cnt[0][0]) == n}, vacuum reclaimed {reclaimed} "
            f"(expect 0), staging left {stg[0][0]} (expect 0)"
        )

        print("\n| path | time | throughput |")
        print("|---|---|---|")
        for label, t, rows in results:
            print(f"| {label} | {t:.2f} s | {rows / t / 1000:.0f}k rows/s |")
    finally:
        stop()
        spark.stop()


if __name__ == "__main__":
    main()
