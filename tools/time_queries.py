"""Time a subset of queries() at a given sf_dir with bench.py's warmup
and cold/steady protocol. Usage:
    python tools/time_queries.py [sf_dir] name [name ...]
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    from nypd_arrest_etl_spark import get_spark
    from nypd_arrest_etl_spark.session import load_tables
    import __spark_entry__ as entry_mod
    spark = get_spark(app_name="time-queries")
    for df in load_tables(spark, sf_dir).values():
        df.count()
    def _warm(batches):
        import numpy  # noqa: F401
        yield from batches
    spark.range(10_000).repartition(64).mapInPandas(_warm, "id long").count()
    qs = entry_mod.queries()
    for name in args:
        fn = qs[name]
        for label in ("cold", "steady", "steady2"):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            spark.catalog.clearCache()
            print(f"{name:30s} {label:7s} {dt:.3f}s", flush=True)

if __name__ == "__main__":
    main()
