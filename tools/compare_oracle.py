"""Local mirror of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() twin on DuckDB, compare row count,
column names, and an order-insensitive value hash.

Usage: python tools/compare_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_repr(df: pd.DataFrame) -> str:
    parts = []
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            parts.append(s.round(9).astype(str))
        else:
            parts.append(s.astype(str))
    return "\n".join("|".join(t) for t in zip(*parts)) if len(df) else ""


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from nypd_arrest_etl_spark.session import get_spark

    spark = get_spark(app_name="oracle-compare", shuffle_partitions=8)
    con = duckdb.connect()
    for tname in TABLES:
        p = os.path.join(sf_dir, f"{tname}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {tname} AS SELECT * FROM '{p}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    ran = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        ran += 1
        sql = oracles.get(name)
        if sql is None:
            n = fn(spark, sf_dir).count()
            print(f"{name:28s} ROWS-ONLY rows={n}")
            continue
        sdf = fn(spark, sf_dir).toPandas()
        ddf = con.sql(sql).df()
        s, d = canon(sdf), canon(ddf)
        problems = []
        if list(s.columns) != list(d.columns):
            problems.append(f"columns spark={list(s.columns)} duck={list(d.columns)}")
        if len(s) != len(d):
            problems.append(f"rowcount spark={len(s)} duck={len(d)}")
        if not problems and value_repr(s) != value_repr(d):
            diff = s.compare(d) if s.shape == d.shape else None
            problems.append(f"value mismatch\n{diff.head(10) if diff is not None else ''}")
        if problems:
            failures.append(name)
            print(f"{name:28s} FAIL: {'; '.join(p.splitlines()[0] for p in problems)}")
            for p in problems:
                if "\n" in p:
                    print(p)
        else:
            print(f"{name:28s} OK rows={len(s)}")
    print(f"\n{ran - len(failures)}/{ran} OK (of {len(qs)} registered)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
