"""Property tests for the portable-hash bridges — the cornerstone of
every sketch oracle: Spark, DuckDB, and plain Python must agree
bit-for-bit on arbitrary strings and integers, or the MinHash/SimHash/
KMV oracles silently drift."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nypd_arrest_etl_spark.operators.dedup import (
    _M30,
    _M32,
    minhash_coeffs,
    portable_str_hash60,
)
from nypd_arrest_etl_spark.operators.sampling import _portable_hash


def _py_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# Printable-ish strings incl. unicode; md5 operates on UTF-8 bytes in
# both engines, so any codepoint mix must agree.
_strings = st.lists(
    st.text(min_size=0, max_size=40).filter(lambda s: "\x00" not in s),
    min_size=1,
    max_size=20,
    unique=True,
)


@settings(max_examples=15, deadline=None)
@given(_strings)
def test_str_hash60_three_way_agreement(spark, strs):
    sdf = spark.createDataFrame([(s,) for s in strs], "s string")
    got = {
        r["s"]: r["h"]
        for r in sdf.select("s", portable_str_hash60(F.col("s")).alias("h")).collect()
    }
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame({"s": strs}))
    duck = dict(
        con.sql(
            "SELECT s, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM t"
        ).fetchall()
    )
    for s in strs:
        expect = _py_hash60(s)
        assert got[s] == expect, f"spark != python for {s!r}"
        assert duck[s] == expect, f"duckdb != python for {s!r}"


@settings(max_examples=15, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**31 - 1), min_size=1, max_size=50, unique=True))
def test_knuth_hash_three_way_agreement(spark, keys):
    salt = 11
    sdf = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r["k"]: r["h"]
        for r in sdf.select("k", _portable_hash(F.col("k"), salt).alias("h")).collect()
    }
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame({"k": keys}))
    duck = dict(
        con.sql("SELECT k, ((k + 11) * 2654435761) % 4294967296 AS h FROM t").fetchall()
    )
    for k in keys:
        expect = ((k + salt) * 2654435761) % 2**32
        assert got[k] == expect and duck[k] == expect


def test_minhash_coeffs_no_int64_overflow():
    """Every (a_i, b_i) keeps x*a_i + b_i under 2^63 for 30-bit x —
    DuckDB errors (instead of wrapping) on signed-int64 overflow, so
    an overflowing coefficient would break the oracle at runtime."""
    for a, b in minhash_coeffs(64):
        assert a % 2 == 1 and 0 < a < _M32 and 0 <= b < _M32
        assert (_M30 - 1) * a + b < 2**63


def test_minhash_perm_agreement_spark_vs_python(spark):
    xs = [0, 1, 12345, _M30 - 1]
    coeffs = minhash_coeffs(8)
    sdf = spark.createDataFrame([(x,) for x in xs], "x long")
    for i, (a, b) in enumerate(coeffs):
        got = {
            r["x"]: r["h"]
            for r in sdf.select(
                "x", F.pmod(F.col("x") * F.lit(a) + F.lit(b), F.lit(_M32)).alias("h")
            ).collect()
        }
        for x in xs:
            assert got[x] == (x * a + b) % _M32, f"perm {i} mismatch at x={x}"
