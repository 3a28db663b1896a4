"""snapshot_diff (CDC changelog) and merge_agg_partials (incremental
view maintenance) — exactness on hand-built frames, including the
NULL transitions the full-outer diff must classify correctly."""

from __future__ import annotations

from pyspark.sql import functions as F

from nypd_arrest_etl_spark.operators.incremental import (
    merge_agg_partials,
    snapshot_diff,
)


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_snapshot_diff_classifies_iud(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k int, s string, v double",
    )
    cur = spark.createDataFrame(
        # 1 unchanged, 2 value-changed, 3 deleted, 5 inserted
        [(1, "a", 10.0), (2, "B", 20.0), (4, "d", 40.0), (5, "e", 50.0)],
        "k int, s string, v double",
    )
    out = snapshot_diff(base, cur, ["k"], ["s", "v"])
    assert _rows(out) == {
        (2, "U", 1, "s"),
        (3, "D", 0, ""),
        (5, "I", 0, ""),
    }


def test_snapshot_diff_null_transitions_count_as_changes(spark):
    base = spark.createDataFrame(
        [(1, None, 1.0), (2, "x", None), (3, None, None)],
        "k int, s string, v double",
    )
    cur = spark.createDataFrame(
        # 1: NULL->value, 2: value->NULL plus NULL->value, 3: unchanged NULLs
        [(1, "now", 1.0), (2, None, 7.0), (3, None, None)],
        "k int, s string, v double",
    )
    out = snapshot_diff(base, cur, ["k"], ["s", "v"])
    assert _rows(out) == {
        (1, "U", 1, "s"),
        (2, "U", 2, "s,v"),
    }


def test_snapshot_diff_multi_key_and_changed_cols_sorted(spark):
    base = spark.createDataFrame(
        [(1, "x", "p", 1.0, "q")], "k1 int, k2 string, b string, v double, a string"
    )
    cur = spark.createDataFrame(
        [(1, "x", "P", 2.0, "q")], "k1 int, k2 string, b string, v double, a string"
    )
    out = snapshot_diff(base, cur, ["k1", "k2"], ["v", "b", "a"])
    [(k1, k2, op, n, cols)] = out.collect()
    assert (k1, k2, op, n) == (1, "x", "U", 2)
    # names sorted regardless of the compare_cols argument order
    assert cols == "b,v"


def test_merge_partials_equals_full_aggregate(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cut = F.to_date(F.lit("1997-01-01"))

    def partial(df):
        return df.groupBy("o_orderstatus").agg(
            F.count("*").alias("n"),
            F.sum("o_totalprice").alias("rev"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )

    merged = merge_agg_partials(
        [
            partial(o.filter(F.col("o_orderdate").cast("date") < cut)),
            partial(o.filter(F.col("o_orderdate").cast("date") >= cut)),
        ],
        group_cols=["o_orderstatus"],
        count_col="n",
        sum_cols=["rev"],
        min_cols=["lo"],
        max_cols=["hi"],
    )
    full = partial(o)
    m = {r["o_orderstatus"]: r for r in merged.collect()}
    f = {r["o_orderstatus"]: r for r in full.collect()}
    assert set(m) == set(f)
    for k in f:
        assert m[k]["n"] == f[k]["n"]
        assert m[k]["lo"] == f[k]["lo"]
        assert m[k]["hi"] == f[k]["hi"]
        assert abs(m[k]["rev"] - f[k]["rev"]) < 1e-6 * max(1.0, abs(f[k]["rev"]))


def test_snapshot_diff_single_join_no_extra_shuffle(spark):
    """The diff plan must contain exactly one join over the two scans —
    no self-joins, no re-shuffle of the output."""
    base = spark.range(100).select(F.col("id").alias("k"), F.lit("a").alias("s"))
    cur = spark.range(50).select(F.col("id").alias("k"), F.lit("b").alias("s"))
    plan = snapshot_diff(base, cur, ["k"], ["s"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Join") == 1


def test_apply_changes_roundtrip_reconstructs_current(spark):
    """apply_changes(base, snapshot_diff(base, current, payload)) == current."""
    from nypd_arrest_etl_spark.operators.incremental import apply_changes

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        "k int, s string, v double",
    )
    cur = spark.createDataFrame(
        # 1 unchanged, 2 updated, 3 deleted, 4 NULL->value update, 5 inserted
        [(1, "a", 10.0), (2, "B", 21.0), (4, "d", 40.0), (5, "e", 50.0)],
        "k int, s string, v double",
    )
    diff = snapshot_diff(base, cur, ["k"], ["s", "v"], payload_cols=["s", "v"])
    rebuilt = apply_changes(base, diff, ["k"], ["s", "v"])
    assert _rows(rebuilt.select("k", "s", "v")) == _rows(cur)


def test_apply_changes_idempotent(spark):
    from nypd_arrest_etl_spark.operators.incremental import apply_changes

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string")
    cur = spark.createDataFrame([(2, "B"), (3, "c")], "k int, s string")
    diff = snapshot_diff(base, cur, ["k"], ["s"], payload_cols=["s"])
    once = apply_changes(base, diff, ["k"], ["s"])
    twice = apply_changes(once, diff, ["k"], ["s"])
    assert _rows(twice) == _rows(cur) == _rows(once)


def test_snapshot_diff_payload_carries_current_values_null_for_deletes(spark):
    base = spark.createDataFrame([(1, "x"), (2, "y")], "k int, s string")
    cur = spark.createDataFrame([(1, "X")], "k int, s string")
    diff = {r["k"]: r for r in snapshot_diff(
        base, cur, ["k"], ["s"], payload_cols=["s"]).collect()}
    assert diff[1]["op"] == "U" and diff[1]["s"] == "X"
    assert diff[2]["op"] == "D" and diff[2]["s"] is None
