"""blocked_fuzzy_join: positional-mask candidate generation must be
complete for substitution distance <= 1 on equal-length keys, collapse
multi-block matches to one row, and never build a cross join."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from nypd_arrest_etl_spark.operators.linkage import blocked_fuzzy_join


def _match(spark, left_keys, right_keys, max_distance=1):
    l = spark.createDataFrame(
        [(i, k) for i, k in enumerate(left_keys)], "lid int, lk string"
    )
    r = spark.createDataFrame(
        [(100 + i, k) for i, k in enumerate(right_keys)], "rid int, rk string"
    )
    return blocked_fuzzy_join(
        l, r, left_key="lk", right_key="rk", left_id="lid", right_id="rid",
        max_distance=max_distance,
    )


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_complete_for_substitution_distance_one(spark):
    """Brute-force ground truth over a small key universe: every pair
    at Levenshtein distance <= 1 (equal length => identical or one
    substitution) must be found by the blocked join."""
    keys = ["abc", "abd", "xbc", "abz", "zzz", "azc"]
    out = _match(spark, keys, keys)
    got = {(r["lid"], r["rid"] - 100) for r in out.collect()}
    want = {
        (i, j)
        for (i, a), (j, b) in itertools.product(enumerate(keys), repeat=2)
        if _levenshtein(a, b) <= 1
    }
    assert got == want


def test_pair_appears_once_with_min_distance(spark):
    # identical keys match in every masked position; the groupBy must
    # collapse them to one row with distance 0
    out = _match(spark, ["aaaa"], ["aaaa"]).collect()
    assert len(out) == 1
    assert out[0]["edit_distance"] == 0


def test_no_cross_join_in_plan(spark):
    out = _match(spark, ["abc", "def"], ["abd", "xyz"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_distance_zero_only(spark):
    out = _match(spark, ["abc", "abd"], ["abc", "zzz"], max_distance=0)
    rows = out.collect()
    assert {(r["left_key"], r["right_key"]) for r in rows} == {("abc", "abc")}


def test_unequal_lengths_share_no_blocks(spark):
    """Equal-length masking: a key of different length can only match
    via... nothing — positions/keys never collide, so no candidates and
    no false positives (documented recall boundary of the blocker)."""
    out = _match(spark, ["abc"], ["abcd"])
    assert out.count() == 0
